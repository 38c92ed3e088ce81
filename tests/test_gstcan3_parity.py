"""Full-model parity of the flagship 3-stream GSTCAN — the BASELINE.md
anchor model (notebook-canonical ``TwoStreamSpatialTemporalGraph`` with
in-model CNN_BiLSTM sensor stream, ``GSTCAN_UR_conv.ipynb:1-2``).

Fixture: fixed (pts, sensor) inputs, the reference's eval output (which
includes its trailing ``F.softmax``), and the complete 413-entry state_dict.
The test ports every weight into ``ThreeStreamGSTCAN`` and requires
softmax(our logits) to match the reference output.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.models import build_model

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "reference_gstcan3.npz")

# (out_ch, stride, has_residual_projection) per block — mirrors STGCAN_STAGES
BLOCKS = [
    (64, 1, False), (64, 1, False), (64, 1, False),
    (128, 2, True), (128, 1, False), (256, 2, True), (256, 1, False),
]


def _dense(w):
    w = np.asarray(w)
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return w.T


def _port_stream(g, flax_stream, torch_stream, p, bs):
    def put_bn(flax_path, torch_prefix):
        inner = flax_path + ("BatchNorm_0",)
        p[inner + ("scale",)] = np.asarray(g[f"{torch_prefix}.weight"])
        p[inner + ("bias",)] = np.asarray(g[f"{torch_prefix}.bias"])
        bs[inner + ("mean",)] = np.asarray(g[f"{torch_prefix}.running_mean"])
        bs[inner + ("var",)] = np.asarray(g[f"{torch_prefix}.running_var"])

    put_bn((flax_stream, "data_bn"), f"{torch_stream}.data_bn")
    for i, (_, _, has_proj) in enumerate(BLOCKS):
        blk = (flax_stream, f"block{i}")
        tb = f"{torch_stream}.st_gcn_networks.{i}"
        p[blk + ("GraphConv_0", "Dense_0", "kernel")] = _dense(g[f"{tb}.gcn.conv.weight"])
        p[blk + ("GraphConv_0", "Dense_0", "bias")] = np.asarray(g[f"{tb}.gcn.conv.bias"])
        put_bn(blk + ("tcn_bn1",), f"{tb}.tcn.0")
        p[blk + ("TemporalConv_0", "Conv_0", "kernel")] = np.transpose(
            np.asarray(g[f"{tb}.tcn.2.weight"]), (2, 3, 1, 0)
        )
        p[blk + ("TemporalConv_0", "Conv_0", "bias")] = np.asarray(g[f"{tb}.tcn.2.bias"])
        put_bn(blk + ("tcn_bn2",), f"{tb}.tcn.3")
        se = blk + ("SqueezeExcite_0",)
        p[se + ("Dense_0", "kernel")] = _dense(g[f"{tb}.channel_attention_module.atten.1.weight"])
        p[se + ("Dense_0", "bias")] = np.asarray(g[f"{tb}.channel_attention_module.atten.1.bias"])
        put_bn(se + ("BatchNorm_0",), f"{tb}.channel_attention_module.atten.2")
        p[se + ("Dense_1", "kernel")] = _dense(g[f"{tb}.channel_attention_module.atten.4.weight"])
        p[se + ("Dense_1", "bias")] = np.asarray(g[f"{tb}.channel_attention_module.atten.4.bias"])
        if has_proj:
            p[blk + ("res_proj", "kernel")] = _dense(g[f"{tb}.residual.0.weight"])
            p[blk + ("res_proj", "bias")] = np.asarray(g[f"{tb}.residual.0.bias"])
            put_bn(blk + ("res_bn",), f"{tb}.residual.1")
        p[(flax_stream, f"edge_importance_{i}")] = np.asarray(
            g[f"{torch_stream}.edge_importance.{i}"]
        )


def test_three_stream_gstcan_full_model_matches_reference():
    g = np.load(FIX)
    x_nctv = np.asarray(g["x"])                 # (3, 3, 30, 14)
    sensor = jnp.asarray(g["sensor"])           # (3, 30, 4)
    expected = np.asarray(g["out"])             # softmax output

    cfg = load_config(preset_path("gstcan_urfall_3stream"))
    model = build_model(cfg)
    skel = jnp.asarray(np.transpose(x_nctv, (0, 2, 3, 1)))  # -> (N, T, V, C)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        skel, sensor, train=False,
    )

    p, bs = {}, {}
    _port_stream(g, "pts_stream", "pts_stream", p, bs)
    _port_stream(g, "mot_stream", "mot_stream", p, bs)

    # sensor CNN_BiLSTM
    head = ("CnnBiLSTMHead_0",)
    cnn = head + ("Cnn1d_0",)
    for j, layer in enumerate(("layer1", "layer2")):
        p[cnn + (f"Conv_{j}", "kernel")] = np.transpose(
            np.asarray(g[f"sensor.cnn.{layer}.0.weight"]), (2, 1, 0)
        )
        p[cnn + (f"Conv_{j}", "bias")] = np.asarray(g[f"sensor.cnn.{layer}.0.bias"])
        inner = cnn + (f"BatchNorm_{j}", "BatchNorm_0")
        p[inner + ("scale",)] = np.asarray(g[f"sensor.cnn.{layer}.1.weight"])
        p[inner + ("bias",)] = np.asarray(g[f"sensor.cnn.{layer}.1.bias"])
        bs[inner + ("mean",)] = np.asarray(g[f"sensor.cnn.{layer}.1.running_mean"])
        bs[inner + ("var",)] = np.asarray(g[f"sensor.cnn.{layer}.1.running_var"])

    bhead = head + ("BiLSTMHead_0",)
    lstm = bhead + ("BiLSTMLayer_0",)
    for direction, tag in (("fwd", ""), ("bwd", "_reverse")):
        p[lstm + (direction, "ih", "kernel")] = np.asarray(
            g[f"sensor.bilstm.lstm1.weight_ih_l0{tag}"]).T
        p[lstm + (direction, "ih", "bias")] = np.asarray(
            g[f"sensor.bilstm.lstm1.bias_ih_l0{tag}"])
        p[lstm + (direction, "hh", "kernel")] = np.asarray(
            g[f"sensor.bilstm.lstm1.weight_hh_l0{tag}"]).T
        p[lstm + (direction, "hh", "bias")] = np.asarray(
            g[f"sensor.bilstm.lstm1.bias_hh_l0{tag}"])
    inner = bhead + ("BatchNorm_0", "BatchNorm_0")
    p[inner + ("scale",)] = np.asarray(g["sensor.bilstm.batchnorm.weight"])
    p[inner + ("bias",)] = np.asarray(g["sensor.bilstm.batchnorm.bias"])
    bs[inner + ("mean",)] = np.asarray(g["sensor.bilstm.batchnorm.running_mean"])
    bs[inner + ("var",)] = np.asarray(g["sensor.bilstm.batchnorm.running_var"])
    ca = bhead + ("MlpChannelAttention_0",)
    p[ca + ("Dense_0", "kernel")] = np.asarray(g["sensor.bilstm.channelattention.attention.0.weight"]).T
    p[ca + ("Dense_0", "bias")] = np.asarray(g["sensor.bilstm.channelattention.attention.0.bias"])
    p[ca + ("Dense_1", "kernel")] = np.asarray(g["sensor.bilstm.channelattention.attention.2.weight"]).T
    p[ca + ("Dense_1", "bias")] = np.asarray(g["sensor.bilstm.channelattention.attention.2.bias"])
    p[bhead + ("Dense_0", "kernel")] = np.asarray(g["sensor.bilstm.fc.1.weight"]).T
    p[bhead + ("Dense_0", "bias")] = np.asarray(g["sensor.bilstm.fc.1.bias"])

    # fusion head
    p[("Dense_0", "kernel")] = np.asarray(g["fcn.weight"]).T
    p[("Dense_0", "bias")] = np.asarray(g["fcn.bias"])

    flat_p = flatten_dict(variables["params"])
    flat_bs = flatten_dict(variables["batch_stats"])
    assert set(flat_p) == set(p), (
        sorted(set(flat_p) - set(p))[:6], sorted(set(p) - set(flat_p))[:6])
    assert set(flat_bs) == set(bs), (
        sorted(set(flat_bs) - set(bs))[:6], sorted(set(bs) - set(flat_bs))[:6])
    for k in p:
        assert flat_p[k].shape == p[k].shape, (k, flat_p[k].shape, p[k].shape)

    new_vars = {
        "params": unflatten_dict({k: jnp.asarray(v) for k, v in p.items()}),
        "batch_stats": unflatten_dict({k: jnp.asarray(v) for k, v in bs.items()}),
    }
    logits = model.apply(new_vars, skel, sensor, train=False)
    ours = np.asarray(jax.nn.softmax(logits, axis=-1))  # reference forward ends in softmax
    np.testing.assert_allclose(ours, expected, atol=2e-5)
