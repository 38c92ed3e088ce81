"""Full-model numerical parity of the Gen-3 flagship (musa model).

``tests/fixtures/reference_musa.npz`` holds a fixed input, the reference
model's eval-mode output, and its complete ``state_dict`` (generated once by
executing ``Multimodal_Fall3/model/musa_model.py`` with
embed_dim=16/n_stage=1/act_type=tanh/edge=True/block_size=41). The test
ports every weight into our ``MusaModel`` and requires the logits to match.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from fall_multimodal_tpu.models.musa import MusaModel

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "reference_musa.npz")


def _dense(w):  # torch (out,in,1,1) or (out,in) -> flax kernel (in,out)
    w = np.asarray(w)
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return w.T


def _depthwise(w):  # torch (C,1,k,1) -> flax (k,1,1,C)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _port(sd):
    """Build (params, batch_stats) flat dicts from the torch state_dict."""
    p, bs = {}, {}

    def put_bn(flax_prefix, torch_prefix):
        inner = flax_prefix + ("BatchNorm_0",)
        p[inner + ("scale",)] = np.asarray(sd[torch_prefix + ".weight"])
        p[inner + ("bias",)] = np.asarray(sd[torch_prefix + ".bias"])
        bs[inner + ("mean",)] = np.asarray(sd[torch_prefix + ".running_mean"])
        bs[inner + ("var",)] = np.asarray(sd[torch_prefix + ".running_var"])

    def put_dense(flax_prefix, torch_prefix):
        p[flax_prefix + ("kernel",)] = _dense(sd[torch_prefix + ".weight"])
        p[flax_prefix + ("bias",)] = np.asarray(sd[torch_prefix + ".bias"])

    for emb_flax, emb_torch in [
        ("joint_embed_pos", "joint_embed_pos.cnn.0.cnn"),
        ("joint_embed_mot", "joint_embed_mos.cnn.0.cnn"),
    ]:
        put_dense((emb_flax,), emb_torch)

    for stream in ("stream_pos", "stream_mot"):
        # block 0: SpatialGraphConv
        b = (stream, "sgc0")
        p[b + ("edge",)] = np.asarray(sd[f"{stream}.0.edge"])
        put_dense(b + ("Dense_0",), f"{stream}.0.gcn")
        put_bn(b + ("bn",), f"{stream}.0.bn")
        put_dense(b + ("res_proj",), f"{stream}.0.residual.0")
        put_bn(b + ("res_bn",), f"{stream}.0.residual.1")
        # blocks 1, 2: SepTemporal (k=3 s=1; k=5 s=2 with residual proj)
        for i, name in [(1, "sep0a"), (2, "sep0b")]:
            b = (stream, name)
            p[b + ("edge",)] = np.asarray(sd[f"{stream}.{i}.edge"])
            p[b + ("depthwise", "kernel")] = _depthwise(
                sd[f"{stream}.{i}.depth_conv.0.weight"]
            )
            p[b + ("depthwise", "bias")] = np.asarray(
                sd[f"{stream}.{i}.depth_conv.0.bias"]
            )
            put_bn(b + ("depth_bn",), f"{stream}.{i}.depth_conv.1")
            put_dense(b + ("pointwise",), f"{stream}.{i}.point_conv.0")
            put_bn(b + ("point_bn",), f"{stream}.{i}.point_conv.1")
            if f"{stream}.{i}.residual.0.weight" in sd:
                put_dense(b + ("res_proj",), f"{stream}.{i}.residual.0")
                put_bn(b + ("res_bn",), f"{stream}.{i}.residual.1")
        # tail Sep_TCN
        b = (stream, "tail")
        for sep, kern in [("sep31", 3), ("sep11", 1)]:
            p[b + (sep, "depthwise", "kernel")] = _depthwise(
                sd[f"{stream}.3.{sep}.seq.0.weight"]
            )
            p[b + (sep, "depthwise", "bias")] = np.asarray(
                sd[f"{stream}.3.{sep}.seq.0.bias"]
            )
            put_bn(b + (sep, "bn1"), f"{stream}.3.{sep}.seq.1")
            put_dense(b + (sep, "pointwise"), f"{stream}.3.{sep}.seq.3")
            put_bn(b + (sep, "bn2"), f"{stream}.3.{sep}.seq.4")
        put_dense(b + ("shortcut",), f"{stream}.3.shortcut")

    # classification head
    put_dense(("fc", "Dense_0"), "fc.seq.0")
    p[("fc", "LayerNorm_0", "scale")] = np.asarray(sd["fc.seq.2.weight"])
    p[("fc", "LayerNorm_0", "bias")] = np.asarray(sd["fc.seq.2.bias"])
    put_dense(("fc", "Dense_1"), "fc.seq.5")
    return p, bs


def test_musa_full_model_matches_reference():
    blob = np.load(FIXTURE)
    x_nctv = blob["x"]                      # (4, 3, 30, 14)
    expected = blob["out"]                  # (4, 11)
    sd = {k: blob[k] for k in blob.files if k not in ("x", "out")}

    model = MusaModel(
        num_classes=11, embed_dim=16, n_stage=1, act_type="tanh",
        block_size=41, edge=True, bias=True,
    )
    x = jnp.asarray(np.transpose(x_nctv, (0, 2, 3, 1)))  # -> (N, T, V, C)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, None, train=False,
    )

    ported_p, ported_bs = _port(sd)
    flat_p = flatten_dict(variables["params"])
    flat_bs = flatten_dict(variables["batch_stats"])

    missing = set(flat_p) - set(ported_p)
    extra = set(ported_p) - set(flat_p)
    assert not missing, f"unported flax params: {sorted(missing)[:8]}"
    assert not extra, f"unknown ports: {sorted(extra)[:8]}"
    for k, v in ported_p.items():
        assert flat_p[k].shape == v.shape, (k, flat_p[k].shape, v.shape)
    for k, v in ported_bs.items():
        assert flat_bs[k].shape == v.shape, (k, flat_bs[k].shape, v.shape)

    new_vars = {
        "params": unflatten_dict({k: jnp.asarray(v) for k, v in ported_p.items()}),
        "batch_stats": unflatten_dict(
            {k: jnp.asarray(v) for k, v in ported_bs.items()}
        ),
    }
    ours = np.asarray(model.apply(new_vars, x, None, train=False))
    np.testing.assert_allclose(ours, expected, atol=2e-5)
