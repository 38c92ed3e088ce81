"""Torch-checkpoint interop: load reference PyTorch weights into our models.

The migration surface for users of the reference (musaru/Fall_Multimodal):
take a ``best_model.pt`` / ``checkpoint.pt`` trained with the reference code
(``Fall_2_Spatial_Temporal_SR/main.py:323-341``) or a notebook
``state_dict`` save (``GSTCAN_UR_conv.ipynb:6``) and run it here — for
serving, evaluation, or fine-tuning — without retraining. The per-family
mappings are the ones the parity suite uses to prove numerical equivalence
(``tests/test_*_parity.py``), promoted to one public API:

    variables = load_pretrained_torch(config, "best_model.pt")
    Predictor(config, variables).predict(skeleton, sensor)

or through the trainer: ``--pretrained path/to/best_model.pt`` fine-tunes
from converted weights. Every mapping is linear (transposes / reshapes
only) so it applies identically to weights and to their gradients.

Conversion is validated against the flax model's own init template: missing
parameters, unknown ports, unconsumed torch keys, and shape mismatches all
raise with the offending names spelled out. Both spelling generations of
the reference are accepted where they differ (Gen-2 ``st_gcan_networks`` /
``stgcan_1``/``lstm``/``fc`` vs notebook ``st_gcn_networks`` /
``pts_stream``/``sensor``/``fcn``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from fall_multimodal_tpu.configs import Config

__all__ = [
    "load_torch_state_dict",
    "torch_to_variables",
    "load_pretrained_torch",
    "supported_models",
]

FlatTree = Dict[Tuple[str, ...], np.ndarray]

# state_dict buffers that are constants rebuilt from config here, never
# ported: adjacency tensors, positional-encoding tables, BN step counters.
_IGNORED_LEAVES = {"A", "A_binary", "adj", "pe", "pos_bias",
                   "num_batches_tracked"}


class _TrackedDict(Mapping):
    """Read-tracking view of the torch state_dict so unconsumed keys can be
    reported (a misconfigured conversion must fail loudly, not silently
    drop half the checkpoint)."""

    def __init__(self, sd: Mapping[str, np.ndarray]):
        self._sd = dict(sd)
        self.used: set = set()

    def __getitem__(self, k):
        if k not in self._sd:
            raise KeyError(
                f"torch state_dict is missing {k!r} — wrong model family, "
                "generation, or hyperparameters for this config?"
            )
        self.used.add(k)
        return self._sd[k]

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)

    def unused(self):
        return sorted(
            k for k in self._sd
            if k not in self.used and k.split(".")[-1] not in _IGNORED_LEAVES
        )


# --------------------------------------------------------------- layouts

def _dense(w) -> np.ndarray:
    """torch Linear (O, I) or 1x1 Conv2d (O, I, 1, 1) -> flax Dense (I, O)."""
    w = np.asarray(w)
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return np.ascontiguousarray(w.T)


def _conv_t(w) -> np.ndarray:
    """torch temporal Conv2d (O, I, kT, 1) -> flax Conv (kT, 1, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv1d(w) -> np.ndarray:
    """torch Conv1d (O, I, k) -> flax Conv (k, I, O)."""
    return np.transpose(np.asarray(w), (2, 1, 0))


def _depthwise(w) -> np.ndarray:
    """torch depthwise Conv2d (C, 1, k, 1) -> flax (k, 1, 1, C)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _join(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def _put_dense(sd, p, ours, theirs, bias: bool = True):
    p[ours + ("kernel",)] = _dense(sd[theirs + ".weight"])
    if bias and theirs + ".bias" in sd:
        p[ours + ("bias",)] = np.asarray(sd[theirs + ".bias"])


def _put_bn(sd, p, bs, ours, theirs):
    """torch BatchNorm -> our ``BatchNorm`` wrapper (inner ``BatchNorm_0``)."""
    inner = ours + ("BatchNorm_0",)
    p[inner + ("scale",)] = np.asarray(sd[theirs + ".weight"])
    p[inner + ("bias",)] = np.asarray(sd[theirs + ".bias"])
    bs[inner + ("mean",)] = np.asarray(sd[theirs + ".running_mean"])
    bs[inner + ("var",)] = np.asarray(sd[theirs + ".running_var"])


def _put_raw_bn(sd, p, bs, ours, theirs):
    """torch BatchNorm -> a bare ``nn.BatchNorm`` (no wrapper level)."""
    p[ours + ("scale",)] = np.asarray(sd[theirs + ".weight"])
    p[ours + ("bias",)] = np.asarray(sd[theirs + ".bias"])
    bs[ours + ("mean",)] = np.asarray(sd[theirs + ".running_mean"])
    bs[ours + ("var",)] = np.asarray(sd[theirs + ".running_var"])


# ------------------------------------------------------- STGCAN backbone

def _port_stgcan_backbone(sd, p, bs, ours, theirs, stages, in_channels):
    """One ``STGCAN``/``StreamSpatialTemporalGraph`` backbone
    (``Model/stgcan.py:147-227``; notebook twin in
    ``GSTCAN_UR_conv.ipynb:1``). ``theirs`` is the torch attribute prefix
    ('' for a standalone STGCAN)."""
    netlist = None
    for cand in ("st_gcn_networks", "st_gcan_networks"):  # notebook vs Gen-2
        if _join(theirs, cand) + ".0.gcn.conv.weight" in sd:
            netlist = _join(theirs, cand)
            break
    if netlist is None:
        raise KeyError(
            f"no st_gc(a)n_networks block list under torch prefix "
            f"{theirs or '<root>'!r} — is this an STGCAN-family checkpoint?"
        )
    _put_bn(sd, p, bs, ours + ("data_bn",), _join(theirs, "data_bn"))
    in_ch = in_channels
    for i, (out_ch, stride, residual) in enumerate(stages):
        blk = ours + (f"block{i}",)
        tb = f"{netlist}.{i}"
        p[blk + ("GraphConv_0", "Dense_0", "kernel")] = _dense(
            sd[f"{tb}.gcn.conv.weight"])
        p[blk + ("GraphConv_0", "Dense_0", "bias")] = np.asarray(
            sd[f"{tb}.gcn.conv.bias"])
        _put_bn(sd, p, bs, blk + ("tcn_bn1",), f"{tb}.tcn.0")
        p[blk + ("TemporalConv_0", "Conv_0", "kernel")] = _conv_t(
            sd[f"{tb}.tcn.2.weight"])
        p[blk + ("TemporalConv_0", "Conv_0", "bias")] = np.asarray(
            sd[f"{tb}.tcn.2.bias"])
        _put_bn(sd, p, bs, blk + ("tcn_bn2",), f"{tb}.tcn.3")
        se = blk + ("SqueezeExcite_0",)
        ca = f"{tb}.channel_attention_module.atten"
        _put_dense(sd, p, se + ("Dense_0",), f"{ca}.1")
        _put_bn(sd, p, bs, se + ("BatchNorm_0",), f"{ca}.2")
        _put_dense(sd, p, se + ("Dense_1",), f"{ca}.4")
        if residual and (in_ch != out_ch or stride != 1):
            _put_dense(sd, p, blk + ("res_proj",), f"{tb}.residual.0")
            _put_bn(sd, p, bs, blk + ("res_bn",), f"{tb}.residual.1")
        imp = _join(theirs, f"edge_importance.{i}")
        if imp in sd:
            p[ours + (f"edge_importance_{i}",)] = np.asarray(sd[imp])
        in_ch = out_ch


def _stream_prefixes(sd) -> Tuple[str, str]:
    """Detect the two skeleton-stream attribute names: Gen-2
    ``stgcan_1``/``stgcan_2`` (``combination.py:13-14``) vs notebook
    ``pts_stream``/``mot_stream``."""
    if "stgcan_1.data_bn.weight" in sd:
        return "stgcan_1", "stgcan_2"
    if "pts_stream.data_bn.weight" in sd:
        return "pts_stream", "mot_stream"
    raise KeyError(
        "neither 'stgcan_1.*' (Gen-2) nor 'pts_stream.*' (notebook) stream "
        "weights found — not a two-/three-stream STGCAN checkpoint"
    )


def _fusion_head_prefix(sd) -> str:
    """Fusion Linear: Gen-2 ``fc`` (``combination.py:16,35``) vs notebook
    ``fcn``."""
    if "fc.weight" in sd:
        return "fc"
    if "fcn.weight" in sd:
        return "fcn"
    raise KeyError("no fusion head ('fc' or 'fcn') in the state_dict")


# -------------------------------------------------------- sensor encoders

def _port_bilstm_head(sd, p, bs, ours, theirs):
    """Gen-2 ``BiLSTM`` (``Model/bilstm.py:21-59``): lstm1 -> batchnorm ->
    channelattention -> fc."""
    lstm = ours + ("BiLSTMLayer_0",)
    for direction, tag in (("fwd", ""), ("bwd", "_reverse")):
        base = lstm + (direction,)
        p[base + ("ih", "kernel")] = np.asarray(
            sd[_join(theirs, f"lstm1.weight_ih_l0{tag}")]).T
        p[base + ("ih", "bias")] = np.asarray(
            sd[_join(theirs, f"lstm1.bias_ih_l0{tag}")])
        p[base + ("hh", "kernel")] = np.asarray(
            sd[_join(theirs, f"lstm1.weight_hh_l0{tag}")]).T
        p[base + ("hh", "bias")] = np.asarray(
            sd[_join(theirs, f"lstm1.bias_hh_l0{tag}")])
    _put_bn(sd, p, bs, ours + ("BatchNorm_0",), _join(theirs, "batchnorm"))
    ca = ours + ("MlpChannelAttention_0",)
    att = _join(theirs, "channelattention.attention")
    _put_dense(sd, p, ca + ("Dense_0",), f"{att}.0")
    _put_dense(sd, p, ca + ("Dense_1",), f"{att}.2")
    _put_dense(sd, p, ours + ("Dense_0",), _join(theirs, "fc.1"))


def _port_cnn_bilstm_head(sd, p, bs, ours, theirs):
    """Notebook ``CNN_BiLSTM`` (``GSTCAN_UR_conv.ipynb:2``): CNN1D trunk
    (layer1/layer2) then the Gen-2 BiLSTM head."""
    cnn = ours + ("Cnn1d_0",)
    for j, layer in enumerate(("layer1", "layer2")):
        conv = _join(theirs, f"cnn.{layer}.0")
        p[cnn + (f"Conv_{j}", "kernel")] = _conv1d(sd[conv + ".weight"])
        p[cnn + (f"Conv_{j}", "bias")] = np.asarray(sd[conv + ".bias"])
        _put_bn(sd, p, bs, cnn + (f"BatchNorm_{j}",),
                _join(theirs, f"cnn.{layer}.1"))
    # the reference CNN1D defines a flatten+Linear head that its forward
    # never calls (dead code, ``GSTCAN_UR_conv.ipynb:2``); consume the keys
    # so real notebook checkpoints pass the strict unused-keys check
    for leaf in ("weight", "bias"):
        dead = _join(theirs, f"cnn.fc.{leaf}")
        if dead in sd:
            _ = sd[dead]
    _port_bilstm_head(sd, p, bs, ours + ("BiLSTMHead_0",),
                      _join(theirs, "bilstm"))


# ------------------------------------------------------------- converters

def _convert_stgcan(model, config, sd):
    p, bs = {}, {}
    backbone = ("STGCANBackbone_0",)
    _port_stgcan_backbone(sd, p, bs, backbone, "", model.stages,
                          config.data.in_channels)
    # classifier head: Gen-2 ``cls`` 1x1 Conv2d (stgcan.py:208) vs notebook
    # ``fcn`` Linear (StreamSpatialTemporalGraph)
    head = "cls" if "cls.weight" in sd else "fcn"
    _put_dense(sd, p, backbone + ("cls",), head)
    return p, bs


def _convert_two_stgcan(model, config, sd):
    p, bs = {}, {}
    t_pts, t_mot = _stream_prefixes(sd)
    _port_stgcan_backbone(sd, p, bs, ("pts_stream",), t_pts, model.stages,
                          config.data.in_channels)
    _port_stgcan_backbone(sd, p, bs, ("mot_stream",), t_mot, model.stages, 2)
    _put_dense(sd, p, ("Dense_0",), _fusion_head_prefix(sd))
    return p, bs


def _convert_three_stream(model, config, sd):
    p, bs = {}, {}
    t_pts, t_mot = _stream_prefixes(sd)
    _port_stgcan_backbone(sd, p, bs, ("pts_stream",), t_pts, model.stages,
                          config.data.in_channels)
    _port_stgcan_backbone(sd, p, bs, ("mot_stream",), t_mot, model.stages, 2)
    # sensor stream: Gen-2 ``lstm`` (combination.py:33) vs notebook ``sensor``
    t_sen = "lstm" if "lstm.lstm1.weight_ih_l0" in sd else "sensor"
    torch_is_cnn = f"{t_sen}.cnn.layer1.0.weight" in sd
    ours_is_cnn = model.sensor_encoder in ("cnn_bilstm", "cnn")
    if torch_is_cnn != ours_is_cnn:
        raise ValueError(
            f"sensor-encoder mismatch: checkpoint has "
            f"{'CNN_BiLSTM' if torch_is_cnn else 'BiLSTM'} but config "
            f"model.kwargs.sensor_encoder={model.sensor_encoder!r} — use the "
            f"{'gstcan_3stream' if torch_is_cnn else 'two_stgcan_bilstm'} "
            "model (or set sensor_encoder) to match"
        )
    if ours_is_cnn:
        _port_cnn_bilstm_head(sd, p, bs, ("CnnBiLSTMHead_0",), t_sen)
    else:
        _port_bilstm_head(sd, p, bs, ("BiLSTMHead_0",), t_sen)
    _put_dense(sd, p, ("Dense_0",), _fusion_head_prefix(sd))
    return p, bs


def _convert_bilstm(model, config, sd):
    p, bs = {}, {}
    _port_bilstm_head(sd, p, bs, ("head",), "")
    return p, bs


def _convert_cnn_bilstm(model, config, sd):
    p, bs = {}, {}
    _port_cnn_bilstm_head(sd, p, bs, ("head",), "")
    return p, bs


def _convert_musa(model, config, sd):
    """``musa_model.Model`` (``Multimodal_Fall3/model/musa_model.py:492-589``)
    and its ``Ablation`` (no Sep_TCN tail); any ``n_stage``."""
    p, bs = {}, {}
    n_stage = model.n_stage
    with_tail = model.with_tail
    if model.embed_norm:
        # reference ``embed(norm=True)`` prepends norm_data (cnn index shifts)
        _put_bn(sd, p, bs, ("norm_pos",), "joint_embed_pos.cnn.0.bn")
        cnn_idx = 1
    else:
        cnn_idx = 0
    for ours, theirs in (("joint_embed_pos", "joint_embed_pos"),
                         ("joint_embed_mot", "joint_embed_mos")):
        _put_dense(sd, p, (ours,), f"{theirs}.cnn.{cnn_idx}.cnn")

    for stream in ("stream_pos", "stream_mot"):
        for s in range(n_stage):
            # SpatialGraphConv at torch index 3s (in != out: residual proj)
            b = (stream, f"sgc{s}")
            t = f"{stream}.{3 * s}"
            if f"{t}.edge" in sd:
                p[b + ("edge",)] = np.asarray(sd[f"{t}.edge"])
            _put_dense(sd, p, b + ("Dense_0",), f"{t}.gcn")
            _put_bn(sd, p, bs, b + ("bn",), f"{t}.bn")
            _put_dense(sd, p, b + ("res_proj",), f"{t}.residual.0")
            _put_bn(sd, p, bs, b + ("res_bn",), f"{t}.residual.1")
            # SepTemporal blocks at 3s+1 (k=3, s=1) and 3s+2 (k=5, s=2)
            for off, tag in ((1, "a"), (2, "b")):
                b = (stream, f"sep{s}{tag}")
                t = f"{stream}.{3 * s + off}"
                if f"{t}.edge" in sd:
                    p[b + ("edge",)] = np.asarray(sd[f"{t}.edge"])
                p[b + ("depthwise", "kernel")] = _depthwise(
                    sd[f"{t}.depth_conv.0.weight"])
                if f"{t}.depth_conv.0.bias" in sd:      # absent at bias=False
                    p[b + ("depthwise", "bias")] = np.asarray(
                        sd[f"{t}.depth_conv.0.bias"])
                _put_bn(sd, p, bs, b + ("depth_bn",), f"{t}.depth_conv.1")
                _put_dense(sd, p, b + ("pointwise",), f"{t}.point_conv.0")
                _put_bn(sd, p, bs, b + ("point_bn",), f"{t}.point_conv.1")
                if f"{t}.residual.0.weight" in sd:
                    _put_dense(sd, p, b + ("res_proj",), f"{t}.residual.0")
                    _put_bn(sd, p, bs, b + ("res_bn",), f"{t}.residual.1")
        if with_tail:
            b = (stream, "tail")
            t = f"{stream}.{3 * n_stage}"
            for sep in ("sep31", "sep11"):
                p[b + (sep, "depthwise", "kernel")] = _depthwise(
                    sd[f"{t}.{sep}.seq.0.weight"])
                if f"{t}.{sep}.seq.0.bias" in sd:
                    p[b + (sep, "depthwise", "bias")] = np.asarray(
                        sd[f"{t}.{sep}.seq.0.bias"])
                _put_bn(sd, p, bs, b + (sep, "bn1"), f"{t}.{sep}.seq.1")
                _put_dense(sd, p, b + (sep, "pointwise"), f"{t}.{sep}.seq.3")
                _put_bn(sd, p, bs, b + (sep, "bn2"), f"{t}.{sep}.seq.4")
            _put_dense(sd, p, b + ("shortcut",), f"{t}.shortcut")

    _put_dense(sd, p, ("fc", "Dense_0"), "fc.seq.0")
    p[("fc", "LayerNorm_0", "scale")] = np.asarray(sd["fc.seq.2.weight"])
    p[("fc", "LayerNorm_0", "bias")] = np.asarray(sd["fc.seq.2.bias"])
    _put_dense(sd, p, ("fc", "Dense_1"), "fc.seq.5")
    return p, bs


def _port_targcn(sd, p, ours, theirs, num_layers):
    """``TRAGCN.py:134-224`` encoder/transformer/head under a prefix."""
    p[ours + ("node_embeddings",)] = np.asarray(
        sd[_join(theirs, "node_embeddings")])
    for layer in range(num_layers):
        for gate in ("gate", "update"):
            base = ours + ("encoder", f"layer{layer}", "cell", gate)
            ref = _join(theirs, f"encoder.dcrnn_cells.{layer}.{gate}")
            p[base + ("weights_pool",)] = np.asarray(sd[f"{ref}.weights_pool"])
            p[base + ("bias_pool",)] = np.asarray(sd[f"{ref}.bias_pool"])
            p[base + ("static_linear", "kernel")] = np.asarray(
                sd[f"{ref}.linear.weight"]).T
            p[base + ("static_linear", "bias")] = np.asarray(
                sd[f"{ref}.linear.bias"])
    for i in range(2):  # the TA stack is 2 layers in both frameworks
        base = ours + ("encoder", "temporal_transformer", f"layer{i}")
        ref = _join(theirs, f"encoder.trans_layer_T.trans_layers.{i}")
        p[base + ("vff", "kernel")] = np.asarray(sd[f"{ref}.vff.weight"]).T
        p[base + ("vff", "bias")] = np.asarray(sd[f"{ref}.vff.bias"])
        for our_name, their_name in (("conv_q", "conv1"), ("conv_k", "conv2")):
            # torch (T_out, T_in, 1, 3) -> flax (1, 3, T_in, T_out)
            p[base + (our_name, "kernel")] = np.transpose(
                np.asarray(sd[f"{ref}.{their_name}.weight"]), (2, 3, 1, 0))
            p[base + (our_name, "bias")] = np.asarray(
                sd[f"{ref}.{their_name}.bias"])
        for name in ("ln", "lnff"):
            p[base + (name, "scale")] = np.asarray(sd[f"{ref}.{name}.weight"])
            p[base + (name, "bias")] = np.asarray(sd[f"{ref}.{name}.bias"])
        p[base + ("ff1", "kernel")] = np.asarray(sd[f"{ref}.ff.0.weight"]).T
        p[base + ("ff1", "bias")] = np.asarray(sd[f"{ref}.ff.0.bias"])
        p[base + ("ff2", "kernel")] = np.asarray(sd[f"{ref}.ff.2.weight"]).T
        p[base + ("ff2", "bias")] = np.asarray(sd[f"{ref}.ff.2.bias"])
    # end_conv: Conv2d(6, horizon*C, (1, hidden)) -> Dense over (6, hidden)
    w = np.asarray(sd[_join(theirs, "end_conv.weight")])   # (O, 6, 1, H)
    o, s6, _, h = w.shape
    p[ours + ("end_conv", "kernel")] = np.transpose(
        w[:, :, 0, :], (1, 2, 0)).reshape(s6 * h, o)
    p[ours + ("end_conv", "bias")] = np.asarray(sd[_join(theirs, "end_conv.bias")])
    p[ours + ("head", "kernel")] = np.asarray(sd[_join(theirs, "fc.2.weight")]).T
    p[ours + ("head", "bias")] = np.asarray(sd[_join(theirs, "fc.2.bias")])


def _convert_targcn(model, config, sd):
    p: FlatTree = {}
    _port_targcn(sd, p, (), "", model.num_layers)
    return p, {}


def _port_skeleton_transformer(sd, p, bs, ours, theirs, n_block):
    """``skeleton_transformer.py:360-435``: embedding MLP, n
    B2TSpatialTemporalTransformerBlocks, pooled head."""
    _put_dense(sd, p, ours + ("embed1",), _join(theirs, "embedding.0"))
    _put_dense(sd, p, ours + ("embed2",), _join(theirs, "embedding.2"))
    _put_dense(sd, p, ours + ("head",), _join(theirs, "fcn.0"))
    for i in range(n_block):
        blk = ours + (f"block{i}",)
        tb = _join(theirs, f"extractor.{i}")
        for our_name, their_name in (
            ("spatial_attn", "multi_head_spatial_self_attention"),
            ("temporal_attn", "multi_head_temporal_self_attention"),
        ):
            _put_dense(sd, p, blk + (our_name, "w_qkv"),
                       f"{tb}.{their_name}.w_qkv")
            _put_dense(sd, p, blk + (our_name, "merge"),
                       f"{tb}.{their_name}.merge")
            p[blk + (our_name, "rel_pos_bias")] = np.asarray(
                sd[f"{tb}.{their_name}.relative_position_bias_table"])
        for n in ("norm1", "norm2", "norm3"):       # BatchNorm3d, bare
            _put_raw_bn(sd, p, bs, blk + (n,), f"{tb}.{n}")
        _put_dense(sd, p, blk + ("ffn", "Dense_0"),
                   f"{tb}.feed_forward_network.0")
        _put_dense(sd, p, blk + ("ffn", "Dense_1"),
                   f"{tb}.feed_forward_network.2")


def _port_b2t_block(sd, p, blk, tb):
    """Single-axis ``B2TTransformerBlock`` (``skeleton_transformer.py:
    291-320``): rel-pos MHSA (the attribute is named
    ``multi_head_spatial_self_attention`` even in the temporal half —
    the reference reuses the class with a swapped table size) + two
    LayerNorms + FFN."""
    attn = f"{tb}.multi_head_spatial_self_attention"
    _put_dense(sd, p, blk + ("attn", "w_qkv"), f"{attn}.w_qkv")
    _put_dense(sd, p, blk + ("attn", "merge"), f"{attn}.merge")
    p[blk + ("attn", "rel_pos_bias")] = np.asarray(
        sd[f"{attn}.relative_position_bias_table"])
    for n in ("norm1", "norm3"):                     # LayerNorm
        p[blk + (n, "scale")] = np.asarray(sd[f"{tb}.{n}.weight"])
        p[blk + (n, "bias")] = np.asarray(sd[f"{tb}.{n}.bias"])
    _put_dense(sd, p, blk + ("ffn", "Dense_0"),
               f"{tb}.feed_forward_network.0")
    _put_dense(sd, p, blk + ("ffn", "Dense_1"),
               f"{tb}.feed_forward_network.2")


def _convert_skeleton_transformer(model, config, sd):
    p, bs = {}, {}
    if model.factorized:
        # SkeletonTransformer_Ablation1 (skeleton_transformer.py:437-514):
        # extractor.{0..n/2-1} spatial B2T blocks, extractor.{n/2} is the
        # parameterless TransposeAxis, extractor.{n/2+1..n} temporal blocks
        _put_dense(sd, p, ("embed1",), "embedding.0")
        _put_dense(sd, p, ("embed2",), "embedding.2")
        _put_dense(sd, p, ("head",), "fcn.0")
        half = model.n_block // 2
        for i in range(half):
            _port_b2t_block(sd, p, (f"spatial{i}",), f"extractor.{i}")
        for i in range(half):
            _port_b2t_block(
                sd, p, (f"temporal{i}",), f"extractor.{half + 1 + i}"
            )
        return p, bs
    _port_skeleton_transformer(sd, p, bs, (), "", model.n_block)
    return p, bs


def _convert_transformer_ensemble(model, config, sd):
    """Notebook ``Ensemble`` (``GSTCAN_HAR_conv_kfold_trans.ipynb:3``):
    skeleton_transformer + signal_model (CNN_BiLSTM) -> fc."""
    p, bs = {}, {}
    _port_skeleton_transformer(sd, p, bs, ("skeleton_transformer",),
                               "skeleton_transformer", model.n_block)
    _port_cnn_bilstm_head(sd, p, bs, ("signal_model",), "signal_model")
    _put_dense(sd, p, ("Dense_0",), "fc.0")
    return p, bs


_CONVERTERS = {
    "stgcan": _convert_stgcan,
    "stgcn": _convert_stgcan,
    "two_stgcan": _convert_two_stgcan,
    "two_stgcan_bilstm": _convert_three_stream,
    "gstcan_3stream": _convert_three_stream,
    "bilstm": _convert_bilstm,
    "cnn_bilstm": _convert_cnn_bilstm,
    "musa": _convert_musa,
    "musa_ablation": _convert_musa,
    "targcn": _convert_targcn,
    "skeleton_transformer": _convert_skeleton_transformer,
    "skeleton_transformer_factorized": _convert_skeleton_transformer,
    "transformer_ensemble": _convert_transformer_ensemble,
}


def supported_models():
    return sorted(_CONVERTERS)


# ------------------------------------------------------------ public API

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint file into ``{name: np.ndarray}``.

    Accepts a raw ``state_dict`` save (``best_model.pt``,
    ``main.py:323-330``), a full training checkpoint wrapping it under
    ``model``/``state_dict``/``model_state_dict`` (``checkpoint.pt``,
    ``main.py:332-341``), or an ``.npz`` of named arrays.
    """
    if path.endswith(".npz"):
        blob = np.load(path)
        return {k: np.asarray(blob[k]) for k in blob.files}
    import torch  # local import: torch is an interop-only dependency

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict):
        for key in ("model", "state_dict", "model_state_dict"):
            inner = blob.get(key)
            if isinstance(inner, dict) and inner and all(
                hasattr(v, "detach") for v in inner.values()
            ):
                blob = inner
                break
    out = {}
    for k, v in blob.items():
        out[k] = (v.detach().cpu().numpy() if hasattr(v, "detach")
                  else np.asarray(v))
    return out


def _init_template(config: Config, model):
    """Shape/dtype template of the model's variables via ``jax.eval_shape``
    (no FLOPs, no device memory)."""
    import jax
    import jax.numpy as jnp

    d = config.data
    skel = jax.ShapeDtypeStruct((2, d.seq_len, d.num_joints, d.in_channels),
                                jnp.float32)
    sensor = jax.ShapeDtypeStruct((2, d.seq_len, d.sensor_dim), jnp.float32)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}

    def init(s, se):
        return model.init(rngs, s, se, train=False)

    return jax.eval_shape(init, skel, sensor)


def _format_keys(keys, limit=8):
    keys = sorted(keys)
    shown = [".".join(k) if isinstance(k, tuple) else k for k in keys[:limit]]
    more = f" (+{len(keys) - limit} more)" if len(keys) > limit else ""
    return ", ".join(shown) + more


def torch_to_variables(
    config: Config,
    state_dict: Mapping[str, Any],
    strict: bool = True,
) -> Dict[str, Any]:
    """Convert a reference torch ``state_dict`` into flax ``variables``
    (``{"params": ..., "batch_stats": ...}``) for ``config``'s model.

    The result is validated against the model's init template: every flax
    parameter must be produced, with the right shape, and (``strict``)
    every torch weight must be consumed — constants like adjacency buffers
    and ``num_batches_tracked`` excepted.
    """
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from fall_multimodal_tpu.models import build_model

    name = config.model.name
    if name not in _CONVERTERS:
        raise ValueError(
            f"no torch converter for model {name!r}; supported: "
            f"{supported_models()}"
        )
    model = build_model(config)
    sd = _TrackedDict({
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    })
    p, bs = _CONVERTERS[name](model, config, sd)

    template = _init_template(config, model)
    flat_t = {"params": flatten_dict(template["params"])}
    flat_o = {"params": p}
    if "batch_stats" in template or bs:
        flat_t["batch_stats"] = flatten_dict(template.get("batch_stats", {}))
        flat_o["batch_stats"] = bs
    for coll in flat_t:
        ours, theirs = flat_t[coll], flat_o.get(coll, {})
        missing = set(ours) - set(theirs)
        extra = set(theirs) - set(ours)
        if missing or extra:
            raise ValueError(
                f"torch conversion for {name!r} does not line up with the "
                f"model's {coll}:"
                + (f" missing {_format_keys(missing)};" if missing else "")
                + (f" unknown {_format_keys(extra)};" if extra else "")
                + " (wrong model.kwargs for this checkpoint?)"
            )
        for k, v in theirs.items():
            if tuple(ours[k].shape) != tuple(np.shape(v)):
                raise ValueError(
                    f"shape mismatch at {'.'.join(k)}: model wants "
                    f"{tuple(ours[k].shape)}, checkpoint gives "
                    f"{tuple(np.shape(v))}"
                )
    if strict and sd.unused():
        raise ValueError(
            f"torch state_dict keys not consumed by the {name!r} conversion: "
            f"{_format_keys(sd.unused())} — wrong generation/hyperparameters, "
            "or pass strict=False to ignore"
        )
    variables = {
        "params": unflatten_dict({
            k: jnp.asarray(v, flat_t["params"][k].dtype) for k, v in p.items()
        })
    }
    if "batch_stats" in flat_t:
        variables["batch_stats"] = unflatten_dict({
            k: jnp.asarray(v, flat_t["batch_stats"][k].dtype)
            for k, v in bs.items()
        })
    return variables


def load_pretrained_torch(
    config: Config, path: str, strict: bool = True
) -> Dict[str, Any]:
    """``load_torch_state_dict`` + ``torch_to_variables`` in one call."""
    return torch_to_variables(config, load_torch_state_dict(path), strict=strict)
