"""Gen-3 flagship: DropGraph-regularized two-stream GCN ("musa model").

Capability of ``Multimodal_Fall3/model/musa_model.py:39-687``: joint
embedding, per-stream stages of [SpatialGraphConv -> SepTemporal(k=3,s=1) ->
SepTemporal(k=5,s=2)] with channel doubling, a Sep_TCN tail, global pooling
with a raw-input pooled residual, and an MLP classification head — plus the
two DropGraph regularizers (activity-proportional spatial DropBlock
propagated over the adjacency, and a time-shuffled temporal DropBlock).

Layout (N, T, V, C); every 1x1 is a Dense on the lane axis. Reference
semantics notes honored here:

* the Gen-3 graph conv ``einsum('nctv,cvw->nctw', x, A*edge)`` broadcasts a
  size-1 partition axis across channels (the shipped config uses the
  ``uniform`` strategy, K=1) — implemented as a single (V,V) contraction;
* motion stream sign is *reversed* vs Gen-2: ``x[:,:2,:-1] - x[:,:2,1:]``
  (``musa_model.py:549``);
* ``Classification_Module`` and the separable convs use torch's default
  LeakyReLU slope 0.01, while ``activation_factory('leakyrelu')`` uses 0.2;
* DropBlockT's random time shuffle (``musa_model.py:94-95``) uses one
  permutation shared across batch and channels.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fall_multimodal_tpu.graphs import build_adjacency
from fall_multimodal_tpu.models.layers import BatchNorm, activation_factory

_leaky01 = lambda x: nn.leaky_relu(x, negative_slope=0.01)  # noqa: E731


def _graph_apply(x: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """x: (N,T,V,C); A: (K,V,V). K==1 broadcasts over channels (the shipped
    path); K==C contracts channelwise (reference einsum's other legal case).
    """
    if A.shape[0] == 1:
        return jnp.einsum("ntvc,vw->ntwc", x, A[0])
    return jnp.einsum("ntvc,cvw->ntwc", x, A)


class DropBlockSke(nn.Module):
    """Graph-structured spatial DropBlock (``musa_model.py:39-73``).

    Bernoulli seeds proportional to per-joint mean activity, propagated one
    hop over the adjacency, binarized, inverted, rescaled.
    """

    @nn.compact
    def __call__(self, x, keep_prob: float, A, train: bool):
        if not train or keep_prob >= 1.0:
            return x
        n, t, v, c = x.shape
        act = jax.lax.stop_gradient(jnp.abs(x).mean(axis=(1, 3)))  # (n, v)
        act = act / act.sum() * act.size
        # reference: 1.92 for 25/unknown-joint graphs, 1.9 for 20
        denom = 1.9 if v == 20 else 1.92
        gamma = (1.0 - keep_prob) / (1.0 + denom)
        key = self.make_rng("dropout")
        seed = jax.random.bernoulli(key, jnp.clip(act * gamma, 0.0, 1.0)).astype(
            x.dtype
        )
        A2 = A[0] if A.ndim == 3 else A
        spread = seed @ A2.astype(x.dtype)
        dropped = (spread > 0.001).astype(x.dtype)      # (n, v)
        mask = 1.0 - dropped                            # (n, v)
        # rescale exactly as reference: mask.numel() / mask.sum() over (n, v)
        keep_frac = jnp.maximum(mask.sum(), 1.0)
        return x * mask[:, None, :, None] * (mask.size / keep_frac)


class DropBlockT(nn.Module):
    """Time-shuffled temporal DropBlock (``musa_model.py:76-98``): Bernoulli
    frame seeds proportional to per-frame activity, widened by a
    block_size max-pool, then randomly permuted over time so random frames
    (not a contiguous block) drop."""

    block_size: int = 41

    @nn.compact
    def __call__(self, x, keep_prob: float, train: bool):
        if not train or keep_prob >= 1.0:
            return x
        n, t, v, c = x.shape
        act = jax.lax.stop_gradient(jnp.abs(x).mean(axis=(2, 3)))  # (n, t)
        act = act / act.sum() * act.size
        gamma = (1.0 - keep_prob) / self.block_size
        key_b, key_p = jax.random.split(self.make_rng("dropout"))
        m = jax.random.bernoulli(key_b, jnp.clip(act * gamma, 0.0, 1.0)).astype(
            x.dtype
        )
        # widen: max-pool over time, window block_size, stride 1, same pad
        pad = self.block_size // 2
        mp = jnp.pad(m, ((0, 0), (pad, pad)))
        widened = jax.lax.reduce_window(
            mp, -jnp.inf, jax.lax.max, (1, self.block_size), (1, 1), "valid"
        )
        widened = jnp.maximum(widened, 0.0)[:, :t]
        perm = jax.random.permutation(key_p, t)
        shuffled = widened[:, perm]
        mask = 1.0 - shuffled                            # (n, t)
        keep_frac = jnp.maximum(mask.sum(), 1.0)
        return x * mask[:, :, None, None] * (mask.size / keep_frac)


def _branch_normalize(act: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Reference per-call activity normalization ``act/act.sum()*act.size``
    (``musa_model.py:54-56,84-86``) applied per branch of a stacked
    (nb*n, L) activity matrix."""
    parts = act.reshape(nb, -1)
    parts = parts / parts.sum(axis=1, keepdims=True) * parts.shape[1]
    return parts.reshape(act.shape)


def _dropgraph_masks(key, a3, nb, keep_prob, A, block_size):
    """One mask pipeline for ``DropBlockT(DropBlockSke(.))`` over ``nb``
    stacked branches (VERDICT r2 item 4 restructure).

    ``a3`` is the stacked ``stop_gradient(|x|.mean(channel))`` activity,
    (nb*n, T, V). Returns ``(mask_s (nb*n, V), mask_t (nb*n, T),
    scale (nb,))`` such that ``x * mask_s * mask_t * scale[branch]`` is
    distributionally identical to the two sequential reference modules
    (``musa_model.py:39-98``): per-branch activity normalization and
    rescale, independent Bernoulli draws, one shared time permutation per
    branch. The temporal stage's activity is derived from the spatial-
    dropped tensor WITHOUT re-reading it: ``|x*mask_s*scale_s|`` averaged
    over (V, C) equals ``scale_s * (a3*mask_s).mean(V)``, and the
    normalization divides ``scale_s`` back out — so the whole pipeline
    runs on (n, T, V)-sized statistics, one pass over the full tensor to
    build ``a3`` and one fused multiply to apply (vs 4 reduce+multiply
    passes for the per-module path), halving the mask pipeline's HBM
    traffic and kernel count.
    """
    nall, t, v = a3.shape
    key_s, key_t, key_p = jax.random.split(key, 3)
    dtype = a3.dtype

    # spatial stage (DropBlockSke semantics)
    act_s = _branch_normalize(a3.mean(axis=1), nb)           # (nb*n, V)
    denom = 1.9 if v == 20 else 1.92
    gamma_s = (1.0 - keep_prob) / (1.0 + denom)
    probs_s = jnp.clip(act_s * gamma_s, 0.0, 1.0).astype(jnp.float32)
    seed = jax.random.bernoulli(key_s, probs_s).astype(dtype)
    A2 = A[0] if A.ndim == 3 else A
    dropped = ((seed @ A2.astype(dtype)) > 0.001).astype(dtype)
    mask_s = 1.0 - dropped                                   # (nb*n, V)
    keep_s = mask_s.reshape(nb, -1).sum(axis=1)
    scale_s = (mask_s.size / nb) / jnp.maximum(keep_s, 1.0)  # (nb,)

    # temporal stage (DropBlockT semantics) on the spatial-dropped activity
    act_t = _branch_normalize((a3 * mask_s[:, None, :]).mean(axis=-1), nb)
    gamma_t = (1.0 - keep_prob) / block_size
    probs_t = jnp.clip(act_t * gamma_t, 0.0, 1.0).astype(jnp.float32)
    m = jax.random.bernoulli(key_t, probs_t).astype(dtype)
    pad = block_size // 2
    mp = jnp.pad(m, ((0, 0), (pad, pad)))
    widened = jax.lax.reduce_window(
        mp, -jnp.inf, jax.lax.max, (1, block_size), (1, 1), "valid"
    )
    widened = jnp.maximum(widened, 0.0)[:, :t]
    # one time permutation per branch, shared across that branch's batch
    perms = jnp.stack(
        [jax.random.permutation(k, t) for k in jax.random.split(key_p, nb)]
    )
    wb = widened.reshape(nb, -1, t)
    shuffled = jnp.take_along_axis(
        wb, jnp.broadcast_to(perms[:, None, :], wb.shape), axis=-1
    )
    mask_t = 1.0 - shuffled.reshape(nall, t)                 # (nb*n, T)
    keep_t = mask_t.reshape(nb, -1).sum(axis=1)
    scale_t = (mask_t.size / nb) / jnp.maximum(keep_t, 1.0)
    return mask_s, mask_t, scale_s * scale_t


def _apply_drop_pair(key, y, res, keep_prob, A, block_size):
    """Fused DropGraph on (main, residual): masks from one stacked
    pipeline, applied as one fused multiply per branch."""
    a3 = jnp.concatenate([
        jax.lax.stop_gradient(jnp.abs(y).mean(axis=-1)),
        jax.lax.stop_gradient(jnp.abs(res).mean(axis=-1)),
    ])
    mask_s, mask_t, scale = _dropgraph_masks(
        key, a3, 2, keep_prob, A, block_size
    )
    ms_y, ms_r = jnp.split(mask_s, 2)
    mt_y, mt_r = jnp.split(mask_t, 2)
    y = y * (ms_y[:, None, :, None] * mt_y[:, :, None, None] * scale[0])
    res = res * (ms_r[:, None, :, None] * mt_r[:, :, None, None] * scale[1])
    return y, res


def _apply_drop_single(key, y, keep_prob, A, block_size):
    a3 = jax.lax.stop_gradient(jnp.abs(y).mean(axis=-1))
    mask_s, mask_t, scale = _dropgraph_masks(
        key, a3, 1, keep_prob, A, block_size
    )
    return y * (mask_s[:, None, :, None] * mask_t[:, :, None, None] * scale[0])


class MusaSpatialGraphConv(nn.Module):
    """1x1 -> graph contraction with learnable edge mask -> BN -> DropGraph
    on main + residual branches -> activation (``musa_model.py:101-146``).

    ``fused_dropgraph=True`` runs both branches' DropBlockSke + DropBlockT
    through the one-pass mask pipeline (:func:`_dropgraph_masks`); the
    default ``False`` keeps the per-module reference pipeline (same
    distribution, different RNG stream — ``test_aux.py`` pins both).
    Measured on v5e (batch 1024, f32): fused 16,626 vs module 16,816
    windows/s — XLA already fuses the per-module elementwise chains, so the
    restructure is kept for its tests, not as the default (PARITY.md
    "musa DropGraph cost split")."""

    features: int
    act_type: str = "relu"
    keep_prob: float = 0.9
    block_size: int = 41
    edge: bool = True
    use_bias: bool = True
    fused_dropgraph: bool = False

    @nn.compact
    def __call__(self, x, A, train: bool = False):
        act = activation_factory(self.act_type)
        if x.shape[-1] != self.features:
            res = nn.Dense(self.features, use_bias=self.use_bias, name="res_proj")(x)
            res = BatchNorm(name="res_bn")(res, train=train)
        else:
            res = x
        edge = (
            self.param("edge", nn.initializers.ones, A.shape) if self.edge else 1.0
        )
        y = nn.Dense(self.features, use_bias=self.use_bias)(x)
        y = _graph_apply(y, A * edge)
        y = BatchNorm(name="bn")(y, train=train)

        if train and self.keep_prob < 1.0:
            if self.fused_dropgraph:
                y, res = _apply_drop_pair(
                    self.make_rng("dropout"), y, res,
                    self.keep_prob, A * edge, self.block_size,
                )
            else:
                drop_s = DropBlockSke()
                drop_t = DropBlockT(self.block_size)
                y = drop_t(
                    drop_s(y, self.keep_prob, A * edge, train),
                    self.keep_prob, train,
                )
                res = drop_t(
                    drop_s(res, self.keep_prob, A * edge, train),
                    self.keep_prob, train,
                )
        return act(y + res)


class SepTemporalBlock(nn.Module):
    """[optional expand 1x1] -> depthwise (k,1) -> pointwise 1x1, each with
    BN; DropGraph on both branches; strided residual
    (``musa_model.py:148-199``)."""

    channels: int
    temporal_window: int = 3
    stride: int = 1
    expand_ratio: int = 0
    act_type: str = "relu"
    keep_prob: float = 0.9
    block_size: int = 41
    edge: bool = True
    use_bias: bool = True
    residual: bool = True
    fused_dropgraph: bool = False

    @nn.compact
    def __call__(self, x, A, train: bool = False):
        act = activation_factory(self.act_type)
        if not self.residual:
            res = 0.0
        elif self.stride == 1:
            res = x
        else:
            res = nn.Dense(self.channels, use_bias=self.use_bias, name="res_proj")(
                x[:, :: self.stride]
            )
            res = BatchNorm(name="res_bn")(res, train=train)

        inner = self.channels
        y = x
        if self.expand_ratio > 0:
            inner = self.channels * self.expand_ratio
            y = nn.Dense(inner, use_bias=self.use_bias, name="expand")(y)
            y = BatchNorm(name="expand_bn")(y, train=train)
            y = act(y)
        pad = (self.temporal_window - 1) // 2
        y = nn.Conv(
            inner,
            kernel_size=(self.temporal_window, 1),
            strides=(self.stride, 1),
            padding=((pad, pad), (0, 0)),
            feature_group_count=inner,
            use_bias=self.use_bias,
            name="depthwise",
        )(y)
        y = BatchNorm(name="depth_bn")(y, train=train)
        y = act(y)
        y = nn.Dense(self.channels, use_bias=self.use_bias, name="pointwise")(y)
        y = BatchNorm(name="point_bn")(y, train=train)

        edge = (
            self.param("edge", nn.initializers.ones, A.shape) if self.edge else 1.0
        )
        if train and self.keep_prob < 1.0:
            if self.fused_dropgraph:
                if self.residual:
                    y, res = _apply_drop_pair(
                        self.make_rng("dropout"), y, res,
                        self.keep_prob, A * edge, self.block_size,
                    )
                else:
                    y = _apply_drop_single(
                        self.make_rng("dropout"), y,
                        self.keep_prob, A * edge, self.block_size,
                    )
            else:
                drop_s = DropBlockSke()
                drop_t = DropBlockT(self.block_size)
                y = drop_t(
                    drop_s(y, self.keep_prob, A * edge, train),
                    self.keep_prob, train,
                )
                if self.residual:
                    res = drop_t(
                        drop_s(res, self.keep_prob, A * edge, train),
                        self.keep_prob, train,
                    )
        return act(y + res)


class SepDepthwisePointwise(nn.Module):
    """Depthwise (k,1) + BN + LeakyReLU(0.01) + pointwise 1x1 + BN, ReLU
    (``DepthWiseSeparableConv_{3x1,1x1}_1x1``, ``musa_model.py:422-458``)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        pad = (self.kernel - 1) // 2
        y = nn.Conv(
            c,
            kernel_size=(self.kernel, 1),
            padding=((pad, pad), (0, 0)),
            feature_group_count=c,
            name="depthwise",
        )(x)
        y = BatchNorm(name="bn1")(y, train=train)
        y = _leaky01(y)
        y = nn.Dense(self.features, name="pointwise")(y)
        y = BatchNorm(name="bn2")(y, train=train)
        return nn.relu(y)


class SepTCN(nn.Module):
    """Two separable blocks + 1x1 shortcut (``musa_model.py:461-474``)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        middle = (self.features - c_in) // 2 + c_in
        res = nn.Dense(self.features, name="shortcut")(x)
        y = SepDepthwisePointwise(middle, kernel=3, name="sep31")(x, train=train)
        y = SepDepthwisePointwise(self.features, kernel=1, name="sep11")(y, train=train)
        return y + res


class ClassificationModule(nn.Module):
    """Linear -> LeakyReLU(0.01) -> LayerNorm -> LeakyReLU -> Dropout(0.2)
    -> Linear (``musa_model.py:476-490``)."""

    num_classes: int
    hidden: int = 128
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.hidden)(x)
        y = _leaky01(y)
        y = nn.LayerNorm(epsilon=1e-5)(y)  # torch LayerNorm default eps
        y = _leaky01(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Dense(self.num_classes)(y)


class _MusaStream(nn.Module):
    """One stream: n_stage x [SGC -> SepT(k,s=1) -> SepT(k+2,s=2)]
    (+ optional SepTCN tail)."""

    embed_dim: int
    n_stage: int
    act_type: str
    keep_prob: float
    block_size: int
    edge: bool
    use_bias: bool
    temporal_window: int = 3
    with_tail: bool = True
    fused_dropgraph: bool = False

    @nn.compact
    def __call__(self, x, A, train: bool = False):
        dim = self.embed_dim
        common = dict(
            act_type=self.act_type,
            keep_prob=self.keep_prob,
            block_size=self.block_size,
            edge=self.edge,
            use_bias=self.use_bias,
            fused_dropgraph=self.fused_dropgraph,
        )
        for i in range(self.n_stage):
            x = MusaSpatialGraphConv(dim * 2, name=f"sgc{i}", **common)(
                x, A, train=train
            )
            x = SepTemporalBlock(
                dim * 2, self.temporal_window, stride=1, name=f"sep{i}a", **common
            )(x, A, train=train)
            x = SepTemporalBlock(
                dim * 2, self.temporal_window + 2, stride=2, name=f"sep{i}b", **common
            )(x, A, train=train)
            dim *= 2
        if self.with_tail:
            x = SepTCN(dim * 2, name="tail")(x, train=train)
        return x


class MusaModel(nn.Module):
    """Two-stream (position + motion) DropGraph GCN with raw-input residual
    (``musa_model.py:492-589``); ``with_tail=False`` gives the Ablation
    variant (``musa_model.py:593-687``)."""

    num_classes: int
    graph_layout: str = "coco_cut"
    graph_strategy: str = "uniform"
    embed_dim: int = 64
    n_stage: int = 1
    act_type: str = "tanh"
    block_size: int = 41
    keep_prob: float = 0.9
    edge: bool = True
    bias: bool = True
    with_tail: bool = True
    embed_norm: bool = False
    dropout: float = 0.2
    fused_dropgraph: bool = False

    @nn.compact
    def __call__(self, skeleton, sensor=None, train: bool = False):
        A = jnp.asarray(
            build_adjacency(self.graph_layout, self.graph_strategy), jnp.float32
        )
        pts = skeleton                                   # (N, T, V, C)
        # Gen-3 motion sign: frame t minus frame t+1 (musa_model.py:549)
        mot = pts[:, :-1, :, :2] - pts[:, 1:, :, :2]

        res_pos = pts.mean(axis=(1, 2))                  # (N, C) raw residual

        if self.embed_norm:
            # reference ``norm_data``: BN over flattened (V, C) features
            # before the 1x1 embed (``musa_model.py:370-382``; the shipped
            # Model uses norm=False, kept as the default here)
            n_, t_, v_, c_ = pts.shape
            pts = BatchNorm(name="norm_pos")(
                pts.reshape(n_, t_, v_ * c_), train=train
            ).reshape(n_, t_, v_, c_)
        embed_p = nn.Dense(self.embed_dim, use_bias=self.bias, name="joint_embed_pos")
        embed_m = nn.Dense(self.embed_dim, use_bias=self.bias, name="joint_embed_mot")
        p = nn.relu(embed_p(pts))
        m = nn.relu(embed_m(mot))

        stream_kw = dict(
            embed_dim=self.embed_dim,
            n_stage=self.n_stage,
            act_type=self.act_type,
            keep_prob=self.keep_prob,
            block_size=self.block_size,
            edge=self.edge,
            use_bias=self.bias,
            with_tail=self.with_tail,
            fused_dropgraph=self.fused_dropgraph,
        )
        out_p = _MusaStream(name="stream_pos", **stream_kw)(p, A, train=train)
        out_m = _MusaStream(name="stream_mot", **stream_kw)(m, A, train=train)

        out_p = out_p.mean(axis=(1, 2))
        out_m = out_m.mean(axis=(1, 2))
        concat = jnp.concatenate([out_p, out_m, res_pos], axis=-1)
        return ClassificationModule(
            self.num_classes, dropout=self.dropout, name="fc"
        )(concat, train=train)
