"""TARGCN family: adaptive-adjacency GCNs, graph-gated GRU, temporal
attention transformer.

Capabilities of the reference Gen-1 stack (``EmbGCN.py``, ``GRU.py``,
``TA.py``, ``TRAGCN.py``): EmbGCN builds supports I + softmax(relu(E E^T))
from learnable node embeddings with per-node weight pools, optionally gated
with a static-adjacency branch; the GRU cell uses EmbGCNs as its gate/update
transforms; AVWDCRNN stacks graph-GRU layers over time and feeds a temporal
transformer; TARGCN adds the 6-step conv predictor head.

TPU-first notes: the reference unrolls the recurrence in a python loop over
frames (``TRAGCN.py:159-166``) — here it's a single ``lax.scan``, compiled
once; attention Q/K come from (1,3) convs over the feature axis exactly as
``TA.py:26-27``. The reference's ``adj != None`` quirk (``TRAGCN.py:191``)
means the model only ever ran with an all-ones static adjacency; that is the
default here, with a real adjacency injectable.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fall_multimodal_tpu.graphs import embgcn_static_adjacency


class EmbGCN(nn.Module):
    """Adaptive-adjacency graph conv (``EmbGCN.py:59-89``).

    x: (B, V, C_in); node_embeddings: (V, D). supports = I + row-softmax of
    relu(E E^T); per-node weights from a (D, C_in, C_out) pool; plus a gated
    static branch sigmoid(s)*s where s = Linear(softmax(S) @ ... x)
    (the reference's einsum "nm,bmc->bmc" multiplies each node's features by
    the static matrix's *diagonal*-free broadcast — reproduced faithfully).
    """

    dim_out: int
    static_adj: Optional[np.ndarray] = None  # (V, V) raw adjacency
    gate: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, node_emb: jnp.ndarray) -> jnp.ndarray:
        v = node_emb.shape[0]
        dim_in = x.shape[-1]
        embed_dim = node_emb.shape[1]

        supports = jax.nn.softmax(nn.relu(node_emb @ node_emb.T), axis=1)
        supports = jnp.eye(v, dtype=x.dtype) + supports

        weights_pool = self.param(
            "weights_pool",
            nn.initializers.normal(1.0),
            (embed_dim, dim_in, self.dim_out),
        )
        bias_pool = self.param(
            "bias_pool", nn.initializers.normal(1.0), (embed_dim, self.dim_out)
        )
        weights = jnp.einsum("nd,dio->nio", node_emb, weights_pool)  # (V, in, out)
        bias = node_emb @ bias_pool                                  # (V, out)

        x_g = jnp.einsum("nm,bmc->bnc", supports, x)
        x_gconv = jnp.einsum("bni,nio->bno", x_g, weights) + bias

        if not self.gate:
            return x_gconv

        if self.static_adj is not None:
            static = jnp.asarray(
                embgcn_static_adjacency(np.asarray(self.static_adj)), x.dtype
            )
        else:
            static = jnp.asarray(
                embgcn_static_adjacency(np.ones((v, v))), x.dtype
            )
        # Reference quirk (EmbGCN.py:78): einsum "nm,bmc->bmc" — each node m
        # keeps its own features scaled by sum_n softmax(static)[n, m].
        col_weight = jax.nn.softmax(static, axis=-1).sum(axis=0)     # (V,)
        x_static = x * col_weight[None, :, None]
        x_static = nn.Dense(self.dim_out, name="static_linear")(x_static)
        return x_gconv + nn.sigmoid(x_static) * x_static


class EmbGCNLinear(nn.Module):
    """supports @ x -> Linear (``EmbGCN.py:111-124``)."""

    dim_out: int

    @nn.compact
    def __call__(self, x, node_emb):
        v = node_emb.shape[0]
        supports = jax.nn.softmax(nn.relu(node_emb @ node_emb.T), axis=1)
        supports = jnp.eye(v, dtype=x.dtype) + supports
        x_g = jnp.einsum("nm,bmc->bnc", supports, x)
        return nn.Dense(self.dim_out)(x_g)


class SpatialAttention(nn.Module):
    """Adjacency-modulated spatial attention (``EmbGCN.py:27-58``):
    softmax over nodes of Q K^T, multiplied through the static support, then
    applied to V."""

    dim_out: int
    static_adj: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, x, node_emb):
        v = x.shape[1]
        q = nn.Dense(self.dim_out, name="wq")(x)
        k = nn.Dense(self.dim_out, name="wk")(x)
        val = nn.Dense(self.dim_out, use_bias=False, name="wv")(x)
        score = jax.nn.softmax(q @ jnp.swapaxes(k, 1, 2), axis=1)
        adj = self.static_adj if self.static_adj is not None else np.ones((v, v))
        static = jnp.asarray(embgcn_static_adjacency(np.asarray(adj)), x.dtype)
        score = jnp.einsum("bnm,mc->bnc", score, static)
        return nn.relu(jnp.einsum("bnm,bmc->bnc", score, val))


class GraphGRUCell(nn.Module):
    """ConvGRU with EmbGCN gate/update transforms (``GRU.py:8-30``):
    z, r = sigmoid(GCN([x, h])); h_hat = tanh(GCN([x, r*h]));
    h' = z*h + (1-z)*h_hat."""

    hidden_dim: int
    static_adj: Optional[np.ndarray] = None
    gcn_variant: str = "gated"  # gated | nogate | linear | sa

    def _gcn(self, dim_out, name):
        if self.gcn_variant == "linear":
            return EmbGCNLinear(dim_out, name=name)
        if self.gcn_variant == "sa":
            return SpatialAttention(dim_out, static_adj=self.static_adj, name=name)
        return EmbGCN(
            dim_out,
            static_adj=self.static_adj,
            gate=(self.gcn_variant == "gated"),
            name=name,
        )

    @nn.compact
    def __call__(self, x, h, node_emb):
        xh = jnp.concatenate([x, h], axis=-1)
        z_r = nn.sigmoid(self._gcn(2 * self.hidden_dim, "gate")(xh, node_emb))
        z, r = jnp.split(z_r, 2, axis=-1)
        cand = jnp.concatenate([x, r * h], axis=-1)
        h_hat = jnp.tanh(self._gcn(self.hidden_dim, "update")(cand, node_emb))
        return z * h + (1.0 - z) * h_hat


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    """Classic sin/cos table (``TA.py:72-90``): (1, T, 1, F)."""
    pe = np.zeros((max_len, dim), np.float32)
    position = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, dim, 2) * -(math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div[: pe[:, 1::2].shape[1]])
    return pe[None, :, None, :]


class TemporalTransformLayer(nn.Module):
    """One TA layer (``TA.py:22-69``): Q, K from (1,3) convs over (V, C),
    scaled dot-product attention over time per node, residual + LN + FFN."""

    features: int
    seq_len: int = 30

    @nn.compact
    def __call__(self, x):
        # x: (B, T, V, C). Reference conv: Conv2d(T, T, (1,3)) over (V, C)
        # spatial dims — i.e. a conv that mixes time channels with a length-3
        # window on the feature axis (valid padding shrinks C by 2).
        b, t_len, v, c = x.shape
        value = nn.Dense(self.features, name="vff")(x)

        def time_conv(name):
            # treat (V, C) as spatial, T as channels: NHWC with C=T
            y = jnp.transpose(x, (0, 2, 3, 1))  # (B, V, C, T)
            y = nn.Conv(
                self.seq_len, kernel_size=(1, 3), padding="VALID", name=name
            )(y)
            return jnp.transpose(y, (0, 3, 1, 2))  # (B, T, V, C-2)

        query = time_conv("conv_q")
        key = time_conv("conv_k")

        q = jnp.transpose(query, (0, 2, 1, 3))  # (B, V, T, C')
        k = jnp.transpose(key, (0, 2, 3, 1))    # (B, V, C', T)
        val = jnp.transpose(value, (0, 2, 1, 3))

        attn = jax.nn.softmax((q @ k) / (c ** 0.5), axis=-1)
        out = attn @ val                        # (B, V, T, F)
        out = jnp.transpose(out, (0, 2, 1, 3))  # (B, T, V, F)
        out = out + x

        out = nn.LayerNorm(epsilon=1e-5, name="ln")(out)
        ff = nn.Dense(self.features, name="ff1")(out)
        ff = nn.relu(ff)
        ff = nn.Dense(self.features, name="ff2")(ff)
        out = ff + out
        return nn.LayerNorm(epsilon=1e-5, name="lnff")(out)


class TemporalTransformer(nn.Module):
    """PE + stacked TA layers (``TA.py:92-108``)."""

    features: int
    num_layers: int = 2
    max_len: int = 30

    @nn.compact
    def __call__(self, x):
        pe = jnp.asarray(sinusoidal_positions(self.max_len, self.features), x.dtype)
        x = x + pe[:, : x.shape[1]]
        for i in range(self.num_layers):
            x = TemporalTransformLayer(
                self.features, seq_len=x.shape[1], name=f"layer{i}"
            )(x)
        return x


class _ScanGRUCell(nn.Module):
    """GraphGRUCell adapted to the (carry, x) -> (carry, y) scan contract."""

    hidden_dim: int
    static_adj: Optional[np.ndarray] = None
    gcn_variant: str = "gated"

    @nn.compact
    def __call__(self, h, x_t, node_emb):
        h_new = GraphGRUCell(
            self.hidden_dim,
            static_adj=self.static_adj,
            gcn_variant=self.gcn_variant,
            name="cell",
        )(x_t, h, node_emb)
        return h_new, h_new


class GraphGRUEncoder(nn.Module):
    """Stacked graph-GRU over time + temporal transformer
    (``TRAGCN.py:134-169``). The reference's python loop over frames
    (``TRAGCN.py:159-166``) is ONE ``nn.scan`` per layer — traced and
    compiled once; the shared node embeddings broadcast through the scan.
    """

    hidden_dim: int
    num_layers: int = 2
    static_adj: Optional[np.ndarray] = None
    gcn_variant: str = "gated"

    @nn.compact
    def __call__(self, x, node_emb):
        # x: (B, T, V, C)
        b, t_len, v, _ = x.shape
        current = x
        for layer in range(self.num_layers):
            scan = nn.scan(
                _ScanGRUCell,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=(1, nn.broadcast),
                out_axes=1,
            )
            h0 = jnp.zeros((b, v, self.hidden_dim), x.dtype)
            _, current = scan(
                self.hidden_dim,
                static_adj=self.static_adj,
                gcn_variant=self.gcn_variant,
                name=f"layer{layer}",
            )(h0, current, node_emb)
        return TemporalTransformer(
            self.hidden_dim, num_layers=2, max_len=t_len, name="temporal_transformer"
        )(current)


class TARGCN(nn.Module):
    """Full TARGCN classifier (``TRAGCN.py:177-224``): graph-GRU encoder ->
    temporal transformer -> last-6-step conv predictor -> pooled linear head.

    The reference only ever ran with ``adj=None`` -> all-ones static
    adjacency (the ``adj != None`` truth-test quirk, ``TRAGCN.py:191``;
    notebook ``TARGCN_HAR_conv_10kfold.ipynb`` passes ``adj=None``): that is
    the default here, with a real adjacency injectable via ``static_adj``.
    """

    num_classes: int = 11
    num_nodes: int = 14
    rnn_units: int = 64
    output_dim: int = 64
    horizon: int = 30
    num_layers: int = 2
    embed_dim: int = 64
    static_adj: Optional[np.ndarray] = None
    gcn_variant: str = "gated"
    context_steps: int = 6

    @nn.compact
    def __call__(self, skeleton, sensor=None, train: bool = False):
        # skeleton: (B, T, V, C)
        node_emb = self.param(
            "node_embeddings",
            nn.initializers.normal(1.0),
            (self.num_nodes, self.embed_dim),
        )
        out = GraphGRUEncoder(
            self.rnn_units,
            num_layers=self.num_layers,
            static_adj=self.static_adj,
            gcn_variant=self.gcn_variant,
            name="encoder",
        )(skeleton, node_emb)

        last = out[:, -self.context_steps :]             # (B, 6, V, H)
        # end_conv: Conv2d(6, horizon*C, (1, hidden)) == dense over (6, H)
        # per node (TRAGCN.py:200,217)
        b, s, v, h = last.shape
        flat = jnp.transpose(last, (0, 2, 1, 3)).reshape(b, v, s * h)
        pred = nn.Dense(self.horizon * self.output_dim, name="end_conv")(flat)
        pred = pred.reshape(b, v, self.horizon, self.output_dim)
        # head: avgpool over (horizon, V) then linear (TRAGCN.py:201-205)
        pooled = pred.mean(axis=(1, 2))                  # (B, C)
        return nn.Dense(self.num_classes, name="head")(pooled)
