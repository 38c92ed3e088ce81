"""Skeleton transformer: factorized spatial/temporal relative-position MHSA.

Capability of the reference ``skeleton_transformer.py:100-514``: a joint
embedding MLP, a stack of B2T ("bottom-to-top residual") blocks that apply
spatial (over joints) then temporal (over frames) relative-position
multi-head self-attention plus an FFN, with stochastic depth ramping 0->0.5
across blocks, and a pooled 1x1 head. Variants: PreNorm block, parallel
spatial+temporal block, plain B2T block, DenseNet-style GrowthBlock, and the
spatial-then-temporal factorized Ablation1.

Layout: the reference threads (N, C, T, V, M) and permutes around every
norm/attention; here the resident layout is (N, M, T, V, C) — channels last,
no permutes in the hot path, attention contractions hit the MXU directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class RelPosMHSA(nn.Module):
    """Relative-position MHSA over a chosen token axis
    (``skeleton_transformer.py:100-157``).

    ``axis=-2``: x is (..., L, C), attention over L. ``axis=-3``: x is
    (..., L, V, C), attention over L with V untouched — the temporal
    attention runs in the resident (N, M, T, V, C) layout with NO
    transposes (round-2 ran it as swapaxes -> attend -> swapaxes; the
    copies were pure overhead at these tiny shapes).

    The learnable (2L-1, head_dim) bias table indexed by pairwise offsets
    is added as q . bias[rel] before softmax. The (L, L, HD) relative table
    is expanded with ONE tiny gather over the (2L-1, HD) parameter and then
    contracted against q as a batched matmul — the alternative
    (big matmul against the raw table + per-(i,j) take_along_axis) was
    measured 40x SLOWER on v5e: the gather runs over a (B,V,H,T,2T-1)
    operand's minor axis, which XLA lowers to a serialized gather
    (experiments/transformer_speed.py round-3 notes). The reference scales
    only the content logits (``dot_prod * scale``), not the positional
    term — reproduced.
    """

    head_dim: int = 16
    n_heads: int = 8
    seq_len: int = 32  # table size; attention length must equal this
    axis: int = -2     # token axis: -2 (last before C) or -3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        l = x.shape[self.axis]
        h, hd = self.n_heads, self.head_dim
        e = h * hd

        qkv = nn.Dense(3 * e, name="w_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(q.shape[:-1] + (h, hd))   # (..., [V,] H, HD)
        k = k.reshape(k.shape[:-1] + (h, hd))
        v = v.reshape(v.shape[:-1] + (h, hd))

        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            (2 * self.seq_len - 1, hd),
        )
        rel = np.arange(l)[:, None] - np.arange(l)[None, :] + self.seq_len - 1
        pos_tab = table[jnp.asarray(rel)]                       # (L, L, HD)

        if self.axis == -2:
            logits = jnp.einsum("...ihd,...jhd->...hij", q, k) * (e ** -0.5)
            pos = jnp.einsum("...ihd,ijd->...hij", q, pos_tab)
            attn = jax.nn.softmax(logits + pos, axis=-1)
            out = jnp.einsum("...hij,...jhd->...ihd", attn, v)
        elif self.axis == -3:
            logits = jnp.einsum("...ivhd,...jvhd->...vhij", q, k) * (e ** -0.5)
            pos = jnp.einsum("...ivhd,ijd->...vhij", q, pos_tab)
            attn = jax.nn.softmax(logits + pos, axis=-1)
            out = jnp.einsum("...vhij,...jvhd->...ivhd", attn, v)
        else:
            raise ValueError(f"axis must be -2 or -3, got {self.axis}")

        out = out.reshape(out.shape[:-2] + (e,))
        return nn.Dense(c_in, name="merge")(out)


class StochasticDepth(nn.Module):
    """Batch-mode stochastic depth (torchvision semantics,
    ``skeleton_transformer.py:226``): the whole residual branch drops with
    probability p at train time, scaled by 1/(1-p) otherwise."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate <= 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        gate = jax.random.bernoulli(self.make_rng("dropout"), keep)
        return jnp.where(gate, x / keep, jnp.zeros_like(x))


def _norm(kind: str, name: str):
    if kind == "layernorm":
        return nn.LayerNorm(epsilon=1e-5, name=name)
    if kind == "batchnorm":
        # BatchNorm3d over channels (N,M,T,V,C stats over N,M,T,V)
        return nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5, name=name)
    raise ValueError(kind)


class FFN(nn.Module):
    expand: float = 4.0
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        y = nn.Dense(int(c * self.expand))(x)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.Dense(c)(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class B2TSpatialTemporalBlock(nn.Module):
    """Spatial MHSA -> temporal MHSA -> FFN with B2T residual (the final add
    reaches back to the block input, ``skeleton_transformer.py:229-248``)."""

    head_dim: int
    n_heads: int
    n_joints: int
    seq_len: int
    ffn_expand: float = 4.0
    ffn_dropout: float = 0.5
    normalization: str = "batchnorm"
    sd_rate: float = 0.0
    attn_impl: str = "resident"  # "resident" (axis=-3) | "swap"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N, M, T, V, C)
        sd = StochasticDepth(self.sd_rate)

        def norm(name, y):
            layer = _norm(self.normalization, name)
            if self.normalization == "batchnorm":
                return layer(y, use_running_average=not train)
            return layer(y)

        spatial = RelPosMHSA(
            self.head_dim, self.n_heads, self.n_joints, name="spatial_attn"
        )
        out = x + sd(spatial(x), train)
        out = norm("norm1", out)

        # temporal attention over T. Two weight-identical implementations
        # (the round-4 profiler trace showed 43% of the train step in
        # layout-conversion copies of the attention intermediates, so the
        # layout-driving einsum form is an empirical knob, not a style
        # choice — experiments/transformer_attn_variants.py measures both):
        # * "resident": attend over axis=-3 directly in (..., T, V, C) —
        #   no transposes in the HLO, XLA picks every layout;
        # * "swap": reference-style swapaxes -> axis=-2 attention -> swap
        #   back — the transposes are explicit (..., V, T, C) copies on
        #   lane-aligned C=128 tensors instead of XLA's implicit relayouts
        #   of the (..., H, T, T) logits monsters.
        if self.attn_impl == "swap":
            temporal = RelPosMHSA(
                self.head_dim, self.n_heads, self.seq_len,
                name="temporal_attn",
            )
            t_out = jnp.swapaxes(
                temporal(jnp.swapaxes(out, -3, -2)), -3, -2
            )
        elif self.attn_impl == "resident":
            temporal = RelPosMHSA(
                self.head_dim, self.n_heads, self.seq_len, axis=-3,
                name="temporal_attn",
            )
            t_out = temporal(out)
        else:
            raise ValueError(
                f"attn_impl must be resident|swap, got {self.attn_impl!r}"
            )
        out = out + sd(t_out, train)
        out = norm("norm2", out)

        ffn = FFN(self.ffn_expand, self.ffn_dropout, name="ffn")
        out = out + sd(ffn(out, train), train)
        out = x + out                                        # B2T residual
        return norm("norm3", out)


class PreNormBlock(nn.Module):
    """Pre-norm spatial+temporal block (``skeleton_transformer.py:159-200``):
    LayerNorm before each of spatial MHSA / temporal MHSA / FFN, plain
    residuals, trailing LayerNorm applied to the FFN branch output (the
    reference normalizes ``out`` — the branch — not the residual sum)."""

    head_dim: int
    n_heads: int
    n_joints: int
    seq_len: int
    ffn_expand: float = 4.0
    ffn_dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        spatial = RelPosMHSA(self.head_dim, self.n_heads, self.n_joints,
                             name="spatial_attn")
        temporal = RelPosMHSA(self.head_dim, self.n_heads, self.seq_len,
                              axis=-3, name="temporal_attn")
        x = x + spatial(nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = x + temporal(nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        out = FFN(self.ffn_expand, self.ffn_dropout, name="ffn")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x), train
        )
        x = x + out
        return nn.LayerNorm(epsilon=1e-5, name="norm4")(out)


class B2TBlock(nn.Module):
    """Single-axis B2T block (``skeleton_transformer.py:291-320``): MHSA over
    the second-to-last axis + FFN, B2T residual, LayerNorm."""

    head_dim: int
    n_heads: int
    attn_len: int
    ffn_expand: float = 4.0
    ffn_dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn = RelPosMHSA(self.head_dim, self.n_heads, self.attn_len, name="attn")
        out = x + attn(x)
        out = nn.LayerNorm(epsilon=1e-5, name="norm1")(out)
        out = out + FFN(self.ffn_expand, self.ffn_dropout, name="ffn")(out, train)
        out = x + out
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(out)


class ParallelB2TBlock(nn.Module):
    """Parallel spatial+temporal attention variant
    (``skeleton_transformer.py:253-286``)."""

    head_dim: int
    n_heads: int
    n_joints: int
    seq_len: int
    ffn_expand: float = 4.0
    ffn_dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        spatial = RelPosMHSA(self.head_dim, self.n_heads, self.n_joints, name="spatial_attn")
        temporal = RelPosMHSA(self.head_dim, self.n_heads, self.seq_len,
                              axis=-3, name="temporal_attn")
        out = x + spatial(x) + temporal(x)
        out = nn.LayerNorm(epsilon=1e-5, name="norm1")(out)
        out = out + FFN(self.ffn_expand, self.ffn_dropout, name="ffn")(out, train)
        out = x + out
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(out)


class GrowthBlock(nn.Module):
    """DenseNet-style concat growth (``skeleton_transformer.py:322-348``)."""

    head_dim: int
    n_heads: int
    n_joints: int
    seq_len: int
    growth: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = B2TBlock(self.head_dim, self.n_heads, self.n_joints, name="block")(
            x, train=train
        )
        y = nn.Dense(self.growth)(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.LayerNorm(epsilon=1e-5)(y)
        return jnp.concatenate([x, y], axis=-1)


class SkeletonTransformer(nn.Module):
    """Embedding MLP -> n B2T spatial-temporal blocks (stochastic depth
    0 -> 0.5) -> pooled 1x1 head (``skeleton_transformer.py:360-435``).

    Input skeleton: (N, T, V, C) or (N, M, T, V, C) with M persons.
    """

    num_classes: int
    n_joints: int = 14
    seq_len: int = 30
    embedding_dim: int = 32
    n_block: int = 6
    head_dim: int = 16
    n_heads: int = 8
    factorized: bool = False  # Ablation1: all-spatial then all-temporal
    attn_impl: str = "resident"  # temporal-attention layout variant

    @nn.compact
    def __call__(self, skeleton, sensor=None, train: bool = False):
        # (N, T, V, C) stays 4-D — blocks index axes from the right, and a
        # size-1 persons dim just degrades tiling; (N, M, T, V, C) keeps M
        x = skeleton
        has_m = x.ndim == 5
        # embed: Linear(C -> E/2) GELU Linear(E/2 -> E) GELU
        y = nn.Dense(self.embedding_dim // 2, name="embed1")(x)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.Dense(self.embedding_dim, name="embed2")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf

        if not self.factorized:
            sd_rates = np.linspace(0.0, 0.5, self.n_block)
            for i in range(self.n_block):
                y = B2TSpatialTemporalBlock(
                    head_dim=self.head_dim,
                    n_heads=self.n_heads,
                    n_joints=self.n_joints,
                    seq_len=self.seq_len,
                    normalization="batchnorm",
                    sd_rate=float(sd_rates[i]),
                    attn_impl=self.attn_impl,
                    name=f"block{i}",
                )(y, train=train)
        else:
            for i in range(self.n_block // 2):
                y = B2TBlock(
                    self.head_dim, self.n_heads, self.n_joints, name=f"spatial{i}"
                )(y, train=train)
            y = jnp.swapaxes(y, -3, -2)
            for i in range(self.n_block // 2):
                y = B2TBlock(
                    self.head_dim, self.n_heads, self.seq_len, name=f"temporal{i}"
                )(y, train=train)
            y = jnp.swapaxes(y, -3, -2)

        # pool over (T, V), mean over persons M, then 1x1 head
        y = y.mean(axis=(-3, -2))                            # (N, [M,] C)
        if has_m:
            y = y.mean(axis=1)                               # (N, C)
        return nn.Dense(self.num_classes, name="head")(y)
