"""Fused Pallas kernel for the GSTCAN block (inference path).

The north-star fused op (SURVEY.md section 2.3 / BASELINE.json): graph conv
(1x1 channel mix + adjacency contraction) -> BN -> ReLU -> (9,1) temporal
conv -> BN -> squeeze-excite gate -> residual -> ReLU, for one sample per
grid program. All intermediates stay in VMEM — the XLA path materializes the
(N, T, V, K*C) graph-conv intermediate and the TCN activations in HBM, which
is exactly the round-trip this kernel removes.

Scope notes (honest per SURVEY.md section 7 "hard parts"):

* inference only — training BatchNorm/SE need batch-global statistics that
  do not fit the one-sample-per-program decomposition; the training path
  stays XLA (which already exceeds the throughput target by >1000x);
* BN layers are folded to per-channel affine (scale, shift) outside the
  kernel; the SE's internal BN folds into its first projection;
* V=14 and T<=30 are far below MXU tiles: per-sample matmuls are
  (T*V, C) x (C, K*C) with C in {64,128,256} — the win is memory locality,
  not matmul throughput, so the kernel is benchmarked against XLA
  (``ops/pallas/bench_kernels.py``) and selected per shape.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FoldedBlockParams(NamedTuple):
    """Inference-time constants of one STGCAN block, BN pre-folded."""

    A: jnp.ndarray             # (K, V, V) adjacency * edge importance
    gcn_w: jnp.ndarray         # (Cin, K*C)
    gcn_b: jnp.ndarray         # (K*C,)
    bn1_scale: jnp.ndarray     # (C,)   tcn_bn1 folded
    bn1_shift: jnp.ndarray
    tconv_w: jnp.ndarray       # (9, C, C)
    tconv_b: jnp.ndarray       # (C,)
    bn2_scale: jnp.ndarray     # (C,)   tcn_bn2 folded
    bn2_shift: jnp.ndarray
    se_w1: jnp.ndarray         # (C, C//4)
    se_b1: jnp.ndarray         # (C//4,) with SE-BN folded in
    se_w2: jnp.ndarray         # (C//4, C)
    se_b2: jnp.ndarray         # (C,)
    res_w: Optional[jnp.ndarray]      # (Cin, C) or None (identity/zero)
    res_scale: Optional[jnp.ndarray]  # (C,) res BN fold
    res_shift: Optional[jnp.ndarray]


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """BatchNorm at inference == per-channel affine y = x*s + t."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def _block_kernel(
    x_ref, gcn_w_ref, gcn_b_ref, A_ref,
    bn1_s_ref, bn1_t_ref, tconv_w_ref, tconv_b_ref,
    bn2_s_ref, bn2_t_ref,
    se_w1_ref, se_b1_ref, se_w2_ref, se_b2_ref,
    res_w_ref, res_s_ref, res_t_ref,
    out_ref,
    *, BN: int, T: int, V: int, K: int, C: int, stride: int,
    residual_mode: str,
):
    """BN samples per program: x (BN, T, V, Cin) -> out (BN, T_out, V, C).

    Batching several samples into one program keeps the channel-mix and
    temporal-conv matmuls MXU-sized ((BN*T*V, C) x (C, C')); one sample per
    program measured 0.6x XLA, batched wins (see bench_kernels.py).
    """
    x = x_ref[:]                                           # (BN, T, V, Cin)
    cin = x.shape[-1]
    t_out = out_ref.shape[1]

    # --- graph conv: channel mix + adjacency contraction ---
    y = jnp.dot(
        x.reshape(BN * T * V, cin), gcn_w_ref[:],
        preferred_element_type=jnp.float32,
    ) + gcn_b_ref[:]
    y = y.reshape(BN * T, V, K, C)
    # contract partitions: g[m, w, c] = sum_{k, v} y[m, v, k, c] A[k, v, w].
    # V is tiny (14-25): unroll v on the VPU instead of a transposed matmul.
    A = A_ref[:]                                           # (K, V, V)
    g = jnp.zeros((BN * T, V, C), jnp.float32)
    for k in range(K):  # K static (1..5)
        yk = y[:, :, k, :]                                 # (M, V, C)
        for v in range(V):
            g += yk[:, v : v + 1, :] * A[k, v, :][None, :, None]

    # --- BN1 + ReLU ---
    g = jnp.maximum(g * bn1_s_ref[:] + bn1_t_ref[:], 0.0)
    g = g.reshape(BN, T, V, C)

    # --- temporal conv (9, 1), stride s, pad 4 ---
    pad = 4
    gp = jnp.pad(g, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    acc = jnp.zeros((BN, t_out, V, C), jnp.float32)
    for tap in range(9):  # taps are static: plain slices, no dynamic_slice
        if stride == 1:
            window = gp[:, tap : tap + t_out]
        else:
            # strided-slice lowering is unsupported; decimate by reshape:
            # contiguous run, pad to a stride multiple, keep phase 0.
            run = gp[:, tap : tap + (t_out - 1) * stride + 1]
            pad_t = t_out * stride - run.shape[1]
            run = jnp.pad(run, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
            window = run.reshape(BN, t_out, stride, V, C)[:, :, 0]
        acc += jnp.dot(
            window.reshape(BN * t_out * V, C), tconv_w_ref[tap],
            preferred_element_type=jnp.float32,
        ).reshape(BN, t_out, V, C)
    acc += tconv_b_ref[:]

    # --- BN2 ---
    acc = acc * bn2_s_ref[:] + bn2_t_ref[:]

    # --- squeeze-excite gate (per-sample global mean over (T, V)) ---
    m = acc.reshape(BN, t_out * V, C).mean(axis=1)         # (BN, C)
    a = jnp.maximum(
        jnp.dot(m, se_w1_ref[:], preferred_element_type=jnp.float32)
        + se_b1_ref[:],
        0.0,
    )
    a = jax.nn.sigmoid(
        jnp.dot(a, se_w2_ref[:], preferred_element_type=jnp.float32)
        + se_b2_ref[:]
    )
    acc = acc * a[:, None, None, :]

    # --- residual + ReLU ---
    def decimate(arr):  # arr[:, ::stride] without strided-slice lowering
        if stride == 1:
            return arr
        pad_t = t_out * stride - arr.shape[1]
        arr = jnp.pad(arr, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        return arr.reshape(BN, t_out, stride, arr.shape[2], arr.shape[3])[:, :, 0]

    if residual_mode == "identity":
        acc = acc + decimate(x).astype(jnp.float32)
    elif residual_mode == "proj":
        xs = decimate(x)
        r = jnp.dot(
            xs.reshape(BN * t_out * V, cin), res_w_ref[:],
            preferred_element_type=jnp.float32,
        ).reshape(BN, t_out, V, C)
        acc = acc + (r * res_s_ref[:] + res_t_ref[:])
    # "none": no residual (first block)

    out_ref[:] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)


def fused_stgcan_block(
    x: jnp.ndarray,
    params: FoldedBlockParams,
    stride: int = 1,
    residual_mode: str = "identity",   # identity | proj | none
    samples_per_program: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply one fused inference STGCAN block. x: (N, T, V, Cin)."""
    n, t, v, cin = x.shape
    k, _, _ = params.A.shape
    c = params.bn1_scale.shape[0]
    t_out = (t + 2 * 4 - 9) // stride + 1

    if samples_per_program is None:
        # keep the (BN*T*V, K*C) intermediate well under VMEM
        budget = 4 * 1024 * 1024  # bytes for the largest intermediate
        samples_per_program = max(1, budget // (t * v * k * c * 4))
    bn = samples_per_program
    while n % bn:  # grid must tile N exactly
        bn -= 1

    has_proj = residual_mode == "proj"
    res_w = params.res_w if has_proj else jnp.zeros((cin, c), x.dtype)
    res_s = params.res_scale if has_proj else jnp.zeros((c,), x.dtype)
    res_t = params.res_shift if has_proj else jnp.zeros((c,), x.dtype)

    kernel = functools.partial(
        _block_kernel,
        BN=bn, T=t, V=v, K=k, C=c, stride=stride, residual_mode=residual_mode,
    )

    def bcast(shape):
        # whole-array block, same for every program
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, t_out, v, c), x.dtype),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, t, v, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            bcast(params.gcn_w.shape),
            bcast(params.gcn_b.shape),
            bcast(params.A.shape),
            bcast(params.bn1_scale.shape),
            bcast(params.bn1_shift.shape),
            bcast(params.tconv_w.shape),
            bcast(params.tconv_b.shape),
            bcast(params.bn2_scale.shape),
            bcast(params.bn2_shift.shape),
            bcast(params.se_w1.shape),
            bcast(params.se_b1.shape),
            bcast(params.se_w2.shape),
            bcast(params.se_b2.shape),
            bcast(res_w.shape),
            bcast(res_s.shape),
            bcast(res_t.shape),
        ],
        out_specs=pl.BlockSpec((bn, t_out, v, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x, params.gcn_w, params.gcn_b, params.A,
        params.bn1_scale, params.bn1_shift, params.tconv_w, params.tconv_b,
        params.bn2_scale, params.bn2_shift,
        params.se_w1, params.se_b1, params.se_w2, params.se_b2,
        res_w, res_s, res_t,
    )


def fold_block_params(block_params: dict, block_stats: dict, A: jnp.ndarray) -> tuple:
    """Fold a trained STGCANBlock's variables into FoldedBlockParams.

    ``block_params`` / ``block_stats``: the flax param / batch_stats subtrees
    of one ``models.stgcan.STGCANBlock``; ``A``: adjacency * edge importance.
    Returns (FoldedBlockParams, stride-agnostic residual_mode hint based on
    the presence of a projection).
    """
    def bn(scope_p, scope_s):
        inner_p = scope_p["BatchNorm_0"]
        inner_s = scope_s["BatchNorm_0"]
        return fold_bn(inner_p["scale"], inner_p["bias"],
                       inner_s["mean"], inner_s["var"])

    p, s = block_params, block_stats
    bn1_s, bn1_t = bn(p["tcn_bn1"], s["tcn_bn1"])
    bn2_s, bn2_t = bn(p["tcn_bn2"], s["tcn_bn2"])

    se = p["SqueezeExcite_0"]
    se_bn_s, se_bn_t = bn(se["BatchNorm_0"], s["SqueezeExcite_0"]["BatchNorm_0"])
    # fold SE BN into the first projection: BN(x W1 + b1) = x (W1*s) + (b1*s + t)
    se_w1 = se["Dense_0"]["kernel"] * se_bn_s[None, :]
    se_b1 = se["Dense_0"]["bias"] * se_bn_s + se_bn_t

    conv_k = p["TemporalConv_0"]["Conv_0"]["kernel"]      # (9, 1, C, C)
    tconv_w = jnp.transpose(conv_k[:, 0], (0, 1, 2))      # (9, Cin=C, C)

    if "res_proj" in p:
        res_w = p["res_proj"]["kernel"]
        res_s_, res_t_ = bn(p["res_bn"], s["res_bn"])
        residual_mode = "proj"
    else:
        res_w = res_s_ = res_t_ = None
        residual_mode = "identity"

    folded = FoldedBlockParams(
        A=A,
        gcn_w=p["GraphConv_0"]["Dense_0"]["kernel"],
        gcn_b=p["GraphConv_0"]["Dense_0"]["bias"],
        bn1_scale=bn1_s, bn1_shift=bn1_t,
        tconv_w=tconv_w,
        tconv_b=p["TemporalConv_0"]["Conv_0"]["bias"],
        bn2_scale=bn2_s, bn2_shift=bn2_t,
        se_w1=se_w1, se_b1=se_b1,
        se_w2=se["Dense_1"]["kernel"], se_b2=se["Dense_1"]["bias"],
        res_w=res_w, res_scale=res_s_, res_shift=res_t_,
    )
    return folded, residual_mode
