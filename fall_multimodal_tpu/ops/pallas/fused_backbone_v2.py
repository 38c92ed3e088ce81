"""Whole-backbone fused Pallas serving kernel.

STATUS (round 2): kept flag-gated and off the default serving path. The
measured roofline closed the fused-kernel north star in XLA's favor — the
workload is MXU-bound (inter-block HBM traffic is ~4% of bandwidth, so
whole-model fusion has nothing to save) and Mosaic compile time is
superlinear in fused-body size (325 s / 1,057 s for 1-/2-block bodies).
Full analysis: PARITY.md "Fused-kernel north star". Correctness is locked
by tests (interpret mode) and 1-/2-block real-chip probes (4.8e-4).

Round 1's per-block kernel still round-tripped activations through HBM
between the 7 ``pallas_call``s and lost to plain XLA end-to-end. This
version runs the ENTIRE inference backbone — data BN, all 7 STGCAN blocks,
global pool, classifier — in ONE ``pallas_call`` per batch tile: HBM
traffic is the raw input read, the logits write, and one resident pass
over the folded weights; every intermediate lives in VMEM.

Two Mosaic-shaped design rules (this toolchain rejects sub-128 lane
shapes: C=64 blocks fail with "infer-vector-layout: unsupported shape
cast"):

* every stage's channel width is zero-padded to >=128 lanes inside the
  folded constants, so padded channels stay exactly zero through
  ReLU/SE/residual;
* the graph convolution is the DENSE single matmul of the training path
  (``models/layers.py GraphConv.dense_mode``): the (K, V, V) adjacency
  folds into the channel-mix weights, ``U[(v,ci),(w,co)] = sum_k
  A[k,v,w] W[ci,k,co]``, so each block's GCN is one lane-aligned
  ``(BN*T, V*C) @ (V*C, V*C')`` matmul — no V=14 contraction loop, and
  the eval data-BN (a per-(v,c) affine) folds straight into block0's U
  rows. The first unroll-everything kernel generated so much Mosaic IR
  that the remote compile helper never returned; this one is matmuls +
  nine temporal taps per block.

Eval BatchNorms fold to per-channel affines: data BN into block0's U,
tcn_bn2 into the conv taps, res_bn into the residual projection, SE's BN
into its first projection; tcn_bn1 stays a (C,) affine because it applies
after the adjacency contraction.

Reference block semantics: ``Model/stgcan.py:138-144``; stage plan
``stgcan.py:182-194``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fall_multimodal_tpu.ops.pallas.stgcan_block import fold_bn

_MIN_C = 128  # smallest lane-legal channel width on this toolchain


class FoldedDenseBlock(NamedTuple):
    """One block's inference constants (BNs folded, channels padded)."""

    U: jnp.ndarray          # (V*Cin_p, V*C_p) dense GCN (+data-bn for blk0)
    bU: jnp.ndarray         # (V*C_p,) position-dependent GCN bias
    bn1_s: jnp.ndarray      # (C_p,) applied after the GCN matmul
    bn1_t: jnp.ndarray
    tconv_w: jnp.ndarray    # (9, C_p, C_p)   (+bn2 col-scale)
    tconv_b: jnp.ndarray    # (C_p,)          (+bn2)
    se_w1: jnp.ndarray      # (C_p, H_p)      (+se-bn)
    se_b1: jnp.ndarray      # (H_p,)
    se_w2: jnp.ndarray      # (H_p, C_p)
    se_b2: jnp.ndarray      # (C_p,)
    se_gate_mask: jnp.ndarray  # (C_p,) 1 on real channels, 0 on padding
    res_w: jnp.ndarray      # (Cin_p, C_p) proj (+res-bn col-scale)
    res_b: jnp.ndarray      # (C_p,)


class FoldedBackbone(NamedTuple):
    blocks: Tuple[FoldedDenseBlock, ...]
    stage_plan: Tuple[Tuple[int, int, str], ...]   # (C_pad, stride, rmode)
    cls_w: jnp.ndarray      # (C_last_p, num_classes)
    cls_b: jnp.ndarray      # (num_classes,)
    feat_dim: int           # real (unpadded) feature width of the last block


def _pad_to(arr: jnp.ndarray, axis: int, size: int) -> jnp.ndarray:
    if arr.shape[axis] == size:
        return arr
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (0, size - arr.shape[axis])
    return jnp.pad(arr, pads)


def fold_backbone(backbone, variables: Dict[str, Any],
                  dtype=jnp.float32) -> FoldedBackbone:
    """Fold a trained ``models.stgcan.STGCANBackbone`` into kernel constants."""
    from fall_multimodal_tpu.graphs import build_adjacency

    params, stats = variables["params"], variables["batch_stats"]
    A = jnp.asarray(
        build_adjacency(backbone.graph_layout, backbone.graph_strategy),
        jnp.float32,
    )
    k, v, _ = A.shape

    def bn_affine(scope_p, scope_s):
        inner_p, inner_s = scope_p["BatchNorm_0"], scope_s["BatchNorm_0"]
        return fold_bn(inner_p["scale"], inner_p["bias"],
                       inner_s["mean"], inner_s["var"])

    # data BN: per-(v, c_in0) affine on the raw input
    dbn_s, dbn_t = bn_affine(params["data_bn"], stats["data_bn"])  # (V*Cin0,)

    blocks: List[FoldedDenseBlock] = []
    plan: List[Tuple[int, int, str]] = []
    cin_p = None  # padded input width of the current block
    for i, (c, stride, residual) in enumerate(backbone.stages):
        p, s = params[f"block{i}"], stats[f"block{i}"]
        imp = params.get(f"edge_importance_{i}", 1.0)
        Ai = A * imp
        c_p = max(c, _MIN_C)
        h = c // 4
        h_p = max(c_p // 4, 32)

        gcn_w = p["GraphConv_0"]["Dense_0"]["kernel"]      # (cin, K*c)
        gcn_b = p["GraphConv_0"]["Dense_0"]["bias"]        # (K*c,)
        cin = gcn_w.shape[0]
        if i == 0 and cin > _MIN_C:
            # the kernel lane-pads the raw input by (_MIN_C - Cin0); a wider
            # block-0 input would need a multi-tile input layout this fold
            # does not build (and jnp.pad would get a negative width)
            raise ValueError(
                f"fold_backbone: block 0 input width {cin} exceeds the "
                f"{_MIN_C}-lane input tile this kernel pads to"
            )
        cin_pad = cin_p if i > 0 else _MIN_C

        # dense fold (layers.py GraphConv.dense_mode, channel-padded):
        # U[(v,ci),(w,co)] = sum_k A[k,v,w] W[ci,k,co]
        W = _pad_to(gcn_w.reshape(cin, k, c), 2, c_p)      # (cin, K, c_p)
        U4 = jnp.einsum("kvw,ikc->viwc", Ai, W)            # (V, cin, V, c_p)
        bU = jnp.einsum(                                   # (V, c_p)
            "kvw,kc->wc", Ai, _pad_to(gcn_b.reshape(k, c), 1, c_p)
        )
        if i == 0:
            # eval data BN folds into U's rows: (x*s + t) @ U = x @ (s*U)
            # + (t @ U + b); s, t are flat (V*Cin0,) = exactly U's row space.
            bU = bU + (dbn_t @ U4.reshape(v * cin, v * c_p)).reshape(v, c_p)
            U4 = U4 * dbn_s.reshape(v, cin)[:, :, None, None]
        U = _pad_to(U4, 1, cin_pad).reshape(v * cin_pad, v * c_p)

        bn1_s, bn1_t = bn_affine(p["tcn_bn1"], s["tcn_bn1"])
        bn2_s, bn2_t = bn_affine(p["tcn_bn2"], s["tcn_bn2"])
        conv_k = p["TemporalConv_0"]["Conv_0"]["kernel"][:, 0]   # (9, c, c)
        tconv_w = conv_k * bn2_s[None, None, :]
        tconv_b = p["TemporalConv_0"]["Conv_0"]["bias"] * bn2_s + bn2_t

        se = p["SqueezeExcite_0"]
        se_bn_s, se_bn_t = bn_affine(se["BatchNorm_0"],
                                     s["SqueezeExcite_0"]["BatchNorm_0"])
        se_w1 = se["Dense_0"]["kernel"] * se_bn_s[None, :]       # (c, h)
        se_b1 = se["Dense_0"]["bias"] * se_bn_s + se_bn_t
        se_w2 = se["Dense_1"]["kernel"]                          # (h, c)
        se_b2 = se["Dense_1"]["bias"]

        if not residual:
            rmode = "none"
            res_w = jnp.zeros((cin, c), jnp.float32)
            res_b = jnp.zeros((c,), jnp.float32)
        elif "res_proj" in p:
            rmode = "proj"
            rs, rt = bn_affine(p["res_bn"], s["res_bn"])
            res_w = p["res_proj"]["kernel"] * rs[None, :]
            res_b = p["res_proj"]["bias"] * rs + rt
        else:
            rmode = "identity"
            res_w = jnp.zeros((cin, c), jnp.float32)
            res_b = jnp.zeros((c,), jnp.float32)

        blocks.append(FoldedDenseBlock(
            U=U.astype(dtype),
            bU=bU.reshape(v * c_p).astype(jnp.float32),
            bn1_s=_pad_to(bn1_s, 0, c_p).astype(jnp.float32),
            bn1_t=_pad_to(bn1_t, 0, c_p).astype(jnp.float32),
            tconv_w=_pad_to(_pad_to(tconv_w, 1, c_p), 2, c_p).astype(dtype),
            tconv_b=_pad_to(tconv_b, 0, c_p).astype(jnp.float32),
            se_w1=_pad_to(_pad_to(se_w1, 0, c_p), 1, h_p).astype(dtype),
            se_b1=_pad_to(se_b1, 0, h_p).astype(jnp.float32),
            se_w2=_pad_to(_pad_to(se_w2, 0, h_p), 1, c_p).astype(dtype),
            se_b2=_pad_to(se_b2, 0, c_p).astype(jnp.float32),
            se_gate_mask=_pad_to(jnp.ones((c,)), 0, c_p).astype(jnp.float32),
            res_w=_pad_to(_pad_to(res_w, 0, cin_pad), 1, c_p).astype(dtype),
            res_b=_pad_to(res_b, 0, c_p).astype(jnp.float32),
        ))
        plan.append((c_p, stride, rmode))
        cin_p = c_p

    cls = params["cls"]
    c_last = backbone.stages[-1][0]
    return FoldedBackbone(
        blocks=tuple(blocks),
        stage_plan=tuple(plan),
        cls_w=_pad_to(cls["kernel"], 0, cin_p).astype(dtype),
        cls_b=cls["bias"].astype(jnp.float32),
        feat_dim=c_last,
    )


_PER = 13  # refs per block, FoldedDenseBlock field order


def _backbone_kernel(x_ref, *refs, BN: int, T0: int,
                     V: int, plan: Tuple[Tuple[int, int, str], ...]):
    n_blocks = len(plan)
    cls_w_ref = refs[n_blocks * _PER]
    cls_b_ref = refs[n_blocks * _PER + 1]
    out_ref = refs[n_blocks * _PER + 2]

    x = x_ref[:].astype(jnp.float32)                     # (BN, T, V, Cin0)
    # lane-pad the raw input so block0's flat matmul is 128-lane aligned
    # (U's padded rows are zero, so the padding never contributes)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, _MIN_C - x.shape[-1])))

    t = T0
    for i, (c, stride, rmode) in enumerate(plan):
        (U_ref, bU_ref, b1s_ref, b1t_ref, tw_ref, tb_ref,
         sw1_ref, sb1_ref, sw2_ref, sb2_ref, gm_ref,
         rw_ref, rb_ref) = refs[i * _PER:(i + 1) * _PER]
        cin = x.shape[-1]

        # --- dense GCN: one (BN*T, V*Cin) @ (V*Cin, V*C) matmul
        #     (adjacency + data BN folded into U host-side) ---
        g = jnp.dot(
            x.reshape(BN * t, V * cin).astype(U_ref.dtype), U_ref[:],
            preferred_element_type=jnp.float32,
        ) + bU_ref[:]

        # --- BN1 + ReLU ---
        g = g.reshape(BN, t, V, c)
        g = jnp.maximum(g * b1s_ref[:] + b1t_ref[:], 0.0)

        # --- temporal conv (9,1), stride, bn2 folded ---
        t_out = (t + 8 - 9) // stride + 1
        gp = jnp.pad(g, ((0, 0), (4, 4), (0, 0), (0, 0)))
        acc = jnp.zeros((BN, t_out, V, c), jnp.float32)
        for tap in range(9):
            if stride == 1:
                window = gp[:, tap:tap + t_out]
            else:
                run = gp[:, tap:tap + (t_out - 1) * stride + 1]
                pad_t = t_out * stride - run.shape[1]
                run = jnp.pad(run, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
                window = run.reshape(BN, t_out, stride, V, c)[:, :, 0]
            acc += jnp.dot(
                window.reshape(BN * t_out * V, c).astype(tw_ref.dtype),
                tw_ref[tap],
                preferred_element_type=jnp.float32,
            ).reshape(BN, t_out, V, c)
        acc += tb_ref[:]

        # --- squeeze-excite (padded channels contribute exact zeros;
        #     the mean divides by the REAL channel count's spatial size) ---
        m = acc.reshape(BN, t_out * V, c).mean(axis=1)
        a = jnp.maximum(
            jnp.dot(m.astype(sw1_ref.dtype), sw1_ref[:],
                    preferred_element_type=jnp.float32) + sb1_ref[:],
            0.0,
        )
        a = jax.nn.sigmoid(
            jnp.dot(a.astype(sw2_ref.dtype), sw2_ref[:],
                    preferred_element_type=jnp.float32) + sb2_ref[:]
        )
        acc = acc * (a * gm_ref[:])[:, None, None, :]

        # --- residual + ReLU ---
        def decimate(arr):
            if stride == 1:
                return arr
            pad_t = t_out * stride - arr.shape[1]
            arr = jnp.pad(arr, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
            return arr.reshape(BN, t_out, stride, arr.shape[2],
                               arr.shape[3])[:, :, 0]

        if rmode == "identity":
            acc = acc + decimate(x)
        elif rmode == "proj":
            xs = decimate(x)
            acc = acc + (
                jnp.dot(
                    xs.reshape(BN * t_out * V, cin).astype(rw_ref.dtype),
                    rw_ref[:],
                    preferred_element_type=jnp.float32,
                ).reshape(BN, t_out, V, c)
                + rb_ref[:]
            )

        x = jnp.maximum(acc, 0.0)
        t = t_out

    feat = x.reshape(BN, t * V, x.shape[-1]).mean(axis=1)   # (BN, C_p)
    logits = jnp.dot(
        feat.astype(cls_w_ref.dtype), cls_w_ref[:],
        preferred_element_type=jnp.float32,
    ) + cls_b_ref[:]
    out_ref[:] = logits.astype(out_ref.dtype)


def fused_backbone_forward(
    x: jnp.ndarray,
    folded: FoldedBackbone,
    samples_per_program: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Serve the whole backbone in one pallas_call. x: (N, T, V, Cin)."""
    n, t0, v, cin = x.shape
    num_classes = folded.cls_b.shape[0]
    bn = min(samples_per_program, n)
    while n % bn:
        bn -= 1

    kernel = functools.partial(
        _backbone_kernel, BN=bn, T0=t0, V=v, plan=folded.stage_plan,
    )

    def bcast(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    operands = [x]
    in_specs = [
        pl.BlockSpec((bn, t0, v, cin), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for blk in folded.blocks:
        for arr in blk:
            operands.append(arr)
            in_specs.append(bcast(arr))
    operands += [folded.cls_w, folded.cls_b]
    in_specs += [bcast(folded.cls_w), bcast(folded.cls_b)]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, num_classes), jnp.float32),
        grid=(n // bn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bn, num_classes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        # the whole-backbone body keeps several (BN, T, V, C) live values on
        # the kernel stack; the 16MB default scoped-vmem limit OOMs at
        # BN>=8 (measured) — raise it toward the chip's 128MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(*operands)
