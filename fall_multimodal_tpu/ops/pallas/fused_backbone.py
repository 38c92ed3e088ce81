"""Fused-inference assembly of a trained STGCAN backbone.

Folds every block of a trained ``models.stgcan.STGCANBackbone`` (data BN,
7 blocks with edge importance, classifier head) into inference constants and
runs the deep blocks through the fused Pallas kernel where supported, an XLA
twin of the folded math elsewhere. Produces identical logits to
``backbone.apply(..., train=False)``.

Measured verdict (v5e, batch 1024, full 7-block backbone, value-fetch
synced): the plain jitted flax forward serves at 21.1k windows/s; this
folded path reaches 11.2k — XLA's native convolution pipeline wins at these
shapes, so the recommended serving path is the flax forward and this
executor is kept as the measured baseline for future kernel work.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from fall_multimodal_tpu.ops.pallas.stgcan_block import (
    FoldedBlockParams,
    fold_bn,
    fold_block_params,
    fused_stgcan_block,
)


class FusedBackbone:
    """Inference-only executor for a trained STGCANBackbone."""

    def __init__(
        self,
        backbone,
        variables: Dict[str, Any],
        use_pallas: bool = True,
        min_pallas_channels: int = 128,
        interpret: bool = False,
    ):
        params = variables["params"]
        stats = variables["batch_stats"]
        self.backbone = backbone
        self.interpret = interpret
        from fall_multimodal_tpu.graphs import build_adjacency

        A = jnp.asarray(
            build_adjacency(backbone.graph_layout, backbone.graph_strategy),
            jnp.float32,
        )

        dbn_p = params["data_bn"]["BatchNorm_0"]
        dbn_s = stats["data_bn"]["BatchNorm_0"]
        self.data_bn = fold_bn(dbn_p["scale"], dbn_p["bias"], dbn_s["mean"], dbn_s["var"])

        self.blocks: List[Dict[str, Any]] = []
        for i, (ch, stride, residual) in enumerate(backbone.stages):
            name = f"block{i}"
            imp = params.get(f"edge_importance_{i}", 1.0)
            folded, rmode = fold_block_params(params[name], stats[name], A * imp)
            if not residual:
                rmode = "none"
            # Pallas only where measured faster and supported; XLA elsewhere
            pallas_ok = use_pallas and ch >= min_pallas_channels
            self.blocks.append(
                dict(folded=folded, stride=stride, rmode=rmode,
                     pallas=pallas_ok, features=ch)
            )

        self.cls = params.get("cls")

    def _xla_block(self, x, blk):
        """XLA twin of the fused kernel on folded constants."""
        p: FoldedBlockParams = blk["folded"]
        stride, rmode = blk["stride"], blk["rmode"]
        n, t, v, cin = x.shape
        k = p.A.shape[0]
        c = p.bn1_scale.shape[0]
        y = (x.reshape(-1, cin) @ p.gcn_w + p.gcn_b).reshape(n, t, v, k, c)
        y = jnp.einsum("ntvkc,kvw->ntwc", y, p.A)
        y = jnp.maximum(y * p.bn1_scale + p.bn1_shift, 0.0)
        t_out = (t + 8 - 9) // stride + 1
        yp = jnp.pad(y, ((0, 0), (4, 4), (0, 0), (0, 0)))
        acc = sum(
            yp[:, tap : tap + (t_out - 1) * stride + 1 : stride].reshape(-1, c)
            @ p.tconv_w[tap]
            for tap in range(9)
        ).reshape(n, t_out, v, c) + p.tconv_b
        acc = acc * p.bn2_scale + p.bn2_shift
        m = acc.mean(axis=(1, 2))
        a = jnp.maximum(m @ p.se_w1 + p.se_b1, 0.0)
        a = jax.nn.sigmoid(a @ p.se_w2 + p.se_b2)
        acc = acc * a[:, None, None, :]
        if rmode == "identity":
            acc = acc + x[:, ::stride]
        elif rmode == "proj":
            r = (x[:, ::stride].reshape(-1, cin) @ p.res_w).reshape(n, t_out, v, c)
            acc = acc + (r * p.res_scale + p.res_shift)
        return jnp.maximum(acc, 0.0)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, t, v, c = x.shape
        s, b = self.data_bn
        y = (x.reshape(n, t, v * c) * s + b).reshape(n, t, v, c)
        for blk in self.blocks:
            if blk["pallas"]:
                try:
                    y = fused_stgcan_block(
                        y, blk["folded"], stride=blk["stride"],
                        residual_mode=blk["rmode"], interpret=self.interpret,
                    )
                    continue
                except Exception:
                    pass  # Mosaic toolchain failure -> XLA twin
            y = self._xla_block(y, blk)
        y = y.mean(axis=(1, 2))
        if self.cls is not None:
            y = y @ self.cls["kernel"] + self.cls["bias"]
        return y
