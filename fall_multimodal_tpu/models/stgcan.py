"""GSTCAN / ST-GCAN: graph spatial-temporal network with channel attention.

Capability of the reference backbone (``Fall_2_Spatial_Temporal_SR/Model/
stgcan.py:79-227``; notebook-canonical twin ``GSTCAN_UR_conv.ipynb:1``
``st_gcn``/``StreamSpatialTemporalGraph`` — the two agree on block semantics:
GCN -> TCN -> channel attention -> +residual -> ReLU).

TPU-first layout (N, T, V, C): the GCN's channel mix and the SE gate are MXU
matmuls; the (9,1) temporal conv runs NHWC; XLA fuses BN/ReLU/gating into the
surrounding matmuls. An optional fused Pallas kernel for the whole block
lives in ``ops/pallas`` behind ``use_pallas`` (kept only where it beats XLA).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from fall_multimodal_tpu.graphs import build_adjacency
from fall_multimodal_tpu.models.layers import (
    BatchNorm,
    GraphConv,
    SqueezeExcite,
    TemporalConv,
)

# (out_channels, stride, residual) per block — reference ``stgcan.py:182-194``.
STGCAN_STAGES: Tuple[Tuple[int, int, bool], ...] = (
    (64, 1, False),
    (64, 1, True),
    (64, 1, True),
    (128, 2, True),
    (128, 1, True),
    (256, 2, True),
    (256, 1, True),
)


class STGCANBlock(nn.Module):
    """One st_gcan unit: GraphConv -> (BN, ReLU, TConv(9,1), BN, Dropout)
    -> SE channel attention -> + residual -> ReLU."""

    features: int
    temporal_kernel: int = 9
    stride: int = 1
    dropout: float = 0.0
    residual: bool = True
    dense_gcn: bool = False

    @nn.compact
    def __call__(self, x, A, train: bool = False):
        in_features = x.shape[-1]
        if not self.residual:
            res = 0.0
        elif in_features == self.features and self.stride == 1:
            res = x
        else:
            res = nn.Dense(self.features, name="res_proj")(x[:, :: self.stride])
            res = BatchNorm(name="res_bn")(res, train=train)

        y = GraphConv(self.features, dense_mode=self.dense_gcn)(x, A)
        y = BatchNorm(name="tcn_bn1")(y, train=train)
        y = nn.relu(y)
        y = TemporalConv(self.features, self.temporal_kernel, self.stride)(y)
        y = BatchNorm(name="tcn_bn2")(y, train=train)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = SqueezeExcite()(y, train=train)
        return nn.relu(y + res)


class STGCANBackbone(nn.Module):
    """Full stream: data BN over (V, C) pairs, 7 STGCAN blocks with learnable
    per-block edge importance, global average pool -> (N, 256) features, or
    class logits via a 1x1 head when ``num_classes`` is set."""

    graph_layout: str = "coco_cut"
    graph_strategy: str = "spatial"
    num_classes: Optional[int] = None
    stages: Sequence[Tuple[int, int, bool]] = STGCAN_STAGES
    dropout: float = 0.0
    edge_importance: bool = True
    # Rematerialize each block in the backward pass: the train step is
    # HBM-bound (~19% MXU at batch 2048, experiments/profile_flagship.py),
    # so recomputing activations instead of saving them trades idle-MXU
    # FLOPs for the bottleneck resource.
    remat: bool = False
    # One (V*C_in)x(V*C_out) matmul per GCN instead of channel-mix + V=14
    # einsum (see GraphConv.dense_mode): +49%% train throughput on v5e
    # (9.15k -> 13.6k windows/s, bf16 batch 2048), numerically identical
    # (5.6e-9) and checkpoint-compatible. Default on; set False to compare.
    dense_gcn: bool = True

    def setup(self):
        self.A = jnp.asarray(
            build_adjacency(self.graph_layout, self.graph_strategy), jnp.float32
        )
        block_cls = (
            nn.remat(STGCANBlock, static_argnums=(3,)) if self.remat
            else STGCANBlock
        )
        self.blocks = [
            block_cls(
                features=ch,
                stride=st,
                residual=res,
                dropout=self.dropout if res else 0.0,
                dense_gcn=self.dense_gcn,
                name=f"block{i}",
            )
            for i, (ch, st, res) in enumerate(self.stages)
        ]
        if self.edge_importance:
            self.importance = [
                self.param(f"edge_importance_{i}", nn.initializers.ones, self.A.shape)
                for i in range(len(self.stages))
            ]
        else:
            self.importance = [1.0] * len(self.stages)
        if self.num_classes is not None:
            self.cls = nn.Dense(self.num_classes)
        self.data_bn = BatchNorm(name="data_bn")

    def __call__(self, x, train: bool = False):
        n, t, v, c = x.shape
        # data BN over flattened (V, C) features, stats over (N, T)
        y = self.data_bn(x.reshape(n, t, v * c), train=train)
        y = y.reshape(n, t, v, c)
        for block, imp in zip(self.blocks, self.importance):
            y = block(y, self.A * imp, train)
        y = y.mean(axis=(1, 2))  # global average pool over (T, V)
        if self.num_classes is not None:
            y = self.cls(y)
        return y


def motion_stream(skel: jnp.ndarray) -> jnp.ndarray:
    """Frame deltas of (x, y): (N, T, V, C>=2) -> (N, T-1, V, 2).

    Notebook/Gen-2 sign convention ``pts[:, :2, 1:] - pts[:, :2, :-1]``
    (``combination.py:39``); Gen-3's reversed sign lives in models/musa.py.
    """
    return skel[:, 1:, :, :2] - skel[:, :-1, :, :2]
