"""Late-fusion heads: 1-, 2-, and 3-stream models.

Capabilities of the reference fusion surface:

* ``STGCANClassifier`` — single-stream skeleton classifier
  (``Model/stgcan.py:147-227`` with ``num_class`` set);
* ``TwoStreamSTGCAN`` — points + motion, concat 512 -> Linear
  (``Model/combination.py:9-25``; the reference's forward has an arity bug
  and never ran — built here as intended);
* ``ThreeStreamGSTCAN`` — points + motion + sensor encoder, concat
  (512 + num_classes) -> Linear. Covers both the packaged
  ``TwoStreamSTGCAN_BiLSTM`` (``combination.py:27-46``, sensor = BiLSTM) and
  the notebook-canonical ``TwoStreamSpatialTemporalGraph`` with in-model
  ``CNN_BiLSTM`` (``GSTCAN_UR_conv.ipynb:1`` — the BASELINE parity anchor).
  The notebook's trailing ``F.softmax`` is *not* baked into the forward;
  set ``model.softmax_output`` so the loss reproduces it (train-time parity)
  while logits stay logits for serving.

All models share one forward contract:
``(skeleton (N,T,V,C) | None, sensor (N,T,S) | None, train) -> (N, K)``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from fall_multimodal_tpu.models.sensors import build_sensor_encoder
from fall_multimodal_tpu.models.stgcan import STGCAN_STAGES, STGCANBackbone, motion_stream


class STGCANClassifier(nn.Module):
    num_classes: int
    graph_layout: str = "coco_cut"
    graph_strategy: str = "spatial"
    dropout: float = 0.0
    stages: Sequence[Tuple[int, int, bool]] = STGCAN_STAGES
    remat: bool = False
    dense_gcn: bool = True

    @nn.compact
    def __call__(self, skeleton, sensor=None, train: bool = False):
        return STGCANBackbone(
            graph_layout=self.graph_layout,
            graph_strategy=self.graph_strategy,
            num_classes=self.num_classes,
            dropout=self.dropout,
            stages=self.stages,
            remat=self.remat,
            dense_gcn=self.dense_gcn,
        )(skeleton, train=train)


class TwoStreamSTGCAN(nn.Module):
    num_classes: int
    graph_layout: str = "coco_cut"
    graph_strategy: str = "spatial"
    dropout: float = 0.0
    stages: Sequence[Tuple[int, int, bool]] = STGCAN_STAGES
    remat: bool = False
    dense_gcn: bool = True

    @nn.compact
    def __call__(self, skeleton, sensor=None, train: bool = False):
        mot = motion_stream(skeleton)
        kw = dict(
            graph_layout=self.graph_layout,
            graph_strategy=self.graph_strategy,
            dropout=self.dropout,
            stages=self.stages,
            remat=self.remat,
            dense_gcn=self.dense_gcn,
        )
        pts = STGCANBackbone(name="pts_stream", **kw)(skeleton, train=train)
        mos = STGCANBackbone(name="mot_stream", **kw)(mot, train=train)
        return nn.Dense(self.num_classes)(jnp.concatenate([pts, mos], axis=-1))


class ThreeStreamGSTCAN(nn.Module):
    """pts STGCAN + motion STGCAN + sensor encoder -> concat -> Linear."""

    num_classes: int
    graph_layout: str = "coco_cut"
    graph_strategy: str = "spatial"
    sensor_encoder: str = "bilstm"  # bilstm (packaged Gen-2) | cnn_bilstm (notebook)
    dropout: float = 0.0
    stages: Sequence[Tuple[int, int, bool]] = STGCAN_STAGES
    remat: bool = False
    dense_gcn: bool = True

    @nn.compact
    def __call__(self, skeleton, sensor, train: bool = False):
        mot = motion_stream(skeleton)
        kw = dict(
            graph_layout=self.graph_layout,
            graph_strategy=self.graph_strategy,
            dropout=self.dropout,
            stages=self.stages,
            remat=self.remat,
            dense_gcn=self.dense_gcn,
        )
        pts = STGCANBackbone(name="pts_stream", **kw)(skeleton, train=train)
        mos = STGCANBackbone(name="mot_stream", **kw)(mot, train=train)
        sen = build_sensor_encoder(self.sensor_encoder, self.num_classes)(
            sensor, train=train
        )
        concat = jnp.concatenate([pts, mos, sen], axis=-1)
        return nn.Dense(self.num_classes)(concat)


class TransformerEnsemble(nn.Module):
    """Skeleton transformer (pts) + CNN_BiLSTM (sensor), concat per-stream
    logits -> Linear (notebook ``GSTCAN_HAR_conv_kfold_trans.ipynb:3``
    ``Ensemble``)."""

    num_classes: int
    n_joints: int = 14
    seq_len: int = 30
    embedding_dim: int = 32
    n_block: int = 6
    head_dim: int = 16
    n_heads: int = 8

    @nn.compact
    def __call__(self, skeleton, sensor, train: bool = False):
        from fall_multimodal_tpu.models.sensors import CnnBiLSTMHead
        from fall_multimodal_tpu.models.skeleton_transformer import (
            SkeletonTransformer,
        )

        out1 = SkeletonTransformer(
            num_classes=self.num_classes,
            n_joints=self.n_joints,
            seq_len=self.seq_len,
            embedding_dim=self.embedding_dim,
            n_block=self.n_block,
            head_dim=self.head_dim,
            n_heads=self.n_heads,
            name="skeleton_transformer",
        )(skeleton, train=train)
        out2 = CnnBiLSTMHead(num_classes=self.num_classes, name="signal_model")(
            sensor, train=train
        )
        return nn.Dense(self.num_classes)(jnp.concatenate([out1, out2], axis=-1))
