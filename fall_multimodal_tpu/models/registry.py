"""Model factory: config -> flax module.

Capability of ``Model/build_model.py:5-19`` (which is broken in the
reference: wrong import paths), extended to every model family in the
inventory. All returned modules share the forward contract
``module.apply(vars, skeleton, sensor, train=...) -> (N, K) logits``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import flax.linen as nn

from fall_multimodal_tpu.configs import Config
from fall_multimodal_tpu.models.fusion import (
    STGCANClassifier,
    ThreeStreamGSTCAN,
    TwoStreamSTGCAN,
)
from fall_multimodal_tpu.models.sensors import BiLSTMHead, CnnBiLSTMHead

_REGISTRY: Dict[str, Callable[[Config, Dict[str, Any]], nn.Module]] = {}
# Families whose forward actually reads the sensor stream (the rest accept
# it positionally and ignore it — the uniform (skeleton, sensor) contract).
# Declared ON the registration so the fact cannot drift from the registry.
_SENSOR_CONSUMERS = set()


def register(name: str, uses_sensor: bool = False):
    def deco(fn):
        _REGISTRY[name] = fn
        if uses_sensor:
            _SENSOR_CONSUMERS.add(name)
        return fn

    return deco


def model_names():
    return sorted(_REGISTRY)


def uses_sensor(name: str) -> bool:
    """True if the named model family consumes the sensor stream (serving
    must refuse ``sensor=None`` for these instead of zero-filling)."""
    if name not in _REGISTRY:
        raise ValueError(f"Unknown model {name!r}; available: {model_names()}")
    return name in _SENSOR_CONSUMERS


def build_model(config: Config) -> nn.Module:
    name = config.model.name
    if name not in _REGISTRY:
        raise ValueError(f"Unknown model {name!r}; available: {model_names()}")
    return _REGISTRY[name](config, dict(config.model.kwargs))


class _SensorOnly(nn.Module):
    """Adapts a sensor head onto the (skeleton, sensor) forward contract."""

    head: nn.Module

    @nn.compact
    def __call__(self, skeleton, sensor, train: bool = False):
        return self.head(sensor, train=train)


@register("stgcan")
@register("stgcn")  # reference alias
def _stgcan(cfg: Config, kw):
    return STGCANClassifier(
        num_classes=cfg.data.num_classes,
        graph_layout=cfg.graph.layout,
        graph_strategy=cfg.graph.strategy,
        **kw,
    )


@register("two_stgcan")
def _two_stgcan(cfg: Config, kw):
    return TwoStreamSTGCAN(
        num_classes=cfg.data.num_classes,
        graph_layout=cfg.graph.layout,
        graph_strategy=cfg.graph.strategy,
        **kw,
    )


@register("two_stgcan_bilstm", uses_sensor=True)
def _two_stgcan_bilstm(cfg: Config, kw):
    kw.setdefault("sensor_encoder", "bilstm")
    return ThreeStreamGSTCAN(
        num_classes=cfg.data.num_classes,
        graph_layout=cfg.graph.layout,
        graph_strategy=cfg.graph.strategy,
        **kw,
    )


@register("gstcan_3stream", uses_sensor=True)
def _gstcan_3stream(cfg: Config, kw):
    kw.setdefault("sensor_encoder", "cnn_bilstm")
    return ThreeStreamGSTCAN(
        num_classes=cfg.data.num_classes,
        graph_layout=cfg.graph.layout,
        graph_strategy=cfg.graph.strategy,
        **kw,
    )


@register("bilstm", uses_sensor=True)
def _bilstm(cfg: Config, kw):
    return _SensorOnly(BiLSTMHead(num_classes=cfg.data.num_classes, **kw))


@register("cnn_bilstm", uses_sensor=True)
def _cnn_bilstm(cfg: Config, kw):
    return _SensorOnly(CnnBiLSTMHead(num_classes=cfg.data.num_classes, **kw))


@register("musa")
def _musa(cfg: Config, kw):
    from fall_multimodal_tpu.models.musa import MusaModel

    kw.pop("max_frame", None)  # reference ctor arg, unused by the math
    return MusaModel(
        num_classes=cfg.data.num_classes,
        graph_layout=cfg.graph.layout,
        graph_strategy=cfg.graph.strategy,
        **kw,
    )


@register("musa_ablation")
def _musa_ablation(cfg: Config, kw):
    from fall_multimodal_tpu.models.musa import MusaModel

    kw.pop("max_frame", None)
    kw["with_tail"] = False
    return MusaModel(
        num_classes=cfg.data.num_classes,
        graph_layout=cfg.graph.layout,
        graph_strategy=cfg.graph.strategy,
        **kw,
    )


@register("targcn")
def _targcn(cfg: Config, kw):
    from fall_multimodal_tpu.models.targcn import TARGCN

    return TARGCN(
        num_classes=cfg.data.num_classes,
        num_nodes=cfg.data.num_joints,
        **kw,
    )


@register("skeleton_transformer")
def _skeleton_transformer(cfg: Config, kw):
    from fall_multimodal_tpu.models.skeleton_transformer import SkeletonTransformer

    return SkeletonTransformer(
        num_classes=cfg.data.num_classes,
        n_joints=cfg.data.num_joints,
        seq_len=cfg.data.seq_len,
        **kw,
    )


@register("skeleton_transformer_factorized")
def _skeleton_transformer_fact(cfg: Config, kw):
    from fall_multimodal_tpu.models.skeleton_transformer import SkeletonTransformer

    kw["factorized"] = True
    return SkeletonTransformer(
        num_classes=cfg.data.num_classes,
        n_joints=cfg.data.num_joints,
        seq_len=cfg.data.seq_len,
        **kw,
    )


@register("transformer_ensemble", uses_sensor=True)
def _transformer_ensemble(cfg: Config, kw):
    from fall_multimodal_tpu.models.fusion import TransformerEnsemble

    return TransformerEnsemble(
        num_classes=cfg.data.num_classes,
        n_joints=cfg.data.num_joints,
        seq_len=cfg.data.seq_len,
        **kw,
    )
