"""Wearable-sensor encoders: BiLSTM, 1D-CNN, CNN+BiLSTM.

Capabilities of the reference sensor stack
(``Fall_2_Spatial_Temporal_SR/Model/bilstm.py:21-59``; notebook
``GSTCAN_UR_conv.ipynb:2`` CNN1D / CNN_BiLSTM). Inputs are ``(N, T, S)``
accelerometer windows; outputs are ``(N, num_classes)`` logits (these heads
double as the sensor stream of the 3-stream fusion models).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from fall_multimodal_tpu.models.layers import (
    BatchNorm,
    BiLSTMLayer,
    MlpChannelAttention,
)


class BiLSTMHead(nn.Module):
    """BiLSTM -> (last | mean) pool -> BN -> channel attention -> Linear.

    ``feature="mean"`` is what every fusion config uses
    (``combination.py:33``); ``"last"`` is the reference default.
    """

    num_classes: int
    hidden_size: int = 64
    feature: str = "mean"

    @nn.compact
    def __call__(self, sensor: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.feature not in ("last", "mean"):
            raise ValueError(
                f"feature must be 'last' or 'mean', got {self.feature!r}"
            )
        out = BiLSTMLayer(self.hidden_size)(sensor)
        if self.feature == "last":
            out = out[:, -1, :]
        else:
            out = out.mean(axis=1)
        out = BatchNorm()(out, train=train)
        out = MlpChannelAttention()(out)
        return nn.Dense(self.num_classes)(out)


class Cnn1d(nn.Module):
    """Two Conv1d(k=5)/BN/ReLU/MaxPool(2) stages over time: (N,T,S)->(N,T/4,32).

    The reference flattens+Linear head is dead code (commented out,
    ``GSTCAN_UR_conv.ipynb:2``); the conv trunk feeds the BiLSTM.
    """

    channels: tuple = (16, 32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for ch in self.channels:
            x = nn.Conv(ch, kernel_size=(5,), padding=2)(x)
            x = BatchNorm()(x, train=train)
            x = nn.relu(x)
            x = nn.max_pool(x, window_shape=(2,), strides=(2,))
        return x


class CnnBiLSTMHead(nn.Module):
    """CNN trunk then BiLSTM head (reference ``CNN_BiLSTM``): the ctor's
    ``hidden_size`` argument is ignored by the reference, which hardcodes a
    64-unit BiLSTM over the 32-channel conv features; we default the same."""

    num_classes: int
    hidden_size: int = 64
    feature: str = "mean"

    @nn.compact
    def __call__(self, sensor: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Cnn1d()(sensor, train=train)
        return BiLSTMHead(
            num_classes=self.num_classes,
            hidden_size=self.hidden_size,
            feature=self.feature,
        )(x, train=train)


def build_sensor_encoder(
    kind: Optional[str], num_classes: int, feature: str = "mean"
) -> nn.Module:
    if kind in ("bilstm", "lstm"):
        return BiLSTMHead(num_classes=num_classes, feature=feature)
    if kind in ("cnn_bilstm", "cnn"):
        return CnnBiLSTMHead(num_classes=num_classes, feature=feature)
    raise ValueError(f"Unknown sensor encoder: {kind!r}")
