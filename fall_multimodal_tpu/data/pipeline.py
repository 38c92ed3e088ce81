"""Device-resident batching.

The whole dataset fits in HBM for every workload this framework targets
(SURVEY.md section 7), so instead of the reference's 8-worker DataLoader
(``dataloader.py:93-102``) the pipeline is: one ``device_put`` per split,
then every epoch is a fresh on-device permutation reshaped to
``(steps, batch)`` index matrix that a jitted ``lax.scan`` gathers from.
No per-batch host->device copies, no worker processes, static shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fall_multimodal_tpu.data.synthetic import WindowedDataset


class DeviceData(NamedTuple):
    """A split resident in HBM. ``sensors`` is all-zeros (1-dim) when the
    dataset has no sensor stream, keeping the pytree structure static."""

    features: jnp.ndarray  # (N, T, V, C)
    labels: jnp.ndarray    # (N, K)
    sensors: jnp.ndarray   # (N, T, S) or (N, 1, 1) placeholder

    @property
    def n(self) -> int:
        return self.features.shape[0]


def to_device(
    data: WindowedDataset,
    dtype: jnp.dtype = jnp.float32,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> DeviceData:
    put = (lambda x: jax.device_put(x, sharding)) if sharding else jax.device_put
    sensors = (
        data.sensors
        if data.sensors is not None
        else np.zeros((len(data), 1, 1), np.float32)
    )
    return DeviceData(
        features=put(jnp.asarray(data.features, dtype)),
        labels=put(jnp.asarray(data.labels, jnp.float32)),
        sensors=put(jnp.asarray(sensors, dtype)),
    )


def epoch_batch_indices(
    key: jax.Array, n: int, batch_size: int, drop_last: bool = True
) -> jnp.ndarray:
    """(steps, batch_size) shuffled index matrix for one epoch.

    With ``drop_last=False`` the tail batch is padded by wrapping around the
    permutation (duplicates only in the final batch of an epoch).
    """
    perm = jax.random.permutation(key, n)
    if drop_last:
        steps = n // batch_size
        return perm[: steps * batch_size].reshape(steps, batch_size)
    steps = -(-n // batch_size)
    padded = jnp.concatenate([perm, perm[: steps * batch_size - n]])
    return padded.reshape(steps, batch_size)


def eval_batch_indices(n: int, batch_size: int) -> np.ndarray:
    """Deterministic eval batching; tail padded by repeating the last index.

    Metrics mask the padding via :func:`eval_batch_mask`.
    """
    steps = -(-n // batch_size)
    idx = np.arange(steps * batch_size)
    idx = np.minimum(idx, n - 1)
    return idx.reshape(steps, batch_size)


def eval_batch_mask(n: int, batch_size: int) -> np.ndarray:
    steps = -(-n // batch_size)
    return (np.arange(steps * batch_size) < n).reshape(steps, batch_size)


def gather_batch(data: DeviceData, idx: jnp.ndarray) -> DeviceData:
    """Gather one batch by index inside a jitted scan body."""
    return DeviceData(
        features=jnp.take(data.features, idx, axis=0),
        labels=jnp.take(data.labels, idx, axis=0),
        sensors=jnp.take(data.sensors, idx, axis=0),
    )
