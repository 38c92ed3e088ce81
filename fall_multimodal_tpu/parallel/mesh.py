"""Device-mesh data parallelism.

The reference has no distributed code at all (SURVEY.md section 2.5); the
TPU-native scale-out story for this workload is a 1-D data mesh: parameters
replicated, batch compute sharded across chips over ICI, gradient reduction
compiled by XLA as a ``psum``. Datasets here are small enough to replicate in
HBM, so each device gathers its batch locally and a sharding constraint on
the batch splits the compute; with GSPMD the program semantics (including
BatchNorm batch statistics) stay *globally* identical to single-device —
XLA inserts the cross-chip collectives.

Models are <= ~5M parameters with T=30 sequences: tensor / pipeline /
sequence / expert parallelism would add collectives with nothing to
amortize them; data parallel is the one load-bearing axis (SURVEY.md 2.5).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fall_multimodal_tpu.data.pipeline import DeviceData, gather_batch
from fall_multimodal_tpu.train.loop import make_train_step
from fall_multimodal_tpu.train.state import TrainState


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    # Auto axis type: GSPMD propagates shardings from constraints (the
    # jax 0.9 make_mesh default is Explicit, which rejects
    # with_sharding_constraint).
    return jax.make_mesh(
        (n,), (axis,), devices=devices[:n],
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    return jax.device_put(state, replicated(mesh))


def replicate_data(data: DeviceData, mesh: Mesh) -> DeviceData:
    return jax.device_put(data, replicated(mesh))


def shard_data(data: DeviceData, mesh: Mesh, axis: str = DATA_AXIS) -> DeviceData:
    """Shard a split along the sample axis (for datasets too large to
    replicate; batch gathers then ride ICI)."""
    return jax.device_put(data, batch_sharded(mesh, axis))


def make_parallel_train_epoch(
    model,
    optimizer,
    mesh: Mesh,
    label_smoothing: float = 0.0,
    softmax_before_ce: bool = False,
    axis: str = DATA_AXIS,
):
    """Whole-epoch jitted scan with batch compute sharded across the mesh.

    state: replicated; data: replicated (or sample-sharded); the per-step
    batch is constrained to ``P(axis)`` so XLA partitions forward/backward
    across chips and all-reduces gradients.
    """
    train_step = make_train_step(model, optimizer, label_smoothing, softmax_before_ce)
    batch_spec = P(axis)

    def constrain(batch: DeviceData) -> DeviceData:
        return DeviceData(
            features=jax.lax.with_sharding_constraint(
                batch.features, NamedSharding(mesh, batch_spec)
            ),
            labels=jax.lax.with_sharding_constraint(
                batch.labels, NamedSharding(mesh, batch_spec)
            ),
            sensors=jax.lax.with_sharding_constraint(
                batch.sensors, NamedSharding(mesh, batch_spec)
            ),
        )

    @jax.jit
    def epoch(state: TrainState, data: DeviceData, batch_idx: jnp.ndarray):
        def body(st, idx):
            return train_step(st, constrain(gather_batch(data, idx)))

        state, metrics = jax.lax.scan(body, state, batch_idx)
        return state, jax.tree.map(jnp.mean, metrics)

    return epoch


def make_parallel_train_step(
    model,
    optimizer,
    mesh: Mesh,
    label_smoothing: float = 0.0,
    softmax_before_ce: bool = False,
    axis: str = DATA_AXIS,
):
    """Single pjit-ted train step with explicit in/out shardings (the unit
    the driver compile-checks multi-chip)."""
    step = make_train_step(model, optimizer, label_smoothing, softmax_before_ce)
    repl = replicated(mesh)
    shard = batch_sharded(mesh, axis)

    return jax.jit(
        step,
        in_shardings=(repl, DeviceData(features=shard, labels=shard, sensors=shard)),
        out_shardings=(repl, repl),
    )
