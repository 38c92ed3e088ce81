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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fall_multimodal_tpu.data.pipeline import DeviceData
from fall_multimodal_tpu.train.loop import make_train_step
from fall_multimodal_tpu.train.state import TrainState


DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host hook: bring up JAX's distributed runtime (call ONCE, before
    any other JAX use). After it, ``jax.devices()`` spans every host's chips
    and the same 1-D mesh from :func:`make_mesh` lays data parallelism over
    ICI within a host and DCN across hosts — no other code changes; GSPMD
    compiles the cross-host collectives exactly like the single-host ones.

    Arguments default from the standard env vars ``JAX_COORDINATOR_ADDRESS``
    / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``; with none set anywhere,
    JAX's own cluster auto-detection runs (Cloud TPU / GKE metadata).
    Returns the process count. The reference is strictly single-process
    (SURVEY.md section 2.5 — no torch.distributed/NCCL/MPI anywhere); this
    is the TPU-native equivalent of the backend it never had.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


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
    compute_dtype=None,
    grad_norms: bool = False,
    impl: str = "scan",
):
    """Whole-epoch jitted scan with batch compute sharded across the mesh.

    A thin wrapper over :func:`train.loop.make_train_epoch` with a batch
    sharding constraint — so the data-parallel epoch has every capability of
    the single-device one (bf16 compute, per-step grad norms, host/scan
    impl). state: replicated; data: replicated (or sample-sharded); the
    per-step batch is constrained to ``P(axis)`` so XLA partitions
    forward/backward across chips and all-reduces gradients.
    """
    from fall_multimodal_tpu.train.loop import make_train_epoch

    return make_train_epoch(
        model, optimizer, label_smoothing, softmax_before_ce,
        compute_dtype=compute_dtype, grad_norms=grad_norms, impl=impl,
        batch_sharding=batch_sharded(mesh, axis),
    )


def make_parallel_eval_epoch(
    model,
    num_classes: int,
    mesh: Mesh,
    label_smoothing: float = 0.0,
    softmax_before_ce: bool = False,
    axis: str = DATA_AXIS,
):
    """Sharded eval epoch: per-batch forward partitioned across the mesh
    (confusion-matrix partial sums all-reduce over ICI)."""
    from fall_multimodal_tpu.train.loop import make_eval_epoch

    return make_eval_epoch(
        model, num_classes, label_smoothing, softmax_before_ce,
        batch_sharding=batch_sharded(mesh, axis),
    )


def make_parallel_train_step(
    model,
    optimizer,
    mesh: Mesh,
    label_smoothing: float = 0.0,
    softmax_before_ce: bool = False,
    axis: str = DATA_AXIS,
    compute_dtype=None,
):
    """Single pjit-ted train step with explicit in/out shardings (the unit
    the driver compile-checks multi-chip)."""
    step = make_train_step(
        model, optimizer, label_smoothing, softmax_before_ce, compute_dtype
    )
    repl = replicated(mesh)
    shard = batch_sharded(mesh, axis)

    return jax.jit(
        step,
        in_shardings=(repl, DeviceData(features=shard, labels=shard, sensors=shard)),
        out_shardings=(repl, repl),
    )
