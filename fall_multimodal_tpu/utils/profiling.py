"""Profiling / observability hooks.

Capability-plus over the reference's wall-clock ETA instrumentation
(``main.py:98,137-142``), per-parameter gradient-norm TensorBoard scalars
(``main.py:84-89``) and ``torchinfo.summary`` param introspection
(``Multimodal_Fall3/main.py:326-328``):

* :func:`trace` — context manager around ``jax.profiler`` traces;
* :class:`Throughput` — windows/sec (/chip) counter, the BASELINE metric;
* :func:`grad_norms` / :func:`global_norm` — on-device gradient telemetry;
* :func:`model_summary` — parameter table per module path;
* :func:`nan_debug` — context manager enabling ``jax_debug_nans`` (the
  rebuild's replacement for ``torch.autograd.set_detect_anomaly``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Running windows/sec counter with ETA (capability of the reference's
    ``cal_remaining_time`` loop instrumentation)."""

    def __init__(self, n_devices: int = 1):
        self.n_devices = n_devices
        self.reset()

    def reset(self) -> None:
        self._windows = 0
        self._start = time.perf_counter()
        self._laps = []

    def update(self, n_windows: int) -> None:
        self._windows += n_windows
        self._laps.append(time.perf_counter())

    @property
    def windows_per_sec(self) -> float:
        dt = time.perf_counter() - self._start
        return self._windows / dt if dt > 0 else 0.0

    @property
    def windows_per_sec_per_chip(self) -> float:
        return self.windows_per_sec / max(self.n_devices, 1)

    def eta_seconds(self, remaining_steps: int) -> float:
        if len(self._laps) < 2:
            return float("inf")
        per_step = (self._laps[-1] - self._start) / len(self._laps)
        return per_step * remaining_steps


def global_norm(tree: Any) -> jnp.ndarray:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree))
    )


def tree_path_str(path) -> str:
    """Dotted name of a tree_flatten_with_path key path — the one shared
    formatter (grad_norms / model_summary / state.param_count once carried
    three hand-rolled copies, one missing the str() wrap for non-string
    keys like int DictKeys)."""
    return ".".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def grad_norms(grads: Any) -> Dict[str, jnp.ndarray]:
    """Per-parameter L2 norms keyed by dotted path (the reference logged one
    TB scalar per parameter each optimizer step, ``main.py:84-89``)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for path, leaf in flat:
        out[tree_path_str(path)] = jnp.linalg.norm(leaf.ravel())
    return out


def model_summary(params: Any) -> str:
    """Parameter table: path, shape, count (torchinfo.summary capability)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lines = [f"{'path':<64}{'shape':<20}{'params':>12}"]
    total = 0
    for path, leaf in flat:
        name = tree_path_str(path)
        n = int(leaf.size)
        total += n
        lines.append(f"{name:<64}{str(leaf.shape):<20}{n:>12,}")
    lines.append(f"{'TOTAL':<84}{total:>12,}")
    return "\n".join(lines)


@contextlib.contextmanager
def nan_debug(enable: bool = True) -> Iterator[None]:
    """Raise on the first NaN produced inside jitted code."""
    prev = bool(jax.config.jax_debug_nans)
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
