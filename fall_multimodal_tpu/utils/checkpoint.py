"""Orbax checkpointing of the TrainState pytree.

Capability of the reference's two artifacts (``main.py:323-341``):
``best`` (saved on validation improvement) and ``latest`` (full resumable
state: step/epoch/params/opt/batch_stats/rng/best_acc). Unlike the
reference, per-fold directories are first-class (fixing the shared
``best_model.pt`` path across CV folds, SURVEY.md section 3.2), and restore
never requires the output dir to survive a wipe.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import orbax.checkpoint as ocp

from fall_multimodal_tpu.train.state import TrainState


class Checkpointer:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _save(self, name: str, state: TrainState, epoch: int, best_acc: float):
        """Write-then-swap: ``force=True`` on the final path would delete
        the existing checkpoint BEFORE the new one commits, leaving a
        crash/OOM window with no resumable state. Save to a tmp name, move
        the old aside, swap, then drop the old; restore() falls back to the
        ``.prev`` copy if a crash lands inside the swap."""
        import shutil

        payload = {
            "state": state._asdict(),
            "epoch": np.asarray(epoch),
            "best_acc": np.asarray(best_acc),
        }
        final, tmp, prev = (
            self._path(name), self._path(f"{name}.tmp"), self._path(f"{name}.prev")
        )
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        self._ckpt.save(tmp, payload, force=True)
        if os.path.isdir(prev):
            shutil.rmtree(prev)
        if os.path.isdir(final):
            os.rename(final, prev)
        os.rename(tmp, final)
        if os.path.isdir(prev):
            shutil.rmtree(prev)

    def save_best(self, state: TrainState, epoch: int, best_acc: float) -> None:
        self._save("best", state, epoch, best_acc)

    def save_latest(self, state: TrainState, epoch: int, best_acc: float) -> None:
        self._save("latest", state, epoch, best_acc)

    def restore(
        self, name: str, template: TrainState
    ) -> Tuple[TrainState, int, float]:
        """Restore by name ("best" | "latest") against a template state (for
        dtypes/shapes/sharding)."""
        target = {
            "state": template._asdict(),
            "epoch": np.asarray(0),
            "best_acc": np.asarray(0.0),
        }
        path = self._path(name)
        if not os.path.isdir(path) and os.path.isdir(self._path(f"{name}.prev")):
            # a crash landed inside _save's swap — the moved-aside previous
            # checkpoint is the newest complete state
            path = self._path(f"{name}.prev")
        payload = self._ckpt.restore(path, item=target)
        state = TrainState(**payload["state"])
        return state, int(payload["epoch"]), float(payload["best_acc"])

    def has(self, name: str) -> bool:
        return os.path.isdir(self._path(name)) or os.path.isdir(
            self._path(f"{name}.prev")
        )
