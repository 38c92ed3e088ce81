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
        payload = {
            "state": state._asdict(),
            "epoch": np.asarray(epoch),
            "best_acc": np.asarray(best_acc),
        }
        self._ckpt.save(self._path(name), payload, force=True)

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
        payload = self._ckpt.restore(self._path(name), item=target)
        state = TrainState(**payload["state"])
        return state, int(payload["epoch"]), float(payload["best_acc"])

    def has(self, name: str) -> bool:
        return os.path.isdir(self._path(name))
