"""Checkpointing (orbax).

The reference only ever saves ``model.state_dict()`` on val improvement as
``seed_{s}_checkpoint{e}.ckpt`` + ``seed_{s}_best.ckpt`` and never saves the
optimizer — no mid-training resume exists (train_proposed_depth.py:237-249,
SURVEY.md §5.4).  Here the full TrainState (params + BN stats + optimizer +
step) is saved, so resume is exact; the directory layout mirrors the
reference naming so tooling that expects it keeps working.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from r3d_tpu.train.state import TrainState


class Checkpointer:
    def __init__(self, save_dir: str):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.save_dir, name)

    def save_best(self, state: TrainState, seed: int, epoch: int) -> None:
        self._ckptr.save(
            self._path(f"seed_{seed}_checkpoint{epoch}"), state, force=True
        )
        self._ckptr.save(self._path(f"seed_{seed}_best"), state, force=True)
        self._ckptr.wait_until_finished()

    def save_last(self, state: TrainState, seed: int) -> None:
        """Rolling full-state checkpoint enabling exact mid-training resume
        (the reference never saves optimizer state — SURVEY.md §5.4)."""
        self._ckptr.save(self._path(f"seed_{seed}_last"), state, force=True)
        self._ckptr.wait_until_finished()

    def restore_last(self, seed: int, template: TrainState) -> TrainState:
        return self.restore(f"seed_{seed}_last", template)

    def restore(self, name: str, template: TrainState) -> TrainState:
        return self._ckptr.restore(self._path(name), template)

    def restore_best(self, seed: int, template: TrainState) -> TrainState:
        return self.restore(f"seed_{seed}_best", template)

    def has(self, name: str) -> bool:
        return os.path.isdir(self._path(name))
