"""Checkpoint / resume via orbax.

Behavioural contract (SURVEY.md §5, train_v10.py:496-522): the reference
saves per-model state dicts (G, D, D_render, G_ema, {iter, best_fid}), keeps
a rotation, writes a per-rank `resume` dir mid-eval, and snapshots the full
config next to the weights. Here one orbax checkpoint holds the whole
TrainState pytree (params + optimizer state + EMA + counters) plus the
config snapshot, with `keep` rotation and a `best_fid` slot.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import orbax.checkpoint as ocp

from .config import save_snapshot, load_snapshot


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, step: int, state, config: Mapping | None = None, metrics=None):
        self._mngr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics=dict(metrics or {}),
        )
        self._mngr.wait_until_finished()
        if config is not None:
            save_snapshot(config, self.directory)

    def restore(self, state_template, step: int | None = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mngr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self):
        return self._mngr.latest_step()

    def load_config(self):
        return load_snapshot(self.directory)

    def close(self):
        self._mngr.close()


def save_best(directory: str, state, tag: str = "best_fid"):
    """Separate best-FID slot (train_v10.py:1034-1045)."""
    path = os.path.join(os.path.abspath(directory), tag)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_best(directory: str, state_template, tag: str = "best_fid"):
    path = os.path.join(os.path.abspath(directory), tag)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, state_template)
