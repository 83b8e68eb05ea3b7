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

    def restore_raw(self, step: int | None = None):
        """Restore without a template (plain nested dict of arrays) — for
        loading checkpoints whose tree differs from the current model, e.g.
        a stage-1 renderer-only run consumed by graft_renderer."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mngr.restore(step, args=ocp.args.StandardRestore())

    def latest_step(self):
        return self._mngr.latest_step()

    def load_config(self):
        return load_snapshot(self.directory)

    def close(self):
        self._mngr.close()


def graft_renderer(dst_vars, src_vars):
    """Stage-1 -> stage-2 StyleSDF handoff (train_full_pipeline.py:484 +
    train_volume_renderer.py:494-511): copy the trained volume renderer and
    its mapping layers (`renderer`, `style_{i}`) from a stage-1
    (enable_decoder=False) checkpoint into a freshly initialised
    full-pipeline tree; the decoder and its mapping (`decoder`,
    `style_decoder_{i}`) keep their fresh init. Shape mismatches fail
    loudly — a silent partial graft would train from garbage."""
    import jax.numpy as jnp

    src, dst = src_vars["params"], dict(dst_vars["params"])
    if "renderer" not in src:
        raise ValueError(
            "source checkpoint has no 'renderer' subtree — not a generator "
            f"checkpoint? keys: {sorted(src)}"
        )
    grafted = []
    for k in src:
        is_render_mapping = k.startswith("style_") and not k.startswith(
            "style_decoder"
        )
        if k != "renderer" and not is_render_mapping:
            continue
        if k not in dst:
            raise ValueError(f"target tree is missing subtree '{k}'")
        src_shapes = jax.tree.map(jnp.shape, src[k])
        dst_shapes = jax.tree.map(jnp.shape, dst[k])
        if src_shapes != dst_shapes:
            raise ValueError(
                f"subtree '{k}' shape mismatch between stage-1 checkpoint "
                f"and target model: {src_shapes} vs {dst_shapes}"
            )
        # copy=True: grafting the same source into params_g AND params_g_ema
        # must not alias buffers (donated train steps reject duplicates)
        dst[k] = jax.tree.map(lambda x: jnp.array(x, copy=True), src[k])
        grafted.append(k)
    out = dict(dst_vars)
    out["params"] = dst
    return out


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
