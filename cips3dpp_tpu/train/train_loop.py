"""Training orchestration: the host loop around the jitted steps.

Behavioural contract: exp/cips3d/scripts/train_v10.py:805-1060 (train()) —
sphere-init warmup, fade-in alpha, D step + G step per iter, path reg every
g_reg_every, lazy R1 every d_reg_every, EMA after ema_start,
renderer_detach during warmup, periodic checkpoint + in-training FID with
best-FID tracking, resume. The reference's per-GPU DDP processes collapse
into one host loop over a data-parallel mesh (SURVEY.md §2c).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Iterable

import numpy as np
import jax
import jax.numpy as jnp

from .state import TrainConfig, create_train_state
from .steps import make_train_steps, ema_update, fade_alpha
from ..utils.logging import MetricLogger


@dataclasses.dataclass
class TrainHooks:
    """Optional callbacks so apps/tests can observe the loop."""

    on_metrics: Callable | None = None  # (step, dict) every log_every
    on_checkpoint: Callable | None = None  # (step, state)
    eval_fid: Callable | None = None  # (state) -> float | None


class Trainer:
    def __init__(
        self,
        generator,
        d_decoder,
        d_render,
        gen_cfg,
        train_cfg: TrainConfig,
        outdir: str,
        mesh=None,
        keep_ckpts: int = 3,
        log_every: int = 10,
        ckpt_every: int = 500,
        config_snapshot: dict | None = None,
        auto_remat: bool = False,
    ):
        self.generator = generator
        self.d_decoder = d_decoder
        self.d_render = d_render
        self.gen_cfg = gen_cfg
        self.cfg = train_cfg
        self.outdir = outdir
        self.mesh = mesh
        self.log_every = log_every
        self.ckpt_every = ckpt_every
        self.config_snapshot = config_snapshot
        self.auto_remat = auto_remat

        os.makedirs(outdir, exist_ok=True)
        self.logger = MetricLogger(os.path.join(outdir, "logs"))
        self._ckpt = None
        self._keep = keep_ckpts

    # ----- setup ----------------------------------------------------------

    def init_state(self, key, example_real_shape):
        c = self.gen_cfg
        from ..core.camera import sample_cameras

        cam = sample_cameras(jax.random.PRNGKey(0), 2, c.img_size)
        zs = (jnp.zeros((2, c.mapping.z_dim)), jnp.zeros((2, c.mapping.z_dim)))
        out_h = example_real_shape[1]

        def g_init(k):
            return self.generator.init(
                {"params": k, "perturb": k, "noise": k},
                zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
                near=cam.near, far=cam.far,
            )

        def d_init(k):
            return self.d_decoder.init(k, jnp.zeros((2, out_h, out_h, 3)))

        def dr_init(k):
            return self.d_render.init(k, jnp.zeros((2, c.img_size, c.img_size, 3)))

        state, txs = create_train_state(
            key, c, self.cfg, d_init, dr_init, g_init
        )
        if self.mesh is not None:
            from ..parallel import shard_pytree

            state = shard_pytree(self.mesh, state)
        self.steps = make_train_steps(
            self.generator, self.d_decoder, self.d_render, c, self.cfg, txs,
            mesh=self.mesh, donate=True,
        )
        if self.auto_remat and not self.cfg.remat_d:
            # The fastest known flagship config runs d_step_r1 at ~96% HBM
            # (BENCH_TRAIN_r03); probe XLA's AOT memory analysis against the
            # device limit BEFORE training and fall back to remat_d=True
            # when it won't fit — one compile up front instead of an OOM
            # mid-run. No-op where the backend reports no memory limit.
            limit = (
                jax.local_devices()[0].memory_stats() or {}
            ).get("bytes_limit")
            if limit:
                real = jnp.zeros(
                    (self.cfg.batch,) + tuple(example_real_shape[1:]),
                    jnp.float32,
                )
                ma = (
                    self.steps[0]
                    .lower(
                        state, real, jax.random.PRNGKey(0), jnp.ones(()),
                        d_regularize=True,
                    )
                    .compile()
                    .memory_analysis()
                )
                peak = ma.temp_size_in_bytes + ma.argument_size_in_bytes
                if peak > 0.97 * limit:
                    self.logger.log_text(
                        f"auto_remat: d_step_r1 peak {peak / 2**30:.2f} GiB "
                        f"> 97% of {limit / 2**30:.2f} GiB — enabling "
                        "remat_d"
                    )
                    self.cfg = dataclasses.replace(self.cfg, remat_d=True)
                    self.steps = make_train_steps(
                        self.generator, self.d_decoder, self.d_render, c,
                        self.cfg, txs, mesh=self.mesh, donate=True,
                    )
        return state

    def checkpointer(self):
        if self._ckpt is None:
            from ..io.checkpoint import CheckpointManager

            self._ckpt = CheckpointManager(
                os.path.join(self.outdir, "ckpt"), keep=self._keep
            )
        return self._ckpt

    # ----- phases ---------------------------------------------------------

    def sphere_init(self, state, key, n_iters=None, log_every=200):
        """SDF sphere-init phase (train_v10.py:850-875); saves G_sdf_init."""
        _, _, _, sphere_step = self.steps
        n = n_iters if n_iters is not None else self.cfg.init_iters
        for i in range(n):
            key, sub = jax.random.split(key)
            state, m = sphere_step(state, sub)
            if i % log_every == 0:
                self.logger.log_jsonl(i, m, name="sphere_init")
        return state

    def train(
        self,
        state,
        data: Iterable[np.ndarray],
        key,
        start_iter: int = 0,
        total_iters: int | None = None,
        hooks: TrainHooks | None = None,
        fade: bool = True,
        sphere_init_done: bool = True,
    ):
        """Main GAN loop (train_v10.py:892-1060)."""
        cfg = self.cfg
        hooks = hooks or TrainHooks()
        d_step, g_step, path_step, _ = self.steps
        total = total_iters if total_iters is not None else cfg.total_iters
        best_fid = np.inf
        t0 = time.time()

        # Input pipelining: batches are device_put ahead of the step that
        # consumes them (async DMA overlaps compute), sharded over the
        # data axis when on a mesh. Replaces the reference's synchronous
        # per-iter `.to(device)` (train_v10.py:905-918).
        from ..parallel.prefetch import prefetch_to_device

        sharding = None
        if self.mesh is not None:
            from ..parallel import data_sharding

            sharding = data_sharding(self.mesh)
        batches = prefetch_to_device(data, sharding)
        # Metrics stay on device until the NEXT log point: fetching them
        # immediately would block the host on the just-dispatched step and
        # drain the dispatch pipeline at sub-100ms step times.
        pending = None  # (idx, alpha, device-metric dict, dispatch time)

        def emit(p):
            p_idx, p_alpha, dev, p_time = p
            metrics = {
                k: float(v) for k, v in jax.device_get(dev).items()
            }
            metrics["alpha"] = p_alpha
            # rate as of when this log point was DISPATCHED, not when its
            # metrics were fetched one interval later (which would
            # systematically understate throughput)
            metrics["iters_per_sec"] = (p_idx + 1 - start_iter) / (
                p_time - t0
            )
            self.logger.log_jsonl(p_idx, metrics)
            self.logger.log(p_idx, metrics)  # per-metric txt (tl2 textlogger)
            if hooks.on_metrics:
                hooks.on_metrics(p_idx, metrics)

        for idx in range(start_iter, total):
            alpha = fade_alpha(idx, cfg.fade_steps, fade)
            # warmup: freeze decoder's view of renderer features
            renderer_detach = (
                True if (idx < cfg.warmup_iters and sphere_init_done) else None
            )

            real = next(batches)

            key, kd, kg, kp = jax.random.split(key, 4)
            d_regularize = (
                cfg.d_reg_every > 0 and (idx + 1) % cfg.d_reg_every == 0
            )
            state, dm = d_step(state, real, kd, alpha, d_regularize=d_regularize)
            state, gm = g_step(state, kg, alpha, renderer_detach=renderer_detach)

            g_regularize = cfg.g_reg_every > 0 and (idx + 1) % cfg.g_reg_every == 0
            if g_regularize:
                state, pm = path_step(state, kp)
            else:
                pm = {}

            decay = cfg.ema_decay if idx >= cfg.ema_start else 0.0
            state = ema_update(state, decay)

            if (idx + 1) % self.log_every == 0 or idx == total - 1:
                if pending is not None:
                    emit(pending)
                pending = (idx, alpha, {**dm, **gm, **pm}, time.time())

            if (idx + 1) % self.ckpt_every == 0:
                fid = hooks.eval_fid(state) if hooks.eval_fid else None
                metrics = {"fid": fid} if fid is not None else None
                self.checkpointer().save(
                    idx + 1, state, config=self.config_snapshot, metrics=metrics
                )
                if fid is not None and fid < best_fid:
                    best_fid = fid
                    from ..io.checkpoint import save_best

                    save_best(os.path.join(self.outdir, "ckpt"), state)
                if hooks.on_checkpoint:
                    hooks.on_checkpoint(idx, state)
                # loss-curve PNGs next to the logs (tl2's figure dumps)
                self.logger.save_figures()

        if pending is not None:
            emit(pending)
        self.logger.flush()
        return state

    def resume(self, state_template):
        """Restore the latest checkpoint if present (train_v10.py resume
        contract: launchers look for an existing ckpt dir)."""
        mgr = self.checkpointer()
        step = mgr.latest_step()
        if step is None:
            return None, 0
        return mgr.restore(state_template), step
