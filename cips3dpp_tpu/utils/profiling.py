"""Profiling & benchmarking harness.

Behavioural contract: the reference's ad-hoc timing loops
(exp/tests/test_cips3dpp.py:634-751 rendering-time bench,
exp/stylesdf/scripts/rendering_time.py, gpu_memory.py) — upgraded to
first-class utilities: jax.profiler traces, honest on-device frame timing
(scan-carried checksum; see bench.py for why), and device-memory stats.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(outdir: str = "/tmp/jax-trace"):
    """Capture a profiler trace viewable in XProf/TensorBoard."""
    os.makedirs(outdir, exist_ok=True)
    jax.profiler.start_trace(outdir)
    try:
        yield outdir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict:
    """Peak/in-use HBM bytes (the reference's get_gpu_memory_GB probe)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats.get(k) for k in keys}


def time_scanned(fn, xs, reps: int = 3, warmup: bool = True):
    """Honest per-iteration timing of `fn` over scan inputs `xs`.

    fn(carry, x) -> (carry', None) must accumulate a checksum into the carry;
    the scalar carry is fetched to the host each rep, forcing completion
    (async runtimes can acknowledge un-fetched work early)."""

    @jax.jit
    def run(xs):
        c, _ = jax.lax.scan(fn, jnp.zeros(()), xs)
        return c

    n = jax.tree.leaves(xs)[0].shape[0]
    if warmup:
        float(np.asarray(run(xs)))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(np.asarray(run(xs)))
    dt = (time.perf_counter() - t0) / reps
    return dt / n, dt


def rendering_time(model, params, n_frames: int = 128, reps: int = 3,
                   batch: int = 1):
    """Reference rendering-time bench semantics (test_cips3dpp.py:634-751):
    repeated single-frame no-grad forwards of the flagship generator.
    Returns dict with fps / ms_per_frame / memory stats."""
    from ..core.camera import camera_from_angles

    cfg = model.cfg
    zs = (
        jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.mapping.z_dim)),
        jax.random.normal(jax.random.PRNGKey(2), (batch, cfg.mapping.z_dim)),
    )

    def frame(carry, inp):
        az, key = inp
        cam = camera_from_angles(
            az, jnp.zeros((batch,)), cfg.img_size,
            fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius,
        )
        k1, k2 = jax.random.split(key)
        out = model.apply(
            params, zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far, rngs={"perturb": k1, "noise": k2},
        )
        return carry + out["rgb"].astype(jnp.float32).mean(), None

    yaw = jnp.linspace(-0.3, 0.3, n_frames).reshape(-1, batch)
    keys = jax.random.split(jax.random.PRNGKey(3), n_frames)
    per_frame, total = time_scanned(frame, (yaw, keys), reps=reps)
    return {
        "ms_per_frame": per_frame * 1000,
        "fps": 1.0 / per_frame,
        "n_frames": n_frames,
        "memory": device_memory_stats(),
    }
