"""Headline benchmark: r1024 multi-view rendering throughput on one chip.

Mirrors the reference's test__rendering_time (exp/tests/test_cips3dpp.py:
634-751): flagship FFHQ r1024 generator (2-layer SIREN renderer, 64^2 rays x
24 samples, CIPS decoder to 1024^2), batch 1, repeated single-frame forwards
with no grad. Baseline: 46.93 fps on the repo-era GPU (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/46.93}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_FPS = 46.93


def _fail_json(reason: str):
    """Emit ONE parsable JSON line instead of a traceback, and exit 0 so the
    driver records a diagnostic artifact rather than an opaque rc=1
    (BENCH_r03 lesson: a transient axon-tunnel outage must not erase the
    round's number of record)."""
    print(
        json.dumps(
            {
                "metric": "r1024_multiview_render_throughput",
                "value": 0.0,
                "unit": "fps",
                "vs_baseline": 0.0,
                "error": reason,
            }
        )
    )
    sys.exit(0)


def _probe_backend_ready(budget_s: float = 900.0) -> bool:
    """Probe the (possibly tunneled) TPU backend in a SUBPROCESS with a
    bounded sleep-retry loop. The axon tunnel's known failure mode is a
    silent multi-minute hang inside backend init followed by UNAVAILABLE;
    it recovers on its own, so retrying is the right move — but only a
    subprocess probe can be timed out (backend init is not interruptible
    in-process)."""
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=min(180, max(30, deadline - time.monotonic())),
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        sleep = min(30.0 * attempt, 120.0, remaining)
        print(
            f"[bench] backend probe attempt {attempt} failed; "
            f"retrying in {sleep:.0f}s ({remaining:.0f}s budget left)",
            file=sys.stderr,
        )
        time.sleep(sleep)


def main():
    if not _probe_backend_ready():
        _fail_json("tpu_unavailable")

    import jax
    import jax.numpy as jnp

    try:
        _run(jax, jnp)
    except Exception as e:  # noqa: BLE001 — diagnose, retry once, or report
        msg = f"{type(e).__name__}: {e}"
        transient = "UNAVAILABLE" in msg or "DEADLINE_EXCEEDED" in msg
        if transient and os.environ.get("CIPS3DPP_BENCH_RETRIED") != "1":
            # the backend died mid-run (tunnel blip); a fresh process gets a
            # fresh backend — re-exec exactly once
            print(f"[bench] transient backend error, re-exec: {msg}",
                  file=sys.stderr)
            env = dict(os.environ, CIPS3DPP_BENCH_RETRIED="1")
            r = subprocess.run([sys.executable] + sys.argv, env=env)
            sys.exit(r.returncode)
        _fail_json("tpu_unavailable" if transient else msg[:300])


def _run(jax, jnp):
    from cips3dpp_tpu.core import camera_from_angles
    from cips3dpp_tpu.models.generator import (
        Generator,
        GeneratorConfig,
        preset_serving,
    )

    fp32 = "--fp32" in sys.argv
    # serving config: bf16 decoder compute + Pallas fused SIREN renderer
    cfg = GeneratorConfig() if fp32 else preset_serving()
    fused = not fp32
    model = Generator(cfg)
    key = jax.random.PRNGKey(0)

    batch = 1
    azim = jnp.zeros((batch,))
    elev = jnp.zeros((batch,))
    cam = camera_from_angles(
        azim, elev, cfg.img_size, fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius
    )
    zs = (
        jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.mapping.z_dim)),
        jax.random.normal(jax.random.PRNGKey(2), (batch, cfg.mapping.z_dim)),
    )

    params = jax.jit(
        lambda k: model.init(
            {"params": k, "perturb": k, "noise": k},
            zs=zs,
            cam_poses=cam.extrinsics,
            focals=cam.focal,
            near=cam.near,
            far=cam.far,
        )
    )(key)

    # Noise is FIXED per trajectory and ray perturbation is off — exactly
    # the reference's multi-view app semantics (render_video_web_v10.py:
    # 1792-1794 create_noise_bufs per video; :1726 nerf_cfg.perturb=False).
    # (An in-kernel hash-noise mode exists but measured slower than bf16
    # buffers on v5e — see kernels/decoder_block.py.)
    noise_kw = {
        "noise_bufs": model.bind(params).decoder.make_noise(
            jax.random.PRNGKey(7), cfg.img_size
        )
    }

    def render_frame(params, z0, z1, azim, elev):
        """One multi-view frame, batch 1, N_samples 24 — the reference's
        rendering-time semantics (render_video_web_v10.py:1806-1824)."""
        cam = camera_from_angles(
            azim, elev, cfg.img_size, fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius
        )
        out = model.apply(
            params,
            zs=(z0, z1),
            cam_poses=cam.extrinsics,
            focals=cam.focal,
            near=cam.near,
            far=cam.far,
            perturb=False,
            fused_renderer=fused,
            fused_decoder=fused,
            **noise_kw,
        )
        return out["rgb"]

    # TPU-idiomatic trajectory rendering: scan all frames inside ONE XLA
    # program — zero host dispatch between frames, batch stays 1 per frame.
    # Measurement hygiene: the scan carries a checksum accumulated across
    # every frame's pixels and the host fetches that scalar — this forces
    # sequential execution of all frames and defeats any lazy/caching
    # completion acks in remote-device setups; timing was validated linear
    # in n_frames (8.4-9.2 ms/frame across 16/64/256-frame scans).
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 128

    if fused:
        # prepare-once serving split (cips3dpp_tpu.serving): mapping MLPs,
        # style-modulated weights, kron expansions and noise casts are
        # computed ONCE per trajectory (the reference app's get_ws-once
        # semantics, render_video_web_v10.py:1695-1824) and the scan body
        # renders from the prep. Measured perf-neutral vs scanning
        # model.apply (XLA LICM already hoists the invariant prep), but
        # this exercises the shipped serving surface end-to-end.
        from cips3dpp_tpu.serving import prepare_trajectory, render_trajectory_scan

        prep = prepare_trajectory(
            model, params, zs, noise_bufs=noise_kw["noise_bufs"]
        )

        @jax.jit
        def render_traj(prep, azims):
            return render_trajectory_scan(model, prep, azims[:, 0])

        traj_args = (prep,)
    else:

        @jax.jit
        def render_traj(params, z0, z1, azims):
            def body(carry, az):
                rgb = render_frame(params, z0, z1, az, jnp.zeros((1,)))
                return carry + rgb.astype(jnp.float32).mean(), None

            checksum, _ = jax.lax.scan(body, jnp.zeros(()), azims)
            return checksum

        traj_args = (params, zs[0], zs[1])

    yaw = jnp.linspace(-0.3, 0.3, n_frames).reshape(-1, 1)

    # warmup/compile
    float(render_traj(*traj_args, yaw))

    # best-of-reps: the chip is SHARED and tenant contention inflates a
    # whole rep by up to ~10x (measured 2.5 vs 29.5 ms/frame minutes
    # apart for the identical program); each rep already averages over
    # n_frames scanned frames, so the minimum is the least-interfered
    # estimate of the program's own throughput.
    reps = 5
    best = float("inf")
    for r in range(reps):
        yaw_r = yaw + 1e-4 * r  # distinct host input per rep, same traced fn
        t0 = time.perf_counter()
        float(render_traj(*traj_args, yaw_r))
        best = min(best, time.perf_counter() - t0)

    fps = n_frames / best
    print(
        json.dumps(
            {
                "metric": "r1024_multiview_render_throughput",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
