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
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 46.93


def main():
    from cips3dpp_tpu.core import camera_from_angles
    from cips3dpp_tpu.models.generator import Generator, GeneratorConfig

    cfg = GeneratorConfig()
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

    @jax.jit
    def render_frame(params, z0, z1, azim, elev, rng):
        """One multi-view frame: camera built from angles on-device
        (render_video_web_v10.py:1806-1824 semantics, minus host video IO)."""
        cam = camera_from_angles(
            azim, elev, cfg.img_size, fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius
        )
        k1, k2 = jax.random.split(rng)
        out = model.apply(
            params,
            zs=(z0, z1),
            cam_poses=cam.extrinsics,
            focals=cam.focal,
            near=cam.near,
            far=cam.far,
            rngs={"perturb": k1, "noise": k2},
        )
        return out["rgb"]

    # warmup / compile
    rng = jax.random.PRNGKey(3)
    out = render_frame(params, zs[0], zs[1], azim, elev, rng)
    out.block_until_ready()

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    yaw = jnp.linspace(-0.3, 0.3, n_frames)
    t0 = time.perf_counter()
    for i in range(n_frames):
        rng, sub = jax.random.split(rng)
        out = render_frame(params, zs[0], zs[1], yaw[i : i + 1], elev, sub)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    fps = n_frames / dt
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
