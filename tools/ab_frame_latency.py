"""Interleaved A/B of SINGLE-FRAME serving latency: prepared split vs
full model.apply per dispatch.

The scan bench (tools/ab_serving.py) hides trajectory-invariant prep via
XLA loop-invariant code motion; an interactive app (apps/web.py sliders,
per-request serving) dispatches ONE frame per call, where the one-shot
path re-runs mapping MLPs + weight modulation + kron packs every call.
cips3dpp_tpu.serving.prepare_trajectory hoists those host-visibly.

Same-process interleaved rounds (shared-chip discipline, docs/STATUS.md).
"""
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cips3dpp_tpu.core import camera_from_angles
from cips3dpp_tpu.models.generator import Generator, preset_serving
from cips3dpp_tpu.serving import prepare_trajectory, render_frame

print("devices:", jax.devices(), flush=True)

cfg = preset_serving()
model = Generator(cfg)
cam = camera_from_angles(jnp.zeros((1,)), jnp.zeros((1,)), cfg.img_size,
                         fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius)
zs = (jax.random.normal(jax.random.PRNGKey(1), (1, cfg.mapping.z_dim)),
      jax.random.normal(jax.random.PRNGKey(2), (1, cfg.mapping.z_dim)))
params = jax.jit(lambda k: model.init(
    {"params": k, "perturb": k, "noise": k}, zs=zs,
    cam_poses=cam.extrinsics, focals=cam.focal, near=cam.near, far=cam.far,
))(jax.random.PRNGKey(0))
noise_bufs = model.bind(params).decoder.make_noise(jax.random.PRNGKey(7),
                                                   cfg.img_size)

prep = prepare_trajectory(model, params, zs, noise_bufs=noise_bufs)


@jax.jit
def frame_prepared(prep, az):
    out = render_frame(model, prep, az, jnp.zeros((1,)))
    return out["rgb"].astype(jnp.float32).mean()


@jax.jit
def frame_oneshot(params, az):
    c = camera_from_angles(az, jnp.zeros((1,)), cfg.img_size,
                           fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius)
    out = model.apply(params, zs=zs, cam_poses=c.extrinsics, focals=c.focal,
                      near=c.near, far=c.far, perturb=False,
                      fused_renderer=True, fused_decoder=True,
                      noise_bufs=noise_bufs)
    return out["rgb"].astype(jnp.float32).mean()


VARIANTS = [
    ("prepared", lambda az: frame_prepared(prep, az)),
    ("oneshot", lambda az: frame_oneshot(params, az)),
]

for name, fn in VARIANTS:
    t0 = time.perf_counter()
    float(fn(jnp.zeros((1,))))
    print(f"compiled {name} in {time.perf_counter()-t0:.0f}s", flush=True)

K = 50
results = {n: [] for n, _ in VARIANTS}
for rnd in range(4):
    for name, fn in VARIANTS:
        azs = np.linspace(-0.3, 0.3, K) + 1e-4 * rnd
        t0 = time.perf_counter()
        acc = 0.0
        for a in azs:  # sequential per-frame dispatch, each fetched
            acc += float(fn(jnp.full((1,), a)))
        dt = (time.perf_counter() - t0) / K * 1e3
        results[name].append(dt)
    print(f"round {rnd}: " + " ".join(
        f"{n}={results[n][-1]:.2f}ms" for n in results), flush=True)

for n, v in results.items():
    print(f"{n}: med {np.median(v):.3f} ms min {min(v):.3f} ms", flush=True)
