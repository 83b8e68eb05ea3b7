"""Interleaved same-process A/B of serving decoder variants.

The shared axon chip drifts up to ~3x across processes, so ONLY same-process
interleaved comparisons are meaningful (docs/STATUS.md bench policy). Rounds
interleave variants so contention shows as within-variant spread. The flax
variant doubles as the drift control.

Usage: python tools/ab_serving.py
"""
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cips3dpp_tpu.core import camera_from_angles
from cips3dpp_tpu.models.generator import Generator, preset_serving

print("devices:", jax.devices(), flush=True)

cfg = preset_serving()
model = Generator(cfg)
key = jax.random.PRNGKey(0)
cam = camera_from_angles(jnp.zeros((1,)), jnp.zeros((1,)), cfg.img_size,
                         fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius)
zs = (jax.random.normal(jax.random.PRNGKey(1), (1, cfg.mapping.z_dim)),
      jax.random.normal(jax.random.PRNGKey(2), (1, cfg.mapping.z_dim)))
params = jax.jit(lambda k: model.init(
    {"params": k, "perturb": k, "noise": k}, zs=zs,
    cam_poses=cam.extrinsics, focals=cam.focal, near=cam.near, far=cam.far,
))(key)
noise_bufs = model.bind(params).decoder.make_noise(jax.random.PRNGKey(7),
                                                   cfg.img_size)

N = 64
yaw = jnp.linspace(-0.3, 0.3, N).reshape(-1, 1)


def make_traj(fused_dec, noise_kw, mdl=None, fused_ren=True):
    mdl = model if mdl is None else mdl

    def frame(carry, az):
        c = camera_from_angles(az, jnp.zeros((1,)), cfg.img_size,
                               fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius)
        out = mdl.apply(params, zs=zs, cam_poses=c.extrinsics,
                        focals=c.focal, near=c.near, far=c.far,
                        perturb=False, fused_renderer=fused_ren,
                        fused_decoder=fused_dec, **noise_kw)
        return carry + out["rgb"].astype(jnp.float32).mean(), None

    @jax.jit
    def traj(yaw):
        c, _ = jax.lax.scan(frame, jnp.zeros(()), yaw)
        return c

    return traj


def make_traj_prep_split(fold_rgb=False, frames_per_step=1, fold_noise=False):
    """serving.prepare_trajectory once + render_trajectory_scan: all
    style/weight/noise prep hoisted OUT of the scan body (vs relying on
    XLA loop-invariant code motion in the model.apply variants).
    frames_per_step>1 = frame-batched kernel launches."""
    from cips3dpp_tpu.serving import prepare_trajectory, render_trajectory_scan

    prep = prepare_trajectory(model, params, zs, noise_bufs=noise_bufs,
                              fold_rgb=fold_rgb, fold_noise=fold_noise)

    @jax.jit
    def traj(yaw):
        return render_trajectory_scan(model, prep, yaw[:, 0],
                                      fold_rgb=fold_rgb,
                                      fold_noise=fold_noise,
                                      frames_per_step=frames_per_step)

    return traj


VARIANTS = [
    ("flax", False, {"noise_bufs": noise_bufs}),
    ("fused_bufs", True, {"noise_bufs": noise_bufs}),
    ("fused_hash", True, {"noise_seed": 7}),
    ("prep_split", None, None),
    ("fold_rgb", None, None),
    ("frames2", None, None),
    ("frames4", None, None),
    ("frames8", None, None),
    ("sin7", None, None),  # fold_rgb graph traced with SIN_DEGREE=7
    # KERNEL_NOTES headroom #1: full up+noise+bias fold into the colup
    # matmuls (K = 2L+P+1). fold_noise-only (K = 2L+P) was the measured
    # dead-end #6; this adds the bias lane on top.
    ("fold_bias", None, None),
    # fp32 pure-XLA path (no Pallas, fp32 compute dtypes, same params) —
    # refreshes the round-2-era 9.2 ms/frame figure as an interleaved
    # ratio vs the fused bf16 default (docs/STATUS.md r2 row).
    ("xla_fp32", None, None),
]
_sel = os.environ.get("AB_VARIANTS")
if _sel:
    keep = set(_sel.split(","))
    VARIANTS = [v for v in VARIANTS if v[0] in keep]

trajs = {}
for name, fd, kw in VARIANTS:
    t0 = time.perf_counter()
    if name == "prep_split":
        tr = make_traj_prep_split()
    elif name == "fold_rgb":
        tr = make_traj_prep_split(fold_rgb=True)
    elif name == "sin7":
        import cips3dpp_tpu.kernels.siren_render as _sr

        _sr.SIN_DEGREE = 7
        try:
            tr = make_traj_prep_split(fold_rgb=True)
            float(tr(yaw))  # force trace while the flag is set
        finally:
            _sr.SIN_DEGREE = 9
    elif name == "fold_bias":
        tr = make_traj_prep_split(fold_rgb=True, fold_noise="bias")
    elif name == "xla_fp32":
        from cips3dpp_tpu.models.generator import preset_r1024

        # dtype fields are compute dtypes — param trees are identical, so
        # the serving params drive the fp32 graph directly.
        tr = make_traj(False, {"noise_bufs": noise_bufs},
                       mdl=Generator(preset_r1024()), fused_ren=False)
    elif name.startswith("frames"):
        tr = make_traj_prep_split(fold_rgb=True,
                                  frames_per_step=int(name[len("frames"):]))
    else:
        tr = make_traj(fd, kw)
    float(tr(yaw))
    print(f"compiled {name} in {time.perf_counter()-t0:.0f}s", flush=True)
    trajs[name] = tr

results = {n: [] for n, _, _ in VARIANTS}
for rnd in range(4):
    for name, _, _ in VARIANTS:
        t0 = time.perf_counter()
        float(trajs[name](yaw))
        dt = (time.perf_counter() - t0) / N * 1e3
        results[name].append(dt)
    print(f"round {rnd}: " + " ".join(
        f"{n}={results[n][-1]:.2f}ms" for n in results), flush=True)

for n, v in results.items():
    print(f"{n}: med {np.median(v):.3f} ms min {min(v):.3f} ms", flush=True)
