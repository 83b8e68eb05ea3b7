"""Capture a jax.profiler trace of the serving scan; print top device ops.

Parses the xplane with jax.profiler.ProfileData and aggregates durations per
op — the attribution tool behind the round-2 kernel roofline work. Writes
the trace under /tmp/jax-trace-serving (cleared first so stale xplanes do
not pollute the aggregate).
"""
import os, shutil, sys, time, glob, collections
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

N = 16
yaw = jnp.linspace(-0.3, 0.3, N).reshape(-1, 1)
noise_bufs = model.bind(params).decoder.make_noise(jax.random.PRNGKey(7),
                                                   cfg.img_size)

def frame(carry, az):
    c = camera_from_angles(az, jnp.zeros((1,)), cfg.img_size,
                           fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius)
    out = model.apply(params, zs=zs, cam_poses=c.extrinsics,
                      focals=c.focal, near=c.near, far=c.far,
                      perturb=False, noise_bufs=noise_bufs,
                      fused_renderer=True, fused_decoder=True)
    return carry + out["rgb"].astype(jnp.float32).mean(), None

@jax.jit
def traj(yaw):
    c, _ = jax.lax.scan(frame, jnp.zeros(()), yaw)
    return c

float(traj(yaw))  # compile+warmup
t0 = time.perf_counter()
float(traj(yaw))
print(f"per-frame {1e3*(time.perf_counter()-t0)/N:.3f} ms", flush=True)

outdir = "/tmp/jax-trace-serving"
shutil.rmtree(outdir, ignore_errors=True)
jax.profiler.start_trace(outdir)
float(traj(yaw))
jax.profiler.stop_trace()

from jax.profiler import ProfileData

paths = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
print("xplanes:", paths, flush=True)
agg = collections.Counter()
tot = 0.0
for p in paths:
    pd = ProfileData.from_file(p)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print("plane:", plane.name)
        for line in plane.lines:
            lname = line.name or ""
            if "step" in lname.lower():
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name
                agg[name] += dur
                tot += dur
for name, ms in agg.most_common(40):
    print(f"{ms:9.3f} ms  {name[:110]}")
print(f"total accounted: {tot:.1f} ms over {N} frames", flush=True)
