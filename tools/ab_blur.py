"""Same-process interleaved A/B: separable shift-add blur vs depthwise-conv
blur inside the full training d_step (the blur-heaviest program: image D
fwd+bwd at 1024^2 + fake-image G fwd).

The shared axon chip drifts across processes (docs/STATUS.md bench policy),
so the ops.upfirdn2d.SEPARABLE_BLUR trace-time switch is flipped between
jits and both variants run interleaved in one process. Checksums must
match (the separable form is exact-arithmetic-equal; only fp reassociation
differs).

Usage: python tools/ab_blur.py [iters_per_round]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cips3dpp_tpu.ops import upfirdn2d as ufd
import cips3dpp_tpu.models.layers as layers_mod
from cips3dpp_tpu.models.generator import Generator, preset_r1024
from cips3dpp_tpu.models.discriminator import DStyleGANProgressive
from cips3dpp_tpu.models.discriminator_pose import DVolumeRenderProgressive
from cips3dpp_tpu.train.state import (
    TrainConfig,
    TrainState,
    make_g_optimizer,
    make_d_optimizer,
    make_d_render_optimizer,
)
from cips3dpp_tpu.train.steps import make_train_steps
from cips3dpp_tpu.core.camera import camera_from_angles
from bench_train import fill_like

print("devices:", jax.devices(), flush=True)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
gen_cfg = preset_r1024()
cfg = TrainConfig(batch=4, remat_d=False, d_dtype="bfloat16",
                  fused_renderer_d=True, d_r1_chunk=2)
b, out_size = cfg.batch, gen_cfg.out_size
generator = Generator(gen_cfg)
d_decoder = DStyleGANProgressive(input_size=out_size)
d_render = DVolumeRenderProgressive(input_size=1024, viewpoint_loss=True)

key = jax.random.PRNGKey(0)
cam = camera_from_angles(jnp.zeros((b,)), jnp.zeros((b,)), gen_cfg.img_size,
                         fov_ang=gen_cfg.fov_ang,
                         dist_radius=gen_cfg.dist_radius)
zs = (jnp.zeros((b, gen_cfg.mapping.z_dim)),) * 2
g_shapes = jax.eval_shape(lambda: generator.init(
    {"params": key, "perturb": key, "noise": key}, zs=zs,
    cam_poses=cam.extrinsics, focals=cam.focal, near=cam.near, far=cam.far))
d_shapes = jax.eval_shape(lambda: d_decoder.init(
    {"params": key, "diffaug": key}, jnp.zeros((b, out_size, out_size, 3))))
dr_shapes = jax.eval_shape(lambda: d_render.init(
    key, jnp.zeros((b, gen_cfg.img_size, gen_cfg.img_size, 3))))
params_g = fill_like(g_shapes, seed=1)
params_d = fill_like(d_shapes, seed=2)
params_dr = fill_like(dr_shapes, seed=3)
tx_g = make_g_optimizer(cfg, params_g)
tx_d = make_d_optimizer(cfg)
tx_dr = make_d_render_optimizer(cfg)


def fresh_state():
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        params_d_render=params_dr,
        params_g_ema=jax.tree.map(lambda x: x.copy(), params_g),
        opt_g=tx_g.init(params_g),
        opt_d=tx_d.init(params_d),
        opt_d_render=tx_dr.init(params_dr),
        mean_path_length=jnp.zeros(()),
    )


real = jnp.asarray(
    np.random.RandomState(7).uniform(-1, 1, (b, out_size, out_size, 3)),
    jnp.float32,
)
alpha = jnp.ones(())
rngs = jax.random.split(jax.random.PRNGKey(42), 4096)

# (SEPARABLE_BLUR, FUSE_DOWN_CONV) per variant
FLAG_SETS = {"fuse_down": (False, True), "depthwise": (False, False),
             "separable": (True, False)}
names = os.environ.get("AB_VARIANTS", "fuse_down,depthwise").split(",")


def _is_oom(e):
    s = str(e)
    return ("RESOURCE_EXHAUSTED" in s or "Ran out of memory" in s
            or "Out of memory" in s)


def run_ab(run_cfg):
    variants = {}
    for name in names:
        sep, fuse = FLAG_SETS[name]
        ufd.SEPARABLE_BLUR = sep
        layers_mod.FUSE_DOWN_CONV = fuse
        # donate=False: both variants share the same immutable state pytrees
        d_step, _, _, _ = make_train_steps(
            generator, d_decoder, d_render, gen_cfg, run_cfg,
            (tx_g, tx_d, tx_dr), donate=False,
        )
        t0 = time.perf_counter()
        st, _ = d_step(fresh_state(), real, rngs[0], alpha, False)
        chk = float(jax.tree.leaves(st.params_d)[0].ravel()[0])
        print(f"compiled {name} in {time.perf_counter()-t0:.0f}s "
              f"chk={chk:.6f}", flush=True)
        variants[name] = d_step

    results = {n: [] for n in variants}
    ri = 1
    for rnd in range(4):
        for n, step in variants.items():
            st = fresh_state()
            t0 = time.perf_counter()
            for _ in range(ITERS):
                st, _ = step(st, real, rngs[ri], alpha, False)
                ri += 1
            float(jax.tree.leaves(st.params_d)[0].ravel()[0])
            results[n].append((time.perf_counter() - t0) / ITERS)
        print(f"round {rnd}: " + " ".join(
            f"{n}={results[n][-1]*1e3:.0f}ms" for n in results), flush=True)
    for n, v in results.items():
        print(f"{n}: med {np.median(v)*1e3:.1f} ms min {min(v)*1e3:.1f} ms"
              f" (remat_d={run_cfg.remat_d})", flush=True)


try:
    run_ab(cfg)
except Exception as e:  # noqa: BLE001 — OOM-specific fallback below
    if not _is_oom(e) or cfg.remat_d:
        raise
    # Round-4 lesson: the fuse_down variant + a second resident executable
    # tips the ~96%-HBM no-remat config over. Retry both variants under
    # remat_d=True — the A/B is relative, so the comparison stays valid.
    import dataclasses
    print("# OOM with remat_d=False — retrying the full A/B with "
          "remat_d=True", flush=True)
    run_ab(dataclasses.replace(cfg, remat_d=True))
