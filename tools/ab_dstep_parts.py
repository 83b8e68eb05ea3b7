"""Decompose d_step's 0.65 s: G-fwd (fake gen), image-D fwd+bwd,
pose-D fwd+bwd(+its every-step R1) — each timed alone, same process,
chained through its own output checksum (shared-chip discipline).

Usage: python tools/ab_dstep_parts.py [iters]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cips3dpp_tpu.models.generator import Generator, preset_r1024
from cips3dpp_tpu.models.discriminator import DStyleGANProgressive
from cips3dpp_tpu.models.discriminator_pose import DVolumeRenderProgressive
from cips3dpp_tpu.train.losses import d_logistic_loss, r1_penalty
from cips3dpp_tpu.core.camera import sample_cameras
from bench_train import fill_like

print("devices:", jax.devices(), flush=True)
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8

gen_cfg = preset_r1024()
b, out_size = 4, gen_cfg.out_size
generator = Generator(gen_cfg)
d_decoder = DStyleGANProgressive(input_size=out_size)
d_render = DVolumeRenderProgressive(input_size=1024, viewpoint_loss=True)

key = jax.random.PRNGKey(0)
zs = (jnp.zeros((b, gen_cfg.mapping.z_dim)),) * 2
cam = sample_cameras(jax.random.PRNGKey(1), batch=b,
                     img_size=gen_cfg.img_size)
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

alpha = jnp.ones(())
img = jnp.asarray(
    np.random.RandomState(7).uniform(-1, 1, (b, out_size, out_size, 3)),
    jnp.float32,
)
thumb = jnp.asarray(
    np.random.RandomState(8).uniform(
        -1, 1, (b, gen_cfg.img_size, gen_cfg.img_size, 3)
    ),
    jnp.float32,
)


@jax.jit
def g_fwd(c, rng):
    zs_ = (jax.random.normal(rng, (b, gen_cfg.mapping.z_dim)),) * 2
    k1, k2 = jax.random.split(rng)
    ret = generator.apply(
        params_g, zs=zs_, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far, fused_renderer=True,
        rngs={"perturb": k1, "noise": k2},
    )
    return c + ret["rgb"].astype(jnp.float32).mean()


@jax.jit
def dd_fwd_bwd(c, rng):
    x = img + 0.001 * c

    def loss(p):
        fake = d_decoder.apply(
            p, x.astype(jnp.bfloat16), alpha=alpha,
            rngs={"diffaug": rng},
        ).astype(jnp.float32)
        real = d_decoder.apply(
            p, (2.0 - x).astype(jnp.bfloat16), alpha=alpha,
            rngs={"diffaug": rng},
        ).astype(jnp.float32)
        return d_logistic_loss(real, fake)

    l, g = jax.value_and_grad(loss)(params_d)
    return c + l + jax.tree.leaves(g)[0].ravel()[0]


@jax.jit
def dr_fwd_bwd(c, rng):
    x = thumb + 0.001 * c

    def loss(p):
        fake, _ = d_render.apply(p, x, alpha=alpha)
        real, _ = d_render.apply(p, 2.0 - x, alpha=alpha)
        gan = d_logistic_loss(real, fake)
        r1 = 10.0 * 0.5 * r1_penalty(
            lambda y: d_render.apply(p, y, alpha=alpha)[0], 2.0 - x
        )
        return gan + r1

    l, g = jax.value_and_grad(loss)(params_dr)
    return c + l + jax.tree.leaves(g)[0].ravel()[0]


parts = {"g_fwd": g_fwd, "imageD_fwd_bwd": dd_fwd_bwd,
         "poseD_fwd_bwd_r1": dr_fwd_bwd}
rngs = jax.random.split(jax.random.PRNGKey(42), 4096)
for name, fn in parts.items():
    t0 = time.perf_counter()
    float(fn(jnp.zeros(()), rngs[0]))
    print(f"compiled {name} in {time.perf_counter()-t0:.0f}s", flush=True)

results = {n: [] for n in parts}
ri = 1
for rnd in range(4):
    for n, fn in parts.items():
        c = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(ITERS):
            c = fn(c, rngs[ri])
            ri += 1
        float(c)
        results[n].append((time.perf_counter() - t0) / ITERS)
    print(f"round {rnd}: " + " ".join(
        f"{n}={results[n][-1]*1e3:.0f}ms" for n in results), flush=True)
for n, v in results.items():
    print(f"{n}: med {np.median(v)*1e3:.1f} ms min {min(v)*1e3:.1f} ms",
          flush=True)
