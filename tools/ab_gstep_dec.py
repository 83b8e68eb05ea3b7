"""Same-process interleaved A/B: decoder compute dtype fp32 vs bfloat16
inside the full training g_step (G fwd+bwd through SIREN + SR decoder +
both Ds at 1024^2, batch 4).

g_step is 0.318 s of the 0.854 s/iter round-3 record and has never had a
train-side dtype A/B (bf16 landed for the Ds only). The decoder's dtype
field is a compute dtype — params stay fp32, so both variants share one
state pytree; only activation traffic changes. Checksums will NOT match
(bf16 rounding); this is a perf A/B, quality gets judged separately.

Usage: python tools/ab_gstep_dec.py [iters_per_round]
"""
import dataclasses
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
base_cfg = preset_r1024()
cfg = TrainConfig(batch=4, remat_d=False, d_dtype="bfloat16",
                  fused_renderer_d=True, d_r1_chunk=2)
b, out_size = cfg.batch, base_cfg.out_size
d_decoder = DStyleGANProgressive(input_size=out_size)
d_render = DVolumeRenderProgressive(input_size=1024, viewpoint_loss=True)

key = jax.random.PRNGKey(0)
cam = camera_from_angles(jnp.zeros((b,)), jnp.zeros((b,)), base_cfg.img_size,
                         fov_ang=base_cfg.fov_ang,
                         dist_radius=base_cfg.dist_radius)
zs = (jnp.zeros((b, base_cfg.mapping.z_dim)),) * 2
generator0 = Generator(base_cfg)
g_shapes = jax.eval_shape(lambda: generator0.init(
    {"params": key, "perturb": key, "noise": key}, zs=zs,
    cam_poses=cam.extrinsics, focals=cam.focal, near=cam.near, far=cam.far))
d_shapes = jax.eval_shape(lambda: d_decoder.init(
    {"params": key, "diffaug": key}, jnp.zeros((b, out_size, out_size, 3))))
dr_shapes = jax.eval_shape(lambda: d_render.init(
    key, jnp.zeros((b, base_cfg.img_size, base_cfg.img_size, 3))))
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


alpha = jnp.ones(())
rngs = jax.random.split(jax.random.PRNGKey(42), 4096)

variants = {}
names = os.environ.get("AB_VARIANTS", "dec_fp32,dec_bf16").split(",")


def _variant_cfg(name):
    # dec_*: decoder compute dtype (round-5 dtype A/B).
    # rr_*: renderer SIREN-trunk remat on top of the shipped bf16 decoder
    #       (the g_step trace is copy-dominated by the trunk's fp32
    #       residuals; recompute is ~free at depth 2).
    if name in ("dec_fp32", "dec_bf16"):
        dt = {"dec_fp32": "float32", "dec_bf16": "bfloat16"}[name]
        return dataclasses.replace(
            base_cfg,
            decoder=dataclasses.replace(base_cfg.decoder, dtype=dt),
        )
    if name in ("rr_off", "rr_on"):
        cfg_i = dataclasses.replace(
            base_cfg,
            decoder=dataclasses.replace(base_cfg.decoder, dtype="bfloat16"),
        )
        return dataclasses.replace(
            cfg_i,
            renderer=dataclasses.replace(
                cfg_i.renderer, remat=(name == "rr_on")
            ),
        )
    if name in ("rd_fp32", "rd_bf16"):
        # Renderer SIREN storage dtype on top of the shipped bf16 decoder.
        # Serving already runs the SIREN with bf16 matmul inputs (phase math
        # fp32, models/siren.py FiLMSiren); training never A/B'd it. The
        # g_step trace (trace_gstep.log) is copy-dominated by the SIREN's
        # fp32 residuals (f32[4,4096,24,256] ~ 400 MB each) — bf16 storage
        # halves the matmul-input residual traffic and doubles the MXU rate
        # of every SIREN matmul, with no recompute (unlike rr_on, which
        # lost). The fp32 phase residual (for cos in backward) remains.
        cfg_i = dataclasses.replace(
            base_cfg,
            decoder=dataclasses.replace(base_cfg.decoder, dtype="bfloat16"),
        )
        return dataclasses.replace(
            cfg_i,
            renderer=dataclasses.replace(
                cfg_i.renderer,
                dtype={"rd_fp32": "float32", "rd_bf16": "bfloat16"}[name],
            ),
        )
    raise SystemExit(f"unknown variant {name}")


for name in names:
    gen_cfg = _variant_cfg(name)
    generator = Generator(gen_cfg)
    _, g_step, path_step, _ = make_train_steps(
        generator, d_decoder, d_render, gen_cfg, cfg,
        (tx_g, tx_d, tx_dr), donate=False,
    )
    t0 = time.perf_counter()
    st, _ = g_step(fresh_state(), rngs[0], alpha)
    chk = float(jax.tree.leaves(st.params_g)[0].ravel()[0])
    print(f"compiled {name} g_step in {time.perf_counter()-t0:.0f}s "
          f"chk={chk:.6f}", flush=True)
    variants[name] = (g_step, path_step)

results = {n: [] for n in variants}
path_results = {n: [] for n in variants}
ri = 1
for rnd in range(4):
    for n, (g_step, path_step) in variants.items():
        st = fresh_state()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st, _ = g_step(st, rngs[ri], alpha)
            ri += 1
        float(jax.tree.leaves(st.params_g)[0].ravel()[0])
        results[n].append((time.perf_counter() - t0) / ITERS)
        if rnd == 0:  # compile path_step once, time it in later rounds
            st, _ = path_step(st, rngs[ri]); ri += 1
            float(st.mean_path_length)
        else:
            t1 = time.perf_counter()
            for _ in range(max(ITERS // 2, 2)):
                st, _ = path_step(st, rngs[ri]); ri += 1
            float(st.mean_path_length)
            path_results[n].append(
                (time.perf_counter() - t1) / max(ITERS // 2, 2))
    print(f"round {rnd}: " + " ".join(
        f"{n}={results[n][-1]*1e3:.0f}ms" for n in results), flush=True)
for n, v in results.items():
    pv = path_results[n] or [float("nan")]
    print(f"{n}: g_step med {np.median(v)*1e3:.1f} ms min {min(v)*1e3:.1f} ms"
          f" | path_step med {np.median(pv)*1e3:.1f} ms", flush=True)
