"""Same-process interleaved A/B over d_step variants at the flagship
config (bf16 Ds, bf16-compute decoder, r1_chunk=2).

d_step dominates the amortized iter and its trace
(docs/r5_logs/trace_dstep.log) is dominated by XLA compression-remat and
layout copies — an HBM-pressure signature. Variants probe memory levers:

  base    fused two-pass decoder-D, no remat, batch 4
  d_seq   sequential fake/real grad accumulation (exact split of the
          separable logistic loss; tests/test_train.py::
          test_d_seq_matches_fused), batch 4 — settled -5.9% vs base
  remat4  d_seq + remat_d at batch 4 (does rematerialising the decoder-D
          passes relieve the compression-remat copies enough to win?)
  b8      d_seq + remat_d at batch 8 (same-process confirmation of the
          separate-run +57% img/s claim, docs/STATUS.md)

All variants share ONE donated TrainState (params/opt are
batch-independent), threaded through every timing leg.

Times the plain d_step (d_regularize=False, 14/15 of iters); the lazy-R1
legs are gated behind AB_R1=1 (they double resident executables).

Usage: python tools/ab_dstep.py [iters_per_round]
Env: AB_VARIANTS=base,d_seq (default)
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
b, out_size = 4, base_cfg.out_size
d_decoder = DStyleGANProgressive(input_size=out_size)
d_render = DVolumeRenderProgressive(input_size=1024, viewpoint_loss=True)

key = jax.random.PRNGKey(0)
cam = camera_from_angles(jnp.zeros((b,)), jnp.zeros((b,)), base_cfg.img_size,
                         fov_ang=base_cfg.fov_ang,
                         dist_radius=base_cfg.dist_radius)
zs = (jnp.zeros((b, base_cfg.mapping.z_dim)),) * 2
generator = Generator(base_cfg)
g_shapes = jax.eval_shape(lambda: generator.init(
    {"params": key, "perturb": key, "noise": key}, zs=zs,
    cam_poses=cam.extrinsics, focals=cam.focal, near=cam.near, far=cam.far))
d_shapes = jax.eval_shape(lambda: d_decoder.init(
    {"params": key, "diffaug": key}, jnp.zeros((b, out_size, out_size, 3))))
dr_shapes = jax.eval_shape(lambda: d_render.init(
    key, jnp.zeros((b, base_cfg.img_size, base_cfg.img_size, 3))))
params_g = fill_like(g_shapes, seed=1)
params_d = fill_like(d_shapes, seed=2)
params_dr = fill_like(dr_shapes, seed=3)


def fresh_state(cfg):
    tx_g = make_g_optimizer(cfg, params_g)
    tx_d = make_d_optimizer(cfg)
    tx_dr = make_d_render_optimizer(cfg)
    state = TrainState(
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
    return state, (tx_g, tx_d, tx_dr)


alpha = jnp.ones(())
rngs = jax.random.split(jax.random.PRNGKey(42), 4096)
_reals = {}


def real_for(batch):
    if batch not in _reals:
        _reals[batch] = jnp.asarray(
            np.random.RandomState(7)
            .uniform(-1, 1, (batch, out_size, out_size, 3))
            .astype(np.float32))
    return _reals[batch]

FLAGS = {
    "base": dict(d_seq=False),
    "d_seq": dict(d_seq=True),
    "remat4": dict(d_seq=True, remat_d=True),
    "b8": dict(d_seq=True, remat_d=True, batch=8),
    "b8nr": dict(d_seq=True, remat_d=False, batch=8),
    "d_cat": dict(d_cat=True),
    "b8cat": dict(d_cat=True, remat_d=False, batch=8),
    # lazy-R1 chunk size under d_cat (AB_R1=1 to time the r1 legs):
    # chunk=2 runs batch-2 grad-of-grad passes (double tile padding),
    # chunk=4 runs ONE full-batch pass (more HBM, fewer passes)
    "dcat_r1c2": dict(d_cat=True, d_r1_chunk=2),
    "dcat_r1c4": dict(d_cat=True, d_r1_chunk=4),
}
names = os.environ.get("AB_VARIANTS", "base,d_seq").split(",")
# The lazy-R1 legs double the resident-executable count; at the flagship
# no-remat config the first A/B attempt OOM'd the 15.75G HBM (two full
# TrainStates + 4 executables). Default them off — d_step is 14/15 of
# iters and is the number in dispute. AB_R1=1 opts back in.
TIME_R1 = os.environ.get("AB_R1", "0") == "1"

# ONE TrainState, DONATED and threaded through every timing leg: without
# donation the step holds input+output state copies (2x params+opt+EMA)
# and OOM'd the shared 15.75G chip even for a single variant (attempt 2);
# two resident states + the R1 executables OOM'd attempt 1. Both variants
# evolve the same state alternately — values differ from a fixed start but
# shapes/work are identical, which is all timing sees. Exactness of d_seq
# is proven separately (tests/test_train.py::test_d_seq_matches_fused;
# attempt 1's like-for-like on-chip checksums matched to the last digit).
state0, txs = fresh_state(
    TrainConfig(batch=b, remat_d=False, d_dtype="bfloat16",
                fused_renderer_d=True, d_r1_chunk=2))

variants = {}
batches = {}
st = state0
for name in names:
    kw = dict(batch=b, remat_d=False, d_dtype="bfloat16",
              fused_renderer_d=True, d_r1_chunk=2)
    kw.update(FLAGS[name])
    cfg = TrainConfig(**kw)
    batches[name] = cfg.batch
    d_step = make_train_steps(
        generator, d_decoder, d_render, base_cfg, cfg, txs, donate=True
    )[0]
    t0 = time.perf_counter()
    st, _ = d_step(st, real_for(cfg.batch), rngs[0], alpha,
                   d_regularize=False)
    chk = float(jax.tree.leaves(st.params_d)[0].ravel()[0])
    print(f"compiled {name} d_step in {time.perf_counter()-t0:.0f}s "
          f"chk={chk:.6f}", flush=True)
    variants[name] = d_step

results = {n: [] for n in variants}
r1_results = {n: [] for n in variants}
ri = 1
for rnd in range(4):
    for n, d_step in variants.items():
        real = real_for(batches[n])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st, _ = d_step(st, real, rngs[ri], alpha, d_regularize=False)
            ri += 1
        float(jax.tree.leaves(st.params_d)[0].ravel()[0])
        results[n].append((time.perf_counter() - t0) / ITERS)
        if not TIME_R1:
            pass
        elif rnd == 0:  # compile the r1 variant once, time it in later rounds
            st, _ = d_step(st, real, rngs[ri], alpha, d_regularize=True)
            ri += 1
            float(jax.tree.leaves(st.params_d)[0].ravel()[0])
        else:
            t1 = time.perf_counter()
            for _ in range(max(ITERS // 2, 2)):
                st, _ = d_step(st, real, rngs[ri], alpha, d_regularize=True)
                ri += 1
            float(jax.tree.leaves(st.params_d)[0].ravel()[0])
            r1_results[n].append(
                (time.perf_counter() - t1) / max(ITERS // 2, 2))
    print(f"round {rnd}: " + " ".join(
        f"{n}={results[n][-1]*1e3:.0f}ms" for n in results), flush=True)
for n, v in results.items():
    rv = r1_results[n] or [float("nan")]
    med = np.median(v)
    print(f"{n}: d_step med {med*1e3:.1f} ms min {min(v)*1e3:.1f} ms"
          f" ({batches[n]/med:.2f} img/s in-d_step)"
          f" | d_step_r1 med {np.median(rv)*1e3:.1f} ms", flush=True)
