"""Training-step throughput bench: flagship r1024 dual-D GAN iteration.

Measures the reference's training iteration (train_v10.py main loop:
update_D every iter, update_G every iter, lazy R1 every d_reg_every=15,
path reg every g_reg_every=5) at the flagship geometry: 64^2 rays x 24
samples -> CIPS decoder -> 1024^2, both discriminators at their training
resolutions. Reference scale is batch 4/GPU (train_cips3d_ffhq_v10.yaml:
312-317).

Usage:
  python bench_train.py [--batch N] [--d-dtype bfloat16] [--remat-d]
                        [--iters K] [--mem-only] [--no-fused]

--mem-only: AOT-compile the step variants and print XLA's memory analysis
(peak temp + args) without executing — fast config exploration.

Prints ONE JSON line:
  {"metric": "r1024_train_step", "value": s_per_iter, "unit": "s/iter", ...}

Timing hygiene: steps chain through TrainState, and the host fetches a
scalar reduced from the final state's params — the fetch depends on every
step's compute, defeating lazy completion acks (see bench.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def fill_like(tree, scale=0.05, seed=0):
    """Materialise random params for a shape tree (timing-only init — skips
    the expensive module-init compile; values don't affect step timing).

    Positivity-sensitive scalars are pinned to their real init: a random
    near-zero/negative `sigmoid_beta` makes sdf_to_sigma produce negative
    sigma, so alpha = 1-exp(+sigma*1e10) overflows and the whole render is
    NaN (seen as 100%-NaN Inception features in the fid dry-run)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, l in leaves:
        name = jax.tree_util.keystr(path)
        if "sigmoid_beta" in name:
            a = np.full(l.shape, 0.1, dtype=l.dtype)
        else:
            a = rng.normal(0.0, scale, size=l.shape).astype(l.dtype)
        out.append(jnp.asarray(a))
    return jax.tree_util.tree_unflatten(treedef, out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    # defaults = the fastest configuration that FITS one v5e's HBM at
    # batch 4: bf16 Ds + bf16-COMPUTE decoder (params fp32) + NO remat +
    # chunked lazy-R1 (configs/ffhq.yaml train_r1024_fast). Measured r5:
    # 0.790 s/iter vs 0.854 with a fp32 decoder (ab_gstep_dec: g_step 229
    # vs 350 ms) vs 1.048 with remat. fp32 no-remat OOMs d_step_r1
    # (17.6 GB) — pass --d-dtype float32 --remat-d to reproduce the
    # docs/STATUS.md table; --dec-dtype float32 for the r3 record config.
    ap.add_argument("--d-dtype", default="bfloat16")
    ap.add_argument("--remat-d", dest="remat_d", action="store_true",
                    default=False)
    ap.add_argument("--no-remat-d", dest="remat_d", action="store_false")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--mem-only", action="store_true")
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--no-donate", action="store_true")
    ap.add_argument("--dec-dtype", default="bfloat16",
                    help="decoder compute dtype (params stay fp32)")
    ap.add_argument("--d-seq", action="store_true",
                    help="sequential fake/real decoder-D grad accumulation")
    ap.add_argument("--d-cat", action="store_true",
                    help="concatenated fake/real decoder-D pass (one "
                    "batch-(2n) forward, sign-split loss, per-half stddev)")
    ap.add_argument("--fused-g", action="store_true",
                    help="Pallas fused SIREN in the G update (eikonal via "
                    "standalone trunk vjp)")
    ap.add_argument("--r1-chunk", type=int, default=2,
                    help="chunked lazy-R1 grad accumulation (memory)")
    ap.add_argument("--remat-dec", action="store_true",
                    help="per-layer remat inside the G decoder")
    ap.add_argument("--remat-renderer", action="store_true",
                    help="remat the SIREN trunk in backward (the g_step "
                    "trace is copy-dominated by its fp32 residuals)")
    ap.add_argument("--preset", default="r1024", choices=["r1024", "r64"],
                    help="r64 = small smoke config (CPU-feasible)")
    ap.add_argument("--per-step", action="store_true",
                    help="time each step variant separately (attribution)")
    ap.add_argument("--trace", default=None,
                    choices=["d_step", "d_step_r1", "g_step", "path_step"],
                    help="profile ONE step variant; print top device ops")
    args = ap.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp

    from cips3dpp_tpu.models.generator import (
        Generator,
        preset_r1024,
        preset_r64,
    )
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

    gen_cfg = preset_r1024() if args.preset == "r1024" else preset_r64()
    if args.dec_dtype or args.remat_dec:
        dec = gen_cfg.decoder
        if args.dec_dtype:
            dec = dataclasses.replace(dec, dtype=args.dec_dtype)
        if args.remat_dec:
            dec = dataclasses.replace(dec, remat=True)
        gen_cfg = dataclasses.replace(gen_cfg, decoder=dec)
    if args.remat_renderer:
        gen_cfg = dataclasses.replace(
            gen_cfg,
            renderer=dataclasses.replace(gen_cfg.renderer, remat=True))
    cfg = TrainConfig(
        batch=args.batch,
        remat_d=args.remat_d,
        d_dtype=args.d_dtype,
        fused_renderer_d=not args.no_fused,
        d_r1_chunk=args.r1_chunk,
        d_seq=args.d_seq,
        d_cat=args.d_cat,
        fused_renderer_g=args.fused_g,
    )
    out_size = gen_cfg.out_size

    generator = Generator(gen_cfg)
    d_decoder = DStyleGANProgressive(input_size=out_size)
    d_render = DVolumeRenderProgressive(input_size=1024, viewpoint_loss=True)

    # ---- shape-based init (no init compile) ----
    key = jax.random.PRNGKey(0)
    b = args.batch
    cam = camera_from_angles(
        jnp.zeros((b,)), jnp.zeros((b,)), gen_cfg.img_size,
        fov_ang=gen_cfg.fov_ang, dist_radius=gen_cfg.dist_radius,
    )
    zs = (jnp.zeros((b, gen_cfg.mapping.z_dim)),) * 2

    g_shapes = jax.eval_shape(
        lambda: generator.init(
            {"params": key, "perturb": key, "noise": key},
            zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
        )
    )
    d_shapes = jax.eval_shape(
        lambda: d_decoder.init(
            {"params": key, "diffaug": key},
            jnp.zeros((b, out_size, out_size, 3)),
        )
    )
    dr_shapes = jax.eval_shape(
        lambda: d_render.init(
            key, jnp.zeros((b, gen_cfg.img_size, gen_cfg.img_size, 3))
        )
    )
    params_g = fill_like(g_shapes, seed=1)
    params_d = fill_like(d_shapes, seed=2)
    params_dr = fill_like(dr_shapes, seed=3)

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

    d_step, g_step, path_step, _ = make_train_steps(
        generator, d_decoder, d_render, gen_cfg, cfg,
        (tx_g, tx_d, tx_dr), donate=not args.no_donate,
    )

    real = jnp.asarray(
        np.random.RandomState(7).uniform(-1, 1, (b, out_size, out_size, 3)),
        jnp.float32,
    )
    alpha = jnp.ones(())

    if args.mem_only:
        for name, fn, fargs in [
            ("d_step", d_step, (state, real, key, alpha, False)),
            ("d_step_r1", d_step, (state, real, key, alpha, True)),
            ("g_step", g_step, (state, key, alpha)),
            ("path_step", path_step, (state, key)),
        ]:
            t0 = time.perf_counter()
            try:
                c = fn.lower(*fargs).compile()
            except Exception as e:
                msg = str(e)
                i = msg.find("Ran out of memory")
                print(
                    json.dumps(
                        {
                            "variant": name,
                            "compile_s": round(time.perf_counter() - t0, 1),
                            "error": msg[i : i + 120] if i >= 0 else msg[:200],
                        }
                    ),
                    flush=True,
                )
                continue
            ma = c.memory_analysis()
            print(
                json.dumps(
                    {
                        "variant": name,
                        "compile_s": round(time.perf_counter() - t0, 1),
                        "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
                        "arg_gb": round(ma.argument_size_in_bytes / 2**30, 3),
                        "out_gb": round(ma.output_size_in_bytes / 2**30, 3),
                        "peak_gb": round(
                            (
                                ma.temp_size_in_bytes
                                + ma.argument_size_in_bytes
                            )
                            / 2**30,
                            3,
                        ),
                    }
                ),
                flush=True,
            )
        return

    # ---- execute: warmup each variant once (compile), then timed loop ----
    rngs = jax.random.split(jax.random.PRNGKey(42), 8 * args.iters + 32)
    ri = iter(range(len(rngs)))

    if args.trace:
        # op-level attribution of ONE step variant (same xplane parse as
        # tools/trace_serving.py); trace AFTER a warmup run so only the
        # steady-state program is captured
        import collections
        import glob
        import shutil

        calls = {
            "d_step": lambda s, k: d_step(s, real, k, alpha, False),
            "d_step_r1": lambda s, k: d_step(s, real, k, alpha, True),
            "g_step": lambda s, k: g_step(s, k, alpha),
            "path_step": lambda s, k: path_step(s, k),
        }
        call = calls[args.trace]
        t0 = time.perf_counter()
        state, _ = call(state, rngs[next(ri)])
        float(jax.tree.leaves(state.params_g)[0].ravel()[0])
        print(f"# compiled {args.trace} in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        outdir = "/tmp/jax-trace-train"
        shutil.rmtree(outdir, ignore_errors=True)
        jax.profiler.start_trace(outdir)
        for _ in range(2):
            state, _ = call(state, rngs[next(ri)])
        float(jax.tree.leaves(state.params_g)[0].ravel()[0])
        jax.profiler.stop_trace()

        from jax.profiler import ProfileData

        agg = collections.Counter()
        tot = 0.0
        for p in glob.glob(outdir + "/**/*.xplane.pb", recursive=True):
            pd = ProfileData.from_file(p)
            for plane in pd.planes:
                if "TPU" not in plane.name and "tpu" not in plane.name:
                    continue
                for line in plane.lines:
                    if "step" in (line.name or "").lower():
                        continue
                    for ev in line.events:
                        agg[ev.name] += ev.duration_ns / 1e6
                        tot += ev.duration_ns / 1e6
        for name, ms in agg.most_common(45):
            print(f"{ms/2:9.3f} ms  {name[:120]}")
        # category rollup: first HLO token (fusion/convolution/copy/...)
        cats = collections.Counter()
        for name, ms in agg.items():
            tok = name.split(" = ")[0].lstrip("%").split(".")[0]
            tok = tok.rstrip("0123456789_")
            cats[tok] += ms
        print("# --- category rollup (ms/call) ---")
        for tok, ms in cats.most_common(25):
            print(f"{ms/2:9.3f} ms  {tok}")
        print(f"# total accounted {tot/2:.1f} ms/call over 2 calls",
              flush=True)
        return

    if args.per_step:
        # Where does the amortized iteration go? Each variant timed alone,
        # chained through its own donated state (the checksum fetch defeats
        # the remote chip's early completion acks — see module docstring).
        variants = [
            ("d_step", lambda s, k: d_step(s, real, k, alpha, False)),
            ("d_step_r1", lambda s, k: d_step(s, real, k, alpha, True)),
            ("g_step", lambda s, k: g_step(s, k, alpha)),
            ("path_step", lambda s, k: path_step(s, k)),
        ]
        out = {}
        for name, call in variants:
            t0 = time.perf_counter()
            state, _ = call(state, rngs[next(ri)])  # compile+warmup
            float(jax.tree.leaves(state.params_g)[0].ravel()[0])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, _ = call(state, rngs[next(ri)])
            float(
                jax.tree.leaves(state.params_g)[0].ravel()[0]
            ) + float(state.mean_path_length)
            out[name] = round((time.perf_counter() - t0) / args.iters, 4)
            print(
                f"# {name}: {out[name]:.4f} s (compile {compile_s:.0f}s)",
                file=sys.stderr, flush=True,
            )
        amortized = (
            out["d_step"] * (1 - 1 / cfg.d_reg_every)
            + out["d_step_r1"] / cfg.d_reg_every
            + out["g_step"]
            + out["path_step"] / cfg.g_reg_every
        )
        print(
            json.dumps(
                {
                    "metric": "r1024_train_step_breakdown",
                    "unit": "s",
                    "batch": args.batch,
                    **out,
                    "amortized_s_per_iter": round(amortized, 4),
                    "d_reg_every": cfg.d_reg_every,
                    "g_reg_every": cfg.g_reg_every,
                }
            ),
            flush=True,
        )
        return

    def timed_run(cfg, d_step, g_step, path_step, state):
        def one_iter(state, i):
            state, _ = d_step(
                state, real, rngs[next(ri)], alpha, (i % cfg.d_reg_every) == 0
            )
            state, _ = g_step(state, rngs[next(ri)], alpha)
            if (i % cfg.g_reg_every) == 0:
                state, _ = path_step(state, rngs[next(ri)])
            return state

        t0 = time.perf_counter()
        state = one_iter(state, 0)  # compiles d_step_r1, g_step, path_step
        state = one_iter(state, 1)  # compiles d_step (no r1)
        float(state.mean_path_length)
        print(
            f"# compile+warmup {time.perf_counter() - t0:.0f}s",
            file=sys.stderr,
            flush=True,
        )

        t0 = time.perf_counter()
        for i in range(args.iters):
            state = one_iter(state, i)
        # fetch a scalar that depends on the whole chain
        chk = float(jax.tree.leaves(state.params_g)[0].sum()) + float(
            state.mean_path_length
        )
        dt = (time.perf_counter() - t0) / args.iters
        return dt, chk

    def fresh_state():
        pg = fill_like(g_shapes, seed=1)
        pd = fill_like(d_shapes, seed=2)
        pdr = fill_like(dr_shapes, seed=3)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params_g=pg,
            params_d=pd,
            params_d_render=pdr,
            params_g_ema=jax.tree.map(lambda x: x.copy(), pg),
            opt_g=tx_g.init(pg),
            opt_d=tx_d.init(pd),
            opt_d_render=tx_dr.init(pdr),
            mean_path_length=jnp.zeros(()),
        )

    def is_oom(e):
        s = str(e)
        return (
            "RESOURCE_EXHAUSTED" in s
            or "Ran out of memory" in s
            or "Out of memory" in s
        )

    oom_fallback = False
    try:
        dt, chk = timed_run(cfg, d_step, g_step, path_step, state)
    except Exception as e:  # noqa: BLE001 — OOM-specific fallback below
        if not is_oom(e) or cfg.remat_d:
            raise
        # The recorded no-remat config runs at ~96% HBM (BENCH_TRAIN_r03);
        # any growth — a batch bump, an XLA version change — tips it over.
        # Fall back to remat_d=True so the bench still produces a number of
        # record instead of dying rc=1. Donated buffers may be gone after a
        # failed execution, so the state is rebuilt from scratch.
        print(
            "# OOM with remat_d=False — retrying with remat_d=True",
            file=sys.stderr, flush=True,
        )
        oom_fallback = True
        cfg = dataclasses.replace(cfg, remat_d=True)
        d_step, g_step, path_step, _ = make_train_steps(
            generator, d_decoder, d_render, gen_cfg, cfg,
            (tx_g, tx_d, tx_dr), donate=not args.no_donate,
        )
        dt, chk = timed_run(cfg, d_step, g_step, path_step, fresh_state())

    mem = jax.local_devices()[0].memory_stats() or {}
    peak = mem.get("peak_bytes_in_use", 0) / 2**30
    print(
        json.dumps(
            {
                "metric": "r1024_train_step",
                "value": round(dt, 4),
                "unit": "s/iter",
                "batch": args.batch,
                "img_per_s_chip": round(args.batch / dt, 3),
                "d_dtype": args.d_dtype,
                "dec_dtype": args.dec_dtype or gen_cfg.decoder.dtype,
                "remat_d": cfg.remat_d,
                "d_seq": cfg.d_seq,
                "d_cat": cfg.d_cat,
                "fused_renderer_g": cfg.fused_renderer_g,
                "remat_renderer": gen_cfg.renderer.remat,
                "oom_fallback": oom_fallback,
                "fused_renderer_d": not args.no_fused,
                "peak_hbm_gb": round(peak, 2),
                "checksum": round(chk, 4),
                "provenance": "builder-captured, single-process timing on "
                "the shared axon chip (docs/STATUS.md bench policy)",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
