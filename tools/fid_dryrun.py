"""Full-protocol FID throughput dry-run on chip (VERDICT r4 item 4).

Runs the reference's FID pipeline shape end-to-end at the flagship
geometry — mesh/batched generation (gen_images.py:33-92) -> u8-quantised
fidelity-protocol Inception features -> Frechet + KID — with random
G/Inception weights (weights change the VALUES, not the throughput), and
extrapolates the 50k/50k protocol (train_cips3d_ffhq_v10.yaml:800-806).

Prints ONE JSON line with per-phase throughput and the 50k/50k estimate.

Usage: python tools/fid_dryrun.py [--n 10000] [--batch 16]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--incep-batch", type=int, default=16)
    args = ap.parse_args()

    from cips3dpp_tpu.models.generator import Generator, preset_serving
    from cips3dpp_tpu.models.inception import init_inception
    from cips3dpp_tpu.apps.eval_fid import (
        InceptionExtractor,
        feature_stats,
        frechet_distance,
        generate_images,
        kid,
    )
    from bench_train import fill_like

    print("devices:", jax.devices(), flush=True)
    model = Generator(preset_serving())
    cfg = model.cfg

    key = jax.random.PRNGKey(0)
    from cips3dpp_tpu.core.camera import sample_cameras

    cam = sample_cameras(key, args.batch, cfg.img_size)
    zs = (jnp.zeros((args.batch, cfg.mapping.z_dim)),) * 2
    shapes = jax.eval_shape(lambda: model.init(
        {"params": key, "perturb": key, "noise": key}, zs=zs,
        cam_poses=cam.extrinsics, focals=cam.focal, near=cam.near,
        far=cam.far))
    params = fill_like(shapes, seed=1)
    incep = init_inception(jax.random.PRNGKey(2))
    extractor = InceptionExtractor(incep, args.incep_batch)

    # --- phase 1: generation throughput (fakes stay on device) ------------
    t0 = time.perf_counter()
    fakes = []
    for batch in generate_images(model, params, args.n, args.batch,
                                 jax.random.PRNGKey(3), to_host=True):
        fakes.append(batch)
    gen_s = time.perf_counter() - t0
    n_gen = sum(len(b) for b in fakes)
    print(f"# generated {n_gen} imgs in {gen_s:.1f}s "
          f"({n_gen / gen_s:.1f} img/s)", flush=True)

    # --- phase 2: inception features (fakes + equally many 'reals') -------
    t0 = time.perf_counter()
    fake_feats = extractor(iter(fakes))
    fake_s = time.perf_counter() - t0

    rng = np.random.RandomState(0)

    def real_batches():
        left = args.n
        while left > 0:
            b = min(args.incep_batch, left)
            left -= b
            yield rng.uniform(-1, 1, (b, cfg.out_size, cfg.out_size, 3)).astype(
                np.float32
            )

    t0 = time.perf_counter()
    real_feats = extractor(real_batches())
    real_s = time.perf_counter() - t0
    print(f"# inception: fakes {args.n / fake_s:.1f} img/s, "
          f"reals {args.n / real_s:.1f} img/s", flush=True)

    # --- phase 3: metrics -------------------------------------------------
    t0 = time.perf_counter()
    mu_f, sig_f = feature_stats(fake_feats)
    mu_r, sig_r = feature_stats(real_feats)
    fid = frechet_distance(mu_f, sig_f, mu_r, sig_r)
    kid_mean, kid_std = kid(fake_feats, real_feats)
    metric_s = time.perf_counter() - t0

    total_s = gen_s + fake_s + real_s + metric_s
    # 50k/50k: generation + inception on 50k fakes; reals' features are
    # cached across evals in practice, but count one pass to be safe.
    est_50k = (gen_s + fake_s + real_s) * (50_000 / args.n) + metric_s
    print(json.dumps({
        "metric": "fid_protocol_dryrun",
        "n": args.n,
        "gen_img_per_s": round(n_gen / gen_s, 2),
        "inception_img_per_s": round(2 * args.n / (fake_s + real_s), 2),
        "fid_random_weights": round(fid, 4),
        "kid_mean": round(kid_mean, 6),
        "kid_std": round(kid_std, 6),
        "wall_s": round(total_s, 1),
        "est_50k_50k_s": round(est_50k, 1),
        "provenance": "builder-captured, single-process on the shared axon "
        "chip; random G/Inception weights (throughput-only)",
    }), flush=True)


if __name__ == "__main__":
    main()
