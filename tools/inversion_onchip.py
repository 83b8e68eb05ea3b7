"""First recorded flagship inversion numbers (VERDICT r4 item 3).

Self-inversion at the flagship r1024 geometry on chip: render a target
from the model itself at a known pose (azim*=0.25) with mean latents,
then run the 3-phase projector (reduced schedule) and log elapsed +
PSNR/SSIM/LPIPS + pose recovery — the numbers the reference prints after
every run (projector_v10.py:1266-1275, render_video_web_v10.py:844-855).
Random G/VGG weights: timing + machinery evidence; quality vs released
checkpoints needs the .pth gate.

Prints ONE JSON line.

Usage: python tools/inversion_onchip.py [--pose 60] [--app 120]
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
    ap.add_argument("--pose", type=int, default=60)
    ap.add_argument("--app", type=int, default=120)
    ap.add_argument("--azim-true", type=float, default=0.25)
    args = ap.parse_args()

    from cips3dpp_tpu.models.generator import Generator, preset_serving
    from cips3dpp_tpu.models.vgg import init_vgg
    from cips3dpp_tpu.core.camera import camera_from_angles
    from cips3dpp_tpu.apps.inversion import Projector, InversionConfig
    from bench_train import fill_like

    print("devices:", jax.devices(), flush=True)
    model = Generator(preset_serving())
    cfg = model.cfg

    key = jax.random.PRNGKey(0)
    cam0 = camera_from_angles(
        jnp.zeros((1,)), jnp.zeros((1,)), cfg.img_size,
        fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius,
    )
    zs = (jnp.zeros((1, cfg.mapping.z_dim)),) * 2
    shapes = jax.eval_shape(lambda: model.init(
        {"params": key, "perturb": key, "noise": key}, zs=zs,
        cam_poses=cam0.extrinsics, focals=cam0.focal, near=cam0.near,
        far=cam0.far))
    params = fill_like(shapes, seed=1)

    # target: mean-latent render at the known pose
    bound = model.bind(params)
    means = model.apply(params, jax.random.PRNGKey(5), 1024,
                        method="mean_latents")
    wr, wd = means
    sr = jnp.repeat(wr[:, None, :], cfg.renderer.n_layers + 1, axis=1)
    sd = jnp.repeat(wd[:, None, :], bound.decoder.n_latent, axis=1)
    cam = camera_from_angles(
        jnp.asarray([args.azim_true]), jnp.asarray([0.0]), cfg.img_size,
        fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius,
    )
    noise = list(bound.decoder.make_noise(jax.random.PRNGKey(0), cfg.img_size))
    out = model.apply(
        params, style_render=sr, style_decoder=sd,
        cam_poses=cam.extrinsics, focals=cam.focal, near=cam.near,
        far=cam.far, noise_bufs=noise, perturb=True,
        rngs={"perturb": jax.random.PRNGKey(7)},
    )
    target = np.asarray(out["rgb"][0])
    print(f"# target rendered: {target.shape}", flush=True)

    vgg = init_vgg(jax.random.PRNGKey(0), img_size=cfg.out_size)
    icfg = InversionConfig(
        n_steps_pose=args.pose, n_steps_app=args.app, n_steps_multiview=0,
        w_avg_samples=1024, lr_cam=0.1,
    )
    proj = Projector(model, params, vgg, icfg)

    t0 = time.perf_counter()
    logs = []
    state, proj_img, report = proj.project(
        target, key=jax.random.PRNGKey(1), azim_init=(0.02, 0.02),
        logger=lambda s, m: (
            logs.append((s, m)),
            print(f"# step {s}: loss {m['loss']:.4f} "
                  f"[t+{time.perf_counter()-t0:.0f}s]", flush=True),
        ),
        log_every=20,
    )
    elapsed = time.perf_counter() - t0
    n_steps = args.pose + args.app
    azim_rec = float(np.asarray(state.azim).ravel()[0])
    print(json.dumps({
        "metric": "r1024_inversion",
        "n_steps": n_steps,
        "elapsed_s": round(elapsed, 1),
        "s_per_step": round(elapsed / n_steps, 3),
        "psnr": round(report["psnr"], 3),
        "ssim": round(report["ssim"], 4),
        "lpips": round(report["lpips"], 4),
        "lpips_weights": report["lpips_weights"],
        "first_loss": round(logs[0][1]["loss"], 4) if logs else None,
        "final_loss": round(report["loss"], 4),
        "azim_true": args.azim_true,
        "azim_recovered": round(azim_rec, 4),
        "fused_renderer": proj.fused,
        "provenance": "builder-captured, single-process on the shared axon "
        "chip; random G/VGG weights (self-inversion machinery + timing)",
    }), flush=True)


if __name__ == "__main__":
    main()
