"""Command-line launchers.

The reference exposes every workflow as a unittest-method launcher that
spawns streamlit / torch.distributed subprocesses (exp/tests/
test_cips3dpp.py). Here each workflow is a plain subcommand over the same
YAML section convention:

    python -m cips3dpp_tpu.apps.cli <command> \
        --cfg configs/ffhq_r1024.yaml --section train_r1024 \
        --opts key.path value ...

Commands: train, sphere-init, sample-multi-view, style-mixing,
interpolate-decoder, invert, render-inverted, eval-fid, prepare-data,
rendering-time, import-torch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _base_parser(desc):
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--cfg", type=str, default=None, help="YAML config file")
    p.add_argument("--section", type=str, default=None, help="config section")
    p.add_argument("--opts", nargs="*", default=[], help="dotted overrides")
    p.add_argument("--outdir", type=str, default="results/run")
    p.add_argument("--seed", type=int, default=0)
    return p


def _load_cfg(args) -> dict:
    from ..io.config import load_command_config, apply_overrides

    if args.cfg is None:
        cfg = {}
    else:
        cfg = load_command_config(args.cfg, args.section)
    return apply_overrides(cfg, args.opts)


def _build_generator(cfg: dict):
    import jax
    from ..io.config import generator_config_from_dict
    from ..models.generator import Generator

    gcfg = generator_config_from_dict(cfg.get("G_cfg", {}))
    return Generator(gcfg), gcfg


def _load_params(model, gcfg, cfg, key=None):
    """Load G params: orbax ckpt dir, torch .pth, or fresh init."""
    import jax
    import jax.numpy as jnp
    from ..core.camera import sample_cameras

    key = jax.random.PRNGKey(0) if key is None else key
    ckpt = cfg.get("network_pkl") or cfg.get("ckpt")
    cam = sample_cameras(jax.random.PRNGKey(1), 1, gcfg.img_size)
    zs = (jnp.zeros((1, gcfg.mapping.z_dim)), jnp.zeros((1, gcfg.mapping.z_dim)))
    params = model.init(
        {"params": key, "perturb": key, "noise": key},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    if ckpt is None:
        print("[cli] no checkpoint given: using random init", file=sys.stderr)
        return params
    if ckpt.endswith(".pth"):
        from ..io.torch_import import (
            load_torch_checkpoint,
            import_generator_state_dict,
            validate_torch_state_dict,
        )

        sd = load_torch_checkpoint(ckpt)
        # fail loudly on any key/shape mismatch vs the architecture-derived
        # manifest before importing a single tensor
        report = validate_torch_state_dict(sd, params, strict=True)
        if report["unexpected"]:
            print(
                f"[cli] {len(report['unexpected'])} unexpected state-dict "
                f"keys ignored: {report['unexpected'][:5]} ...",
                file=sys.stderr,
            )
        import math

        n_blocks = int(math.log2(gcfg.decoder.size_end)) - int(
            math.log2(gcfg.decoder.size_start)
        )
        return import_generator_state_dict(
            sd,
            n_renderer_layers=gcfg.renderer.n_layers,
            n_decoder_blocks=n_blocks,
            n_mapping_layers=gcfg.mapping.n_layers,
            n_decoder_mapping_layers=gcfg.decoder.mapping_n_layers,
        )
    # orbax dir with a full TrainState: restore g_ema
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(ckpt))
    if "params_g_ema" in restored:
        return restored["params_g_ema"]
    return restored


def cmd_sample_multi_view(argv):
    p = _base_parser("multi-view video sampling")
    p.add_argument("--view-mode", default="yaw",
                   choices=["yaw", "circle", "translate_rotate"])
    p.add_argument("--n-frames", type=int, default=36)
    p.add_argument("--fps", type=int, default=12)
    p.add_argument("--truncation", type=float, default=0.7)
    p.add_argument("--zero-noise", action="store_true")
    p.add_argument("--project-noise", action="store_true",
                   help="geometry-aware noise: splat fixed per-vertex noise "
                        "from the extracted surface (model_v3.py:344-415)")
    p.add_argument("--fused", action="store_true",
                   help="Pallas fused SIREN renderer (flagship geometry)")
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    import jax
    from .sample import (
        yaw_trajectory, circle_trajectory, translate_rotate_trajectory,
        render_trajectory, save_video, save_image_grid,
    )

    model, gcfg = _build_generator(cfg)
    params = _load_params(model, gcfg, cfg)
    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    zs = (
        jax.random.normal(k1, (1, gcfg.mapping.z_dim)),
        jax.random.normal(k2, (1, gcfg.mapping.z_dim)),
    )
    means = None
    if args.truncation < 1:
        means = model.apply(params, jax.random.PRNGKey(2), 10_000,
                            method="mean_latents")

    traj_fns = {
        "yaw": lambda: yaw_trajectory(args.n_frames, gcfg.img_size,
                                      fov_ang=gcfg.fov_ang,
                                      dist_radius=gcfg.dist_radius),
        "circle": lambda: circle_trajectory(args.n_frames, gcfg.img_size,
                                            dist_radius=gcfg.dist_radius),
        "translate_rotate": lambda: translate_rotate_trajectory(
            args.n_frames, gcfg.img_size, fov_ang=gcfg.fov_ang,
            dist_radius=gcfg.dist_radius),
    }
    cams = traj_fns[args.view_mode]()
    out = render_trajectory(
        model, params, zs, cams, truncation=args.truncation,
        mean_latents=means, zero_noise=args.zero_noise, fused=args.fused,
        project_noise=args.project_noise,
        project_noise_key=jax.random.PRNGKey(args.seed + 1),
    )
    os.makedirs(args.outdir, exist_ok=True)
    vp = save_video(out["rgb"], f"{args.outdir}/video.mp4", fps=args.fps)
    save_video(out["thumb_rgb"], f"{args.outdir}/video_thumb.mp4", fps=args.fps)
    # depth-surface video: Delaunay-equivalent mesh of the xyz map,
    # lambertian-shaded through the software rasterizer (the reference's
    # pytorch3d depth-mesh render, render_video_web_v10.py:1840-1882)
    from ..utils.mesh import xyz_to_mesh
    from ..utils.rasterize import shaded_mesh_image

    depth_res = min(4 * gcfg.img_size, 256)
    depth_frames = []
    for i, x in enumerate(out["xyz"]):
        verts, faces = xyz_to_mesh(x)
        img, _ = shaded_mesh_image(
            verts, faces, np.asarray(cams.extrinsics[i]),
            float(np.asarray(cams.focal[i]).ravel()[0])
            * depth_res / gcfg.img_size,
            depth_res,
        )
        depth_frames.append(img)
    save_video(np.stack(depth_frames), f"{args.outdir}/video_depth.mp4",
               fps=args.fps)
    gp = save_image_grid(out["rgb"], f"{args.outdir}/frames.png")
    print(json.dumps({"video": vp, "grid": gp, "frames": len(out["rgb"])}))


def cmd_fixed_zs_multi_view(argv):
    """Grid video of several fixed identities sharing one camera sweep
    (_fixed_zs_multi_view_web, render_video_web_v10.py:2128-2322)."""
    p = _base_parser("fixed-zs multi-view grid video")
    p.add_argument("--n-zs", type=int, default=4, help="identities in the grid")
    p.add_argument("--view-mode", default="circle",
                   choices=["circle", "elev_circle", "yaw"])
    p.add_argument("--n-frames", type=int, default=36)
    p.add_argument("--fps", type=int, default=12)
    p.add_argument("--truncation", type=float, default=0.7)
    p.add_argument("--zero-noise", action="store_true")
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    import jax
    import jax.numpy as jnp
    from .sample import (
        yaw_trajectory, circle_trajectory, elev_circle_trajectory,
        get_styles, make_frame_renderer, tile_grid, save_video,
        save_image_grid,
    )

    model, gcfg = _build_generator(cfg)
    params = _load_params(model, gcfg, cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
    n = args.n_zs
    zs = (
        jax.random.normal(k1, (n, gcfg.mapping.z_dim)),
        jax.random.normal(k2, (n, gcfg.mapping.z_dim)),
    )
    means = None
    if args.truncation < 1:
        means = model.apply(params, jax.random.PRNGKey(2), 10_000,
                            method="mean_latents")
    style_render, style_decoder = get_styles(
        model, params, zs, args.truncation, means
    )
    noise = model.bind(params).decoder.make_noise(
        jax.random.PRNGKey(3), gcfg.img_size
    )
    if args.zero_noise:
        noise = [jnp.zeros_like(b) for b in noise]
    noise = [jnp.repeat(b, n, axis=0) for b in noise]

    traj = {
        "yaw": lambda: yaw_trajectory(args.n_frames, gcfg.img_size,
                                      fov_ang=gcfg.fov_ang,
                                      dist_radius=gcfg.dist_radius),
        "circle": lambda: circle_trajectory(args.n_frames, gcfg.img_size,
                                            dist_radius=gcfg.dist_radius),
        "elev_circle": lambda: elev_circle_trajectory(
            args.n_frames, gcfg.img_size, dist_radius=gcfg.dist_radius),
    }[args.view_mode]()

    frame = make_frame_renderer(model, params)
    rep = lambda a, i: jnp.repeat(a[i : i + 1], n, axis=0)
    frames = []
    n_frames = traj.extrinsics.shape[0]
    for i in range(n_frames):
        rgb, *_ = frame(
            style_render, style_decoder, rep(traj.extrinsics, i),
            rep(traj.focal, i), rep(traj.near, i), rep(traj.far, i), noise,
        )
        frames.append(tile_grid(np.asarray(rgb)))
    os.makedirs(args.outdir, exist_ok=True)
    vp = save_video(np.stack(frames), f"{args.outdir}/video.mp4", fps=args.fps)
    gp = save_image_grid(np.asarray(frames[0])[None],
                         f"{args.outdir}/frame0.png", n_cols=1)
    print(json.dumps({"video": vp, "grid": gp, "frames": n_frames,
                      "n_zs": n}))


def cmd_lerp_inversions(argv):
    """Interpolation gallery over saved inversions: lerp w's, decoder params
    and noise buffers between consecutive artifacts, cycling
    (lerp_image_list, projector_v10.py:732-821)."""
    p = _base_parser("video lerping between saved inversion artifacts")
    p.add_argument("--inversions", nargs="+", required=True,
                   help="two or more w.pkl paths")
    p.add_argument("--n-interp", type=int, default=12, help="frames per pair")
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    import jax
    import jax.numpy as jnp
    from .inversion import Projector
    from .sample import save_video
    from ..core.camera import camera_from_angles

    model, gcfg = _build_generator(cfg)
    params = _load_params(model, gcfg, cfg)
    blobs = [Projector.load_inversion(pth) for pth in args.inversions]

    @jax.jit
    def frame_fn(p_t, sr, sd, ext, focal, near, far, noise):
        out = model.apply(
            p_t, style_render=sr, style_decoder=sd, cam_poses=ext,
            focals=focal, near=near, far=far, noise_bufs=noise, perturb=False,
        )
        return out["rgb"]

    frames = []
    n_authors = len(blobs)
    for idx in range(n_authors):
        cur, nxt = blobs[idx], blobs[(idx + 1) % n_authors]
        for t in np.linspace(0.0, 1.0, args.n_interp, endpoint=False):
            t = float(t)
            lerp_tree = jax.tree.map(
                lambda a, b: (1.0 - t) * a + t * b,
                {k: cur[k] for k in
                 ("w_render_opt", "w_decoder_opt", "decoder_params",
                  "noise_bufs")},
                {k: nxt[k] for k in
                 ("w_render_opt", "w_decoder_opt", "decoder_params",
                  "noise_bufs")},
            )
            restored = {**params["params"],
                        "decoder": lerp_tree["decoder_params"]}
            if "renderer_params" in cur and "renderer_params" in nxt:
                restored["renderer"] = jax.tree.map(
                    lambda a, b: (1.0 - t) * a + t * b,
                    cur["renderer_params"], nxt["renderer_params"],
                )
            p_t = {**params, "params": restored}
            azim = (1.0 - t) * float(cur["azim"][0, 0]) + t * float(
                nxt["azim"][0, 0]
            )
            elev = (1.0 - t) * float(cur["elev"][0, 0]) + t * float(
                nxt["elev"][0, 0]
            )
            cam = camera_from_angles(
                jnp.asarray([azim]), jnp.asarray([elev]), gcfg.img_size,
                fov_ang=gcfg.fov_ang, dist_radius=gcfg.dist_radius,
            )
            rgb = frame_fn(
                p_t,
                jnp.asarray(lerp_tree["w_render_opt"]),
                jnp.asarray(lerp_tree["w_decoder_opt"]),
                cam.extrinsics, cam.focal, cam.near, cam.far,
                [jnp.asarray(b) for b in lerp_tree["noise_bufs"]],
            )
            frames.append(np.asarray(rgb[0]))
    os.makedirs(args.outdir, exist_ok=True)
    vp = save_video(np.stack(frames), f"{args.outdir}/gallery.mp4",
                    fps=args.fps)
    print(json.dumps({"video": vp, "frames": len(frames)}))


def cmd_interpolate_z(argv):
    """Latent slerp video (reference _interpolate_z_web)."""
    p = _base_parser("z-space slerp interpolation video")
    p.add_argument("--n-frames", type=int, default=24)
    p.add_argument("--fps", type=int, default=12)
    p.add_argument("--truncation", type=float, default=0.7)
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    import jax
    import jax.numpy as jnp
    from ..core.camera import camera_from_angles
    from .sample import slerp, render_trajectory, save_video, save_image_grid
    from cips3dpp_tpu.core.camera import CameraParams

    model, gcfg = _build_generator(cfg)
    params = _load_params(model, gcfg, cfg)
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    za = (jax.random.normal(k1, (1, gcfg.mapping.z_dim)),
          jax.random.normal(k2, (1, gcfg.mapping.z_dim)))
    zb = (jax.random.normal(k3, (1, gcfg.mapping.z_dim)),
          jax.random.normal(k4, (1, gcfg.mapping.z_dim)))
    means = model.apply(params, jax.random.PRNGKey(2), 10_000,
                        method="mean_latents")
    cam = camera_from_angles(jnp.zeros(1), jnp.zeros(1), gcfg.img_size,
                             fov_ang=gcfg.fov_ang, dist_radius=gcfg.dist_radius)
    frames = []
    for i in range(args.n_frames):
        t = i / max(args.n_frames - 1, 1)
        zs = (slerp(za[0], zb[0], t), slerp(za[1], zb[1], t))
        out = render_trajectory(model, params, zs, cam,
                                truncation=args.truncation,
                                mean_latents=means, zero_noise=True)
        frames.append(out["rgb"][0])
    os.makedirs(args.outdir, exist_ok=True)
    vp = save_video(np.stack(frames), f"{args.outdir}/interp_z.mp4", args.fps)
    gp = save_image_grid(np.stack(frames), f"{args.outdir}/interp_z.png")
    print(json.dumps({"video": vp, "grid": gp}))


def cmd_style_mixing(argv):
    p = _base_parser("style mixing grid")
    p.add_argument("--n-rows", type=int, default=4)
    p.add_argument("--n-cols", type=int, default=4)
    p.add_argument("--truncation", type=float, default=0.7)
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    import jax
    from ..core.camera import camera_from_angles
    import jax.numpy as jnp
    from .sample import style_mixing_grid

    model, gcfg = _build_generator(cfg)
    params = _load_params(model, gcfg, cfg)
    cam = camera_from_angles(jnp.zeros(1), jnp.zeros(1), gcfg.img_size,
                             fov_ang=gcfg.fov_ang, dist_radius=gcfg.dist_radius)
    means = model.apply(params, jax.random.PRNGKey(2), 10_000,
                        method="mean_latents")
    grid = style_mixing_grid(
        model, params, jax.random.PRNGKey(args.seed), args.n_rows, args.n_cols,
        cam, truncation=args.truncation, mean_latents=means,
    )
    os.makedirs(args.outdir, exist_ok=True)
    from PIL import Image

    u8 = ((np.clip(grid, -1, 1) + 1) * 127.5).astype(np.uint8)
    path = f"{args.outdir}/style_mixing.png"
    Image.fromarray(u8).save(path)
    print(json.dumps({"grid": path, "shape": list(grid.shape)}))


def cmd_interpolate_decoder(argv):
    p = _base_parser("decoder weight interpolation (stylization)")
    p.add_argument("--ckpt-b", type=str, required=True,
                   help="style model checkpoint (.pth or orbax)")
    p.add_argument("--gammas", type=float, nargs="*", default=[0, 0.25, 0.5, 0.75, 1.0])
    p.add_argument("--n-frames", type=int, default=1)
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    import jax
    import jax.numpy as jnp
    from ..core.camera import camera_from_angles
    from .sample import interpolate_decoder_params, render_trajectory, save_image_grid

    model, gcfg = _build_generator(cfg)
    params_a = _load_params(model, gcfg, cfg)
    params_b = _load_params(model, gcfg, {**cfg, "network_pkl": args.ckpt_b})
    key = jax.random.PRNGKey(args.seed)
    zs = (
        jax.random.normal(key, (1, gcfg.mapping.z_dim)),
        jax.random.normal(jax.random.fold_in(key, 1), (1, gcfg.mapping.z_dim)),
    )
    cam = camera_from_angles(jnp.zeros(1), jnp.zeros(1), gcfg.img_size,
                             fov_ang=gcfg.fov_ang, dist_radius=gcfg.dist_radius)
    frames = []
    for g in args.gammas:
        mixed = interpolate_decoder_params(params_a, params_b, g)
        out = render_trajectory(model, mixed, zs, cam, zero_noise=True)
        frames.append(out["rgb"][0])
    os.makedirs(args.outdir, exist_ok=True)
    path = save_image_grid(np.stack(frames), f"{args.outdir}/decoder_interp.png",
                           n_cols=len(args.gammas))
    print(json.dumps({"grid": path, "gammas": args.gammas}))


def cmd_invert(argv):
    p = _base_parser("flip inversion")
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--vgg", type=str, default=None,
                   help="torchvision vgg16 .pth for the perceptual loss")
    p.add_argument("--lpips", type=str, default=None,
                   help="lpips package vgg.pth lin weights (needs --vgg too)")
    p.add_argument("--azim-init", type=float, nargs=2, default=[0.0, 0.0])
    p.add_argument("--cam-param", choices=["angles", "axis_angle"],
                   default=None,
                   help="camera parameterisation (axis_angle = the "
                        "reference's _flip_inversion_axis_angle_web mode)")
    args = p.parse_args(argv)
    cfg = _load_cfg(args)
    if args.cam_param:
        cfg["cam_param"] = args.cam_param

    import jax
    from PIL import Image
    from .inversion import Projector, InversionConfig
    from ..io.config import train_config_from_dict
    from ..io.weights import load_vgg, load_lpips

    model, gcfg = _build_generator(cfg)
    params = _load_params(model, gcfg, cfg)
    # --vgg/--lpips override; otherwise $CIPS3DPP_WEIGHTS_DIR is consulted
    vgg, vgg_prov = load_vgg(path=args.vgg)
    lpips_vars, lpips_prov = load_lpips(vgg_path=args.vgg, lin_path=args.lpips)
    if lpips_prov == "random":
        lpips_vars = None  # Projector tags its own random fallback

    import dataclasses

    icfg_fields = {f.name for f in dataclasses.fields(InversionConfig)}
    icfg = InversionConfig(
        **{k: v for k, v in cfg.items() if k in icfg_fields}
    )

    size = gcfg.out_size
    img = Image.open(args.image).convert("RGB")
    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    img = img.resize((size, size), Image.LANCZOS)
    target = np.asarray(img, np.float32) / 127.5 - 1.0

    proj = Projector(model, params, vgg, icfg, lpips_variables=lpips_vars)
    os.makedirs(args.outdir, exist_ok=True)
    state, proj_img, report = proj.project(
        target, key=jax.random.PRNGKey(args.seed),
        azim_init=tuple(args.azim_init),
        logger=lambda s, m: print(f"step {s}: {m}", file=sys.stderr),
    )
    # explicit weight provenance so random-VGG smoke runs can't be mistaken
    # for real quality numbers
    report["vgg_weights"] = vgg_prov
    u8 = ((np.clip(proj_img[0], -1, 1) + 1) * 127.5).astype(np.uint8)
    Image.fromarray(u8).save(f"{args.outdir}/proj.png")
    proj.save_inversion(f"{args.outdir}/w.pkl", state)
    with open(f"{args.outdir}/report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


def cmd_render_inverted(argv):
    p = _base_parser("multi-view rendering from a saved inversion")
    p.add_argument("--inversion", type=str, required=True, help="w.pkl path")
    p.add_argument("--n-frames", type=int, default=36)
    p.add_argument("--fps", type=int, default=12)
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    import jax
    import jax.numpy as jnp
    from .inversion import Projector
    from .sample import yaw_trajectory, save_video, save_image_grid, make_frame_renderer

    model, gcfg = _build_generator(cfg)
    params = _load_params(model, gcfg, cfg)
    blob = Projector.load_inversion(args.inversion)
    # restore BOTH fitted decoder params and the renderer state the inversion
    # ran against (render_video_web_v10.py:1039-1048, projector_v10.py:1046-1055)
    restored = {**params["params"], "decoder": blob["decoder_params"]}
    if "renderer_params" in blob:
        restored["renderer"] = blob["renderer_params"]
    params = {**params, "params": restored}

    azim0 = float(blob["azim"][0, 0])
    cams = yaw_trajectory(
        args.n_frames, gcfg.img_size,
        azim_range=(azim0 - 0.3, azim0 + 0.3),
        elev=float(blob["elev"][0, 0]),
        fov_ang=gcfg.fov_ang, dist_radius=gcfg.dist_radius,
    )
    frame = make_frame_renderer(model, params)
    noise = [jnp.asarray(b) for b in blob["noise_bufs"]]
    frames = []
    for i in range(args.n_frames):
        rgb, *_ = frame(
            blob["w_render_opt"], blob["w_decoder_opt"],
            cams.extrinsics[i : i + 1], cams.focal[i : i + 1],
            cams.near[i : i + 1], cams.far[i : i + 1], noise,
        )
        frames.append(np.asarray(rgb[0]))
    os.makedirs(args.outdir, exist_ok=True)
    vp = save_video(np.stack(frames), f"{args.outdir}/inverted_views.mp4", args.fps)
    gp = save_image_grid(np.stack(frames), f"{args.outdir}/inverted_views.png")
    print(json.dumps({"video": vp, "grid": gp}))


def cmd_extract_shape(argv):
    """Marching-cubes shape export + image render per seed (reference
    generate_shapes_and_images.py)."""
    p = _base_parser("SDF iso-surface .obj export")
    p.add_argument("--n-shapes", type=int, default=1)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--truncation", type=float, default=0.7)
    p.add_argument("--frustum-align", action="store_true")
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    import jax
    import jax.numpy as jnp
    from ..core.camera import camera_from_angles
    from ..utils.mesh import (
        sample_sdf_grid, marching_tetrahedra, save_obj, align_volume,
    )
    from .sample import render_trajectory, save_image_grid

    model, gcfg = _build_generator(cfg)
    params = _load_params(model, gcfg, cfg)
    means = model.apply(params, jax.random.PRNGKey(2), 10_000,
                        method="mean_latents")
    cam = camera_from_angles(jnp.zeros(1), jnp.zeros(1), gcfg.img_size,
                             fov_ang=gcfg.fov_ang, dist_radius=gcfg.dist_radius)
    os.makedirs(args.outdir, exist_ok=True)
    results = []
    for i in range(args.n_shapes):
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        k1, k2 = jax.random.split(key)
        zs = (jax.random.normal(k1, (1, gcfg.mapping.z_dim)),
              jax.random.normal(k2, (1, gcfg.mapping.z_dim)))
        sr, _ = model.apply(params, zs, args.truncation, means,
                            method="map_zs")
        vol, lin = sample_sdf_grid(model, params, sr,
                                   resolution=args.resolution)
        if args.frustum_align:
            vol = align_volume(vol)
        verts, faces = marching_tetrahedra(vol, 0.0, coords=[lin, lin, lin])
        obj = save_obj(verts, faces, f"{args.outdir}/shape_{i}.obj")
        out = render_trajectory(model, params, zs, cam,
                                truncation=args.truncation,
                                mean_latents=means, zero_noise=True)
        img = save_image_grid(out["rgb"], f"{args.outdir}/shape_{i}.png",
                              n_cols=1)
        results.append({"obj": obj, "img": img, "n_verts": int(len(verts))})
    print(json.dumps(results))


def render_parity_grid(model, params, n_seeds: int = 2, n_views: int = 3):
    """Deterministic (z, camera) render grid for checkpoint-parity checks:
    fixed seeds, fixed yaw sweep, perturb off, zero noise buffers. Returns
    dict(rgb (S*V,H,W,3), thumb_rgb, zs, azim)."""
    import jax
    import jax.numpy as jnp
    from ..core.camera import camera_from_angles

    gcfg = model.cfg
    azim = np.linspace(-gcfg.azim_range, gcfg.azim_range, n_views)
    cams = camera_from_angles(
        jnp.asarray(azim, jnp.float32), jnp.zeros((n_views,), jnp.float32),
        gcfg.img_size, fov_ang=gcfg.fov_ang, dist_radius=gcfg.dist_radius,
    )
    noise = [
        jnp.zeros_like(b)
        for b in model.bind(params).decoder.make_noise(
            jax.random.PRNGKey(0), gcfg.img_size
        )
    ]

    @jax.jit
    def one(z0, z1, ext, focal, near, far):
        return model.apply(
            params, zs=(z0, z1), cam_poses=ext, focals=focal,
            near=near, far=far, noise_bufs=noise, perturb=False,
        )

    rgbs, thumbs, zs_out = [], [], []
    for s in range(n_seeds):
        k0, k1 = jax.random.split(jax.random.PRNGKey(1000 + s))
        z0 = jax.random.normal(k0, (1, gcfg.mapping.z_dim))
        z1 = jax.random.normal(k1, (1, gcfg.mapping.z_dim))
        zs_out.append(np.concatenate([np.asarray(z0), np.asarray(z1)]))
        for v in range(n_views):
            out = one(
                z0, z1, cams.extrinsics[v : v + 1], cams.focal[v : v + 1],
                cams.near[v : v + 1], cams.far[v : v + 1],
            )
            rgbs.append(np.asarray(out["rgb"][0], np.float32))
            thumbs.append(np.asarray(out["thumb_rgb"][0], np.float32))
    return {
        "rgb": np.stack(rgbs),
        "thumb_rgb": np.stack(thumbs),
        "zs": np.stack(zs_out),
        "azim": azim.astype(np.float32),
    }


def cmd_verify_import(argv):
    """Checkpoint-parity harness: render a fixed (z, camera) grid from an
    imported G_ema.pth and compare per-pixel against a stored golden. Run
    once with --save-golden on a trusted setup; real released weights
    (train_cips3d_ffhq_v10.yaml:3-8) drop in with zero code changes."""
    p = _base_parser("verify imported checkpoint against golden renders")
    p.add_argument("--golden", type=str, default=None,
                   help="golden .npz to compare against")
    p.add_argument("--save-golden", type=str, default=None,
                   help="write the golden .npz instead of comparing")
    p.add_argument("--tol", type=float, default=1e-3,
                   help="max abs per-pixel tolerance in [-1,1] units")
    p.add_argument("--n-seeds", type=int, default=2)
    p.add_argument("--n-views", type=int, default=3)
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    model, gcfg = _build_generator(cfg)
    params = _load_params(model, gcfg, cfg)
    grid = render_parity_grid(model, params, args.n_seeds, args.n_views)

    if args.save_golden:
        os.makedirs(os.path.dirname(os.path.abspath(args.save_golden)),
                    exist_ok=True)
        np.savez_compressed(args.save_golden, **grid)
        print(json.dumps({"saved": args.save_golden,
                          "n_images": int(grid["rgb"].shape[0])}))
        return
    if not args.golden:
        p.error("one of --golden / --save-golden is required")
    ref = np.load(args.golden)
    report = {}
    ok = True
    for k in ("rgb", "thumb_rgb"):
        if ref[k].shape != grid[k].shape:
            report[k] = {"shape_mismatch": [list(ref[k].shape),
                                            list(grid[k].shape)]}
            ok = False
            continue
        err = np.abs(ref[k] - grid[k])
        mse = float(np.mean(np.square(ref[k] - grid[k])))
        report[k] = {
            "max_abs_err": float(err.max()),
            "mean_abs_err": float(err.mean()),
            "psnr": float(10 * np.log10(4.0 / max(mse, 1e-12))),
        }
        ok = ok and err.max() <= args.tol
    report["tol"] = args.tol
    report["pass"] = bool(ok)
    print(json.dumps(report))
    return 0 if ok else 1


def cmd_eval_fid(argv):
    p = _base_parser("FID/KID evaluation")
    p.add_argument("--data", type=str, required=True)
    # reference protocol: 50k real / 50k fake, KID on
    # (train_cips3d_ffhq_v10.yaml:801-806); override via config or flags
    p.add_argument("--n-images", type=int, default=None)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--inception", type=str, default=None,
                   help="pt_inception .pth weights")
    p.add_argument("--kid", action="store_true", default=None)
    args = p.parse_args(argv)
    cfg = _load_cfg(args)
    if args.n_images is None:
        args.n_images = int(cfg.get("n_images", 50_000))
    if args.kid is None:
        args.kid = bool(cfg.get("kid", True))

    import jax
    from ..io.dataset import open_dataset, data_iterator
    from ..io.weights import load_inception
    from .eval_fid import eval_fid

    model, gcfg = _build_generator(cfg)
    params = _load_params(model, gcfg, cfg)
    # --inception overrides; otherwise $CIPS3DPP_WEIGHTS_DIR is consulted
    incep, incep_prov = load_inception(path=args.inception)

    ds = open_dataset(args.data, resolution=gcfg.out_size)
    it = data_iterator(ds, args.batch, seed=args.seed)
    n_batches = args.n_images // args.batch
    real = (next(it) for _ in range(n_batches))
    res = eval_fid(model, params, real, incep, n_fake=args.n_images,
                   batch_size=args.batch, key=jax.random.PRNGKey(args.seed),
                   with_kid=args.kid)
    out = dataclasses_asdict(res)
    out["inception_weights"] = incep_prov
    print(json.dumps(out))


def dataclasses_asdict(x):
    import dataclasses

    return dataclasses.asdict(x)


def cmd_train(argv):
    p = _base_parser("GAN training")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--total-iters", type=int, default=None)
    p.add_argument("--no-sphere-init", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--finetune-dir", type=str, default=None,
                   help="checkpoint dir to initialise G/G_ema/Ds from "
                        "(reference tl_finetune, train_v10.py:1225-1245)")
    p.add_argument("--init-renderer-from", type=str, default=None,
                   help="stage-1 (enable_decoder=False) checkpoint dir: "
                        "graft its trained volume renderer + mapping into "
                        "the fresh full pipeline (the StyleSDF "
                        "train_full_pipeline.py:484 handoff)")
    p.add_argument("--fid-data", type=str, default=None,
                   help="real-image dir for in-training FID")
    p.add_argument("--inception", type=str, default=None)
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    import jax
    from ..io.config import train_config_from_dict
    from ..io.dataset import open_dataset, data_iterator
    from ..models.discriminator import DStyleGANProgressive
    from ..models.discriminator_pose import DVolumeRenderProgressive
    from ..parallel import make_mesh
    from .cli_train_impl import run_training

    run_training(args, cfg)


def cmd_sphere_init(argv):
    p = _base_parser("SDF sphere initialisation only")
    p.add_argument("--n-iters", type=int, default=10000)
    args = p.parse_args(argv)
    cfg = _load_cfg(args)
    from .cli_train_impl import run_sphere_init

    run_sphere_init(args, cfg)


def cmd_prepare_data(argv):
    p = _base_parser("dataset preparation (images -> npy shards or LMDB)")
    p.add_argument("--src", type=str, required=True)
    p.add_argument("--sizes", type=int, nargs="*", default=[1024])
    p.add_argument("--format", choices=["npy", "lmdb"], default="npy",
                   help="lmdb = the reference's multi-size format "
                        "(prepare_data.py:23-80), readable by both stacks")
    p.add_argument("--n-workers", type=int, default=0,
                   help="multiprocessing resize workers (0 = in-process)")
    p.add_argument("--crop-size", type=int, nargs="*", default=None,
                   help="explicit centered crop W [H] before resizing "
                        "(the crop_data.py tool); default = max square")
    p.add_argument("--codec", choices=["png", "jpeg"], default="png",
                   help="lmdb image codec; png = lossless, byte-compatible "
                        "with the reference (prepare_data.py:44)")
    p.add_argument("--quality", type=int, default=100,
                   help="jpeg quality (only with --codec jpeg)")
    args = p.parse_args(argv)
    from ..io.dataset import prepare_images, prepare_images_lmdb

    crop = args.crop_size
    if crop is not None:
        crop = tuple(crop) if len(crop) == 2 else int(crop[0])
    if args.format == "lmdb":
        out = prepare_images_lmdb(args.src, args.outdir, sizes=args.sizes,
                                  n_workers=args.n_workers, crop_size=crop,
                                  codec=args.codec, quality=args.quality)
    else:
        out = prepare_images(args.src, args.outdir, sizes=args.sizes,
                             n_workers=args.n_workers, crop_size=crop)
    print(json.dumps({"outdir": out, "format": args.format}))


def cmd_rendering_time(argv):
    p = _base_parser("rendering throughput benchmark")
    p.add_argument("--n-frames", type=int, default=128)
    args = p.parse_args(argv)
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), str(args.n_frames)],
        check=True,
    )


def cmd_import_torch(argv):
    p = _base_parser(
        "convert a reference .pth (G_ema / D / D_renderer) to an orbax ckpt"
    )
    p.add_argument("--pth", type=str, required=True)
    p.add_argument(
        "--model", choices=["g_ema", "d", "d_pose"], default="g_ema",
        help="which reference model the state dict holds: g_ema (the "
        "released inversion ckpts), d = D_StyleGAN_Progressive or d_pose = "
        "D_VolumeRender_Progressive (training ckpts, for finetuning)",
    )
    args = p.parse_args(argv)
    cfg = _load_cfg(args)

    from ..io.torch_import import load_torch_checkpoint
    import orbax.checkpoint as ocp
    import math

    import jax
    import jax.numpy as jnp

    sd = load_torch_checkpoint(args.pth)
    _, gcfg = _build_generator(cfg)
    if args.model == "g_ema":
        from ..io.torch_import import import_generator_state_dict

        n_blocks = int(math.log2(gcfg.decoder.size_end)) - int(
            math.log2(gcfg.decoder.size_start)
        )
        params = import_generator_state_dict(
            sd, n_renderer_layers=gcfg.renderer.n_layers,
            n_decoder_blocks=n_blocks,
            n_mapping_layers=gcfg.mapping.n_layers,
            n_decoder_mapping_layers=gcfg.decoder.mapping_n_layers,
        )
    elif args.model == "d":
        from ..io.torch_import import import_d_stylegan_state_dict
        from ..models.discriminator import DStyleGANProgressive

        d = DStyleGANProgressive(
            input_size=gcfg.out_size,
            channel_multiplier=gcfg.decoder.channel_multiplier,
        )
        template = d.init(
            jax.random.PRNGKey(0), jnp.zeros((2, gcfg.out_size, gcfg.out_size, 3))
        )
        params = import_d_stylegan_state_dict(sd, template)
    else:
        from ..io.torch_import import import_d_pose_state_dict
        from ..models.discriminator_pose import DVolumeRenderProgressive

        d = DVolumeRenderProgressive(input_size=gcfg.img_size)
        template = d.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, gcfg.img_size, gcfg.img_size, 3)),
        )
        params = import_d_pose_state_dict(sd, template)
    ckptr = ocp.StandardCheckpointer()
    out = os.path.abspath(os.path.join(args.outdir, args.model))
    ckptr.save(out, params, force=True)
    ckptr.wait_until_finished()
    print(json.dumps({"ckpt": out, "model": args.model}))


COMMANDS = {
    "train": cmd_train,
    "sphere-init": cmd_sphere_init,
    "sample-multi-view": cmd_sample_multi_view,
    "fixed-zs-multi-view": cmd_fixed_zs_multi_view,
    "interpolate-z": cmd_interpolate_z,
    "lerp-inversions": cmd_lerp_inversions,
    "style-mixing": cmd_style_mixing,
    "interpolate-decoder": cmd_interpolate_decoder,
    "invert": cmd_invert,
    "render-inverted": cmd_render_inverted,
    "eval-fid": cmd_eval_fid,
    "verify-import": cmd_verify_import,
    "extract-shape": cmd_extract_shape,
    "prepare-data": cmd_prepare_data,
    "rendering-time": cmd_rendering_time,
    "import-torch": cmd_import_torch,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("commands:", ", ".join(COMMANDS))
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; have {sorted(COMMANDS)}", file=sys.stderr)
        return 2
    rc = COMMANDS[cmd](argv[1:])
    return 0 if rc is None else rc


if __name__ == "__main__":
    sys.exit(main())
