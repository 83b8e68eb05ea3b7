"""Inference apps: multi-view trajectories, style mixing, stylization.

Behavioural contract: exp/cips3d/models/render_video_web_v10.py —
trajectories (:1731-1790, __get_trans_rotation_cams :1587-1649), slerp
(:375-385), style-mixing grid (:1901-2126), decoder weight interpolation
(:896-935, 1169+). The reference wraps these in Streamlit; here they are
pure functions + a CLI (cips3dpp_tpu.apps.cli) — one jitted per-frame
render reused across every app, camera built on-device from angles.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.camera import CameraParams, camera_from_angles


# ---------------------------------------------------------------- latents --


def slerp(z1, z2, t):
    """Spherical interpolation (render_video_web_v10.py:375-385)."""
    p = jnp.sum(z1 * z2, axis=-1, keepdims=True)
    p = p / jnp.linalg.norm(z1, axis=-1, keepdims=True)
    p = p / jnp.linalg.norm(z2, axis=-1, keepdims=True)
    omega = jnp.arccos(jnp.clip(p, -1.0, 1.0))
    so = jnp.sin(omega)
    s1 = jnp.sin((1.0 - t) * omega) / so
    s2 = jnp.sin(t * omega) / so
    return s1 * z1 + s2 * z2


def lerp(a, b, t):
    return a + (b - a) * t


# ------------------------------------------------------------ trajectories --


def yaw_trajectory(
    n_frames: int,
    img_size: int,
    azim_range=(-0.3, 0.3),
    elev: float = 0.0,
    fov_ang: float = 6.0,
    dist_radius: float = 0.12,
) -> CameraParams:
    """Sinusoidal yaw sweep (render_video_web_v10.py:1732-1748)."""
    t = jnp.linspace(0.0, 1.0, n_frames)
    azim = azim_range[0] + (azim_range[1] - azim_range[0]) * jnp.sin(t * jnp.pi)
    elev_t = jnp.full((n_frames,), elev)
    return camera_from_angles(
        azim, elev_t, img_size, fov_ang=fov_ang, dist_radius=dist_radius
    )


def circle_trajectory(
    n_frames: int,
    img_size: int,
    azim_range: float = 0.3,
    elev: float = 0.15,
    fov_range=(5.0, 7.0),
    dist_radius: float = 0.12,
) -> CameraParams:
    """Azimuth circle with fov sweep (render_video_web_v10.py:1763-1784)."""
    t = jnp.linspace(0.0, 1.0, n_frames)
    azim = azim_range * jnp.sin(t * 2.0 * jnp.pi)
    elev_t = jnp.full((n_frames,), elev)
    fov = fov_range[0] + (fov_range[1] - fov_range[0]) * jnp.sin(t * jnp.pi)
    return camera_from_angles(
        azim, elev_t, img_size, fov_ang=fov, dist_radius=dist_radius
    )


def elev_circle_trajectory(
    n_frames: int,
    img_size: int,
    azim_range=(-0.3, 0.3),
    elev_range: float = 0.15,
    fov_range=(5.0, 7.0),
    dist_radius: float = 0.12,
) -> CameraParams:
    """Elevation ramp then azimuth sweep with fov breathing
    (_fixed_zs_multi_view_web 'elev_circle', render_video_web_v10.py:2231-2263)."""
    half = n_frames // 2
    t = jnp.linspace(0.0, 1.0, half)
    # phase 1: raise elevation at the first fov
    azim1 = jnp.zeros((half,))
    elev1 = elev_range * t
    fov1 = jnp.full((half,), fov_range[0])
    # phase 2: azimuth sweep at full elevation, fov sin sweep
    azim2 = azim_range[0] + (azim_range[1] - azim_range[0]) * t
    elev2 = jnp.full((half,), elev_range)
    fov2 = fov_range[0] + (fov_range[1] - fov_range[0]) * jnp.sin(t * jnp.pi)
    return camera_from_angles(
        jnp.concatenate([azim1, azim2]),
        jnp.concatenate([elev1, elev2]),
        img_size,
        fov_ang=jnp.concatenate([fov1, fov2]),
        dist_radius=dist_radius,
    )


def translate_rotate_trajectory(
    n_frames: int,
    img_size: int,
    trans_max: float = 0.04,
    fov_ang: float = 6.0,
    dist_radius: float = 0.12,
    only_rotate: bool = False,
) -> CameraParams:
    """Camera x-translation then in-plane roll via rotating `up`
    (__get_trans_rotation_cams, render_video_web_v10.py:1587-1649)."""
    t = jnp.linspace(0.0, 1.0, n_frames)

    # rotation phase: frontal camera, up vector spinning in the image plane
    alpha = t * 2.0 * jnp.pi + 0.5 * jnp.pi
    ups = jnp.stack([jnp.cos(alpha), jnp.sin(alpha), jnp.zeros_like(alpha)], axis=-1)
    zeros = jnp.zeros((n_frames,))
    rot = camera_from_angles(
        zeros, zeros, img_size, fov_ang=fov_ang, dist_radius=dist_radius, up=ups
    )
    if only_rotate:
        return rot

    # translation phase: identity rotation, sinusoidal x offset at z=1
    trans_x = trans_max * jnp.sin(t * 2.0 * jnp.pi)
    eye = jnp.broadcast_to(jnp.eye(3), (n_frames, 3, 3))
    tvec = jnp.stack([trans_x, jnp.zeros_like(t), jnp.ones_like(t)], axis=-1)
    ext_trans = jnp.concatenate([eye, tvec[:, :, None]], axis=-1)
    base = camera_from_angles(
        zeros, zeros, img_size, fov_ang=fov_ang, dist_radius=dist_radius
    )
    trans = CameraParams(
        ext_trans, base.focal, base.near, base.far, base.viewpoint
    )
    return CameraParams(*[
        jnp.concatenate([a, b], axis=0) for a, b in zip(trans, rot)
    ])


# -------------------------------------------------------------- rendering --


def make_frame_renderer(model, params, *, ray_chunk=None, fused=False,
                        noise_seed=None):
    """One jitted frame fn shared by every trajectory app: styles are
    precomputed once (w-space; truncation applied there), camera varies per
    frame. fused=True uses the Pallas SIREN kernel (serving); noise_seed
    (fused only) derives the fixed noise realization in-kernel instead of
    reading lane-padded buffers — pass noise_bufs=None per frame then."""

    @jax.jit
    def frame(style_render, style_decoder, extrinsics, focal, near, far, noise_bufs):
        out = model.apply(
            params,
            style_render=style_render,
            style_decoder=style_decoder,
            cam_poses=extrinsics,
            focals=focal,
            near=near,
            far=far,
            noise_bufs=noise_bufs,
            perturb=False,
            ray_chunk=ray_chunk,
            fused_renderer=fused,
            fused_decoder=fused,
            noise_seed=noise_seed,
        )
        return out["rgb"], out["thumb_rgb"], out["depth"], out["xyz"]

    return frame


def get_styles(model, params, zs, truncation=1.0, mean_latents=None):
    return model.apply(
        params, zs, truncation, mean_latents, method="map_zs"
    )


def make_noise_projector(
    model,
    params,
    style_render,
    key,
    *,
    mesh_resolution: int = 128,
    max_res: int = 256,
    bounds: float = 0.24,
):
    """Geometry-aware noise projection (model_v3.py:344-415): extract the
    marching-cubes surface of the current identity once, attach fixed
    per-vertex noise, and per frame rasterize it from the camera so the
    decoder noise sticks to the geometry across views. Buffers larger than
    `max_res` pass through unchanged (the reference subdivides the mesh
    instead; vertex density, not resolution, is the quality limit).

    Returns project(noise_bufs, extrinsics, focal) -> new noise_bufs."""
    from ..utils.mesh import extract_shape
    from ..utils.rasterize import rasterize_mesh

    verts, faces = extract_shape(
        model, params, style_render, resolution=mesh_resolution, bounds=bounds
    )
    vert_noise = jax.random.normal(key, (max(len(verts), 1), 1))
    verts_j = jnp.asarray(verts.reshape(-1, 3), jnp.float32)
    faces_j = jnp.asarray(faces.reshape(-1, 3), jnp.int32)

    def project(noise_bufs, extrinsics, focal):
        if len(verts) == 0:  # no surface crossed the iso-level
            return list(noise_bufs)
        cache = {}
        out = []
        for buf in noise_bufs:
            res = buf.shape[1]
            if res > max_res:
                out.append(buf)
                continue
            if res not in cache:
                color, _, hit = rasterize_mesh(
                    verts_j, faces_j, vert_noise,
                    extrinsics[0], focal.reshape(-1)[0], res,
                )
                cache[res] = (color, hit)
            color, hit = cache[res]
            # visible surface takes the projected noise; the rest keeps the
            # buffer (reference prev_noise semantics, model_v3.py:408-414)
            out.append(jnp.where(hit[None, :, :, None], color[None], buf))
        return out

    return project


def render_trajectory(
    model,
    params,
    zs,
    cams: CameraParams,
    *,
    truncation: float = 1.0,
    mean_latents=None,
    noise_bufs=None,
    zero_noise: bool = False,
    ray_chunk=None,
    fused: bool = False,
    project_noise: bool = False,
    project_noise_key=None,
    project_noise_max_res: int = 256,
    noise_seed=None,
):
    """Render every frame of a camera trajectory with fixed latents
    (_sample_multi_view_web hot loop, render_video_web_v10.py:1806-1824).

    project_noise=True enables geometry-aware noise (model_v3.py:344-415).
    noise_seed: procedural in-kernel hash noise instead of buffers —
    measured SLOWER than bf16 buffers on v5e (Box-Muller transcendentals
    cost more than the padded DMA they save), so buffers stay the default.
    Returns dict of stacked host arrays: rgb (N,H,W,3) in [-1,1], thumb,
    depth, xyz."""
    style_render, style_decoder = get_styles(model, params, zs, truncation, mean_latents)
    if zero_noise and noise_seed is not None:
        # honor zero_noise rather than silently ignoring it in the
        # hash-noise path: zero buffers override the seed
        noise_seed = None
    if noise_bufs is None and noise_seed is None:
        bound = model.bind(params)
        noise_bufs = bound.decoder.make_noise(
            jax.random.PRNGKey(0), model.cfg.img_size
        )
    if zero_noise and noise_bufs is not None:
        noise_bufs = [jnp.zeros_like(b) for b in noise_bufs]
    projector = None
    if project_noise:
        key = (
            project_noise_key
            if project_noise_key is not None
            else jax.random.PRNGKey(7)
        )
        projector = make_noise_projector(
            model, params, style_render, key, max_res=project_noise_max_res,
        )

    frame = make_frame_renderer(
        model, params, ray_chunk=ray_chunk, fused=fused, noise_seed=noise_seed
    )
    outs = {"rgb": [], "thumb_rgb": [], "depth": [], "xyz": []}
    n = cams.extrinsics.shape[0]
    for i in range(n):
        frame_noise = noise_bufs
        if projector is not None:
            frame_noise = projector(
                noise_bufs, cams.extrinsics[i : i + 1], cams.focal[i : i + 1]
            )
        rgb, thumb, depth, xyz = frame(
            style_render,
            style_decoder,
            cams.extrinsics[i : i + 1],
            cams.focal[i : i + 1],
            cams.near[i : i + 1],
            cams.far[i : i + 1],
            frame_noise,
        )
        outs["rgb"].append(np.asarray(rgb[0]))
        outs["thumb_rgb"].append(np.asarray(thumb[0]))
        outs["depth"].append(np.asarray(depth[0]))
        outs["xyz"].append(np.asarray(xyz[0]))
    return {k: np.stack(v) for k, v in outs.items()}


# ------------------------------------------------------------ style mixing --


def style_mixing_grid(
    model,
    params,
    key,
    n_rows: int,
    n_cols: int,
    cam: CameraParams,
    truncation: float = 0.7,
    mean_latents=None,
    noise_bufs=None,
):
    """(rows: shape/render w) x (cols: appearance/decoder w) grid
    (_style_mixing_web, render_video_web_v10.py:1901-2126): cell (i, j)
    renders row i's renderer style with column j's decoder style."""
    kr, kc = jax.random.split(key)
    z_rows = jax.random.normal(kr, (n_rows, model.cfg.mapping.z_dim))
    z_cols = jax.random.normal(kc, (n_cols, model.cfg.mapping.z_dim))

    if noise_bufs is None:
        noise_bufs = model.bind(params).decoder.make_noise(
            jax.random.PRNGKey(1), model.cfg.img_size
        )

    frame = make_frame_renderer(model, params)
    rows = []
    for i in range(n_rows):
        row_imgs = []
        for j in range(n_cols):
            sr, _ = get_styles(
                model, params, (z_rows[i : i + 1], z_rows[i : i + 1]),
                truncation, mean_latents,
            )
            _, sd = get_styles(
                model, params, (z_cols[j : j + 1], z_cols[j : j + 1]),
                truncation, mean_latents,
            )
            rgb, *_ = frame(
                sr, sd, cam.extrinsics[:1], cam.focal[:1], cam.near[:1],
                cam.far[:1], noise_bufs,
            )
            row_imgs.append(np.asarray(rgb[0]))
        rows.append(np.concatenate(row_imgs, axis=1))
    return np.concatenate(rows, axis=0)


# -------------------------------------------------- decoder interpolation --


def interpolate_decoder_params(params_a, params_b, gamma: float,
                               submodules=("decoder",)):
    """Per-layer lerp of decoder weights between two checkpoints =
    stylization (interp_state_dict_decoder, render_video_web_v10.py:896-935).
    gamma=0 -> a (photo model), gamma=1 -> b (style model)."""

    def merge(tree_a, tree_b):
        return jax.tree.map(lambda a, b: (1.0 - gamma) * a + gamma * b, tree_a, tree_b)

    out = jax.tree.map(lambda x: x, params_a)  # shallow copy of structure
    new_params = dict(out["params"])
    for name in submodules:
        new_params[name] = merge(params_a["params"][name], params_b["params"][name])
    return {**out, "params": new_params}


def save_video(frames: np.ndarray, path: str, fps: int = 30):
    """[-1,1] float frames -> video (reference uses imageio/skvideo writers).

    mp4 needs an ffmpeg backend; if unavailable (as in minimal installs),
    falls back to an animated GIF next to the requested path."""
    import imageio

    u8 = ((np.clip(frames, -1, 1) + 1) * 127.5).astype(np.uint8)
    try:
        imageio.mimwrite(path, u8, fps=fps)
    except (ValueError, ImportError):
        path = path.rsplit(".", 1)[0] + ".gif"
        imageio.mimwrite(path, u8, duration=1000.0 / fps, loop=0)
    return path


def tile_grid(frames: np.ndarray, n_cols: int | None = None) -> np.ndarray:
    """Tile (N,H,W,C) into one (rH, cW, C) image (torchvision make_grid
    semantics with padding=0, used by _fixed_zs_multi_view_web)."""
    n, h, w, c = frames.shape
    if n_cols is None:
        n_cols = max(1, int(np.sqrt(n)))
    n_rows = (n + n_cols - 1) // n_cols
    grid = np.full((n_rows * h, n_cols * w, c), -1.0, frames.dtype)
    for i in range(n):
        r, cc = divmod(i, n_cols)
        grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = frames[i]
    return grid


def save_image_grid(frames: np.ndarray, path: str, n_cols: int = 8):
    from PIL import Image

    n, h, w, c = frames.shape
    n_rows = (n + n_cols - 1) // n_cols
    grid = np.zeros((n_rows * h, n_cols * w, c), frames.dtype)
    for i in range(n):
        r, cc = divmod(i, n_cols)
        grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = frames[i]
    u8 = ((np.clip(grid, -1, 1) + 1) * 127.5).astype(np.uint8)
    Image.fromarray(u8).save(path)
    return path
