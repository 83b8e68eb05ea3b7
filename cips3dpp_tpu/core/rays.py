"""Ray generation and depth sampling.

Behavioural contract: exp/cips3d/nerf_utils.py:17-218 (Render class). Pinhole
rays through pixel centres, rotated into world space by the c2w extrinsics;
z-value "offset sampling" (one shared jitter per ray) or classic NeRF
stratified sampling.

Pure jnp, static shapes, explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_rays_in_world(
    focal: jnp.ndarray,  # (B, 1, 1)
    img_size: int,
    c2w: jnp.ndarray,  # (B, 3, 4)
    static_viewdirs: bool = False,
):
    """Rays through pixel centres (nerf_utils.py:18-66).

    Returns rays_o, rays_d, viewdirs, each (B, H, W, 3); viewdirs are
    L2-normalised (world-frame unless static_viewdirs).
    """
    dtype = focal.dtype
    b = focal.shape[0]
    coords = jnp.linspace(0.5, img_size - 0.5, img_size, dtype=dtype)
    x = jnp.broadcast_to(coords[None, None, :], (b, img_size, img_size))
    y = jnp.broadcast_to(coords[None, :, None], (b, img_size, img_size))

    fx = focal  # (B,1,1) broadcasts over (B,H,W)
    rays_d_cam = jnp.stack(
        [
            (x - img_size * 0.5) / fx,
            -(y - img_size * 0.5) / fx,
            -jnp.ones_like(x),
        ],
        axis=-1,
    )  # (B, H, W, 3) camera-frame directions

    # Rotate into world frame: d_w[i] = sum_j d_c[j] * R[i, j] with R = c2w[:, :3, :3];
    # the reference contracts over the last axis of c2w (nerf_utils.py:52-53).
    rays_d = jnp.einsum("bhwj,bij->bhwi", rays_d_cam, c2w[:, :3, :3])
    rays_o = jnp.broadcast_to(c2w[:, None, None, :3, -1], rays_d.shape)

    viewdirs = rays_d_cam if static_viewdirs else rays_d
    norm = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
    viewdirs = viewdirs / jnp.maximum(norm, 1e-12)

    return rays_o, rays_d, viewdirs


def get_z_vals(
    near: jnp.ndarray,  # (B, 1, 1)
    far: jnp.ndarray,  # (B, 1, 1)
    rays_d: jnp.ndarray,  # (B, H, W, 3)
    n_samples: int,
    perturb: bool = True,
    offset_sampling: bool = True,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Depths along each ray, (B, H, W, N) (nerf_utils.py:68-121).

    offset sampling: linspace over [near, far) then one uniform offset shared
    by all samples of a ray; stratified: midpoint intervals, iid jitter.
    """
    b, h, w, _ = rays_d.shape
    dtype = rays_d.dtype
    near_ = near[..., None] * jnp.ones_like(rays_d[..., :1])  # (B,H,W,1)
    far_ = far[..., None] * jnp.ones_like(rays_d[..., :1])

    if offset_sampling:
        t_vals = jnp.linspace(0.0, 1.0 - 1.0 / n_samples, n_samples, dtype=dtype)
    else:
        t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    t_vals = t_vals.reshape(1, 1, 1, -1)
    z_vals = near_ * (1.0 - t_vals) + far_ * t_vals  # (B,H,W,N)

    if perturb:
        if key is None:
            raise ValueError("perturb=True requires an explicit PRNG key")
        if offset_sampling:
            upper = jnp.concatenate([z_vals[..., 1:], far_], axis=-1)
            lower = jax.lax.stop_gradient(z_vals)
            t_rand = jax.random.uniform(key, (b, h, w, 1), dtype)
        else:
            mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
            lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
            t_rand = jax.random.uniform(key, z_vals.shape, dtype)
        z_vals = lower + (upper - lower) * t_rand

    return z_vals


def get_points(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, z_vals: jnp.ndarray
) -> jnp.ndarray:
    """pts = o + d * z, (B, H, W, N, 3) (nerf_utils.py:136-170)."""
    return rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., None]


def normalize_points(
    pts: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray
) -> jnp.ndarray:
    """pts * 2 / (far - near), batch-wise (nerf_utils.py:123-133)."""
    span = (far - near).reshape((-1,) + (1,) * (pts.ndim - 1))
    return pts * 2.0 / span


def prepare_nerf_inputs(
    focal: jnp.ndarray,
    img_size: int,
    cam_poses: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    perturb: bool = True,
    static_viewdirs: bool = False,
    key: jax.Array | None = None,
):
    """rays -> z_vals -> points, offset sampling (nerf_utils.py:172-218).

    Returns pts (B,H,W,N,3), rays_d (B,H,W,3), viewdirs (B,H,W,3),
    z_vals (B,H,W,N).
    """
    rays_o, rays_d, viewdirs = get_rays_in_world(
        focal=focal, img_size=img_size, c2w=cam_poses, static_viewdirs=static_viewdirs
    )
    z_vals = get_z_vals(
        near=near,
        far=far,
        rays_d=rays_d,
        n_samples=n_samples,
        perturb=perturb,
        offset_sampling=True,
        key=key,
    )
    pts = get_points(rays_o, rays_d, z_vals)
    return pts, rays_d, viewdirs, z_vals
