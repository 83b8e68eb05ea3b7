"""Camera sampling and extrinsics construction.

Behavioural contract: exp/cips3d/nerf_utils.py:341-564 (Camera class). The
camera sits on a unit sphere looking at the origin; azimuth/elevation map to
a position, a look-at frame gives R, and intrinsics come from a fov angle.
near/far = dist -/+ dist_radius.

All functions are pure and jit-friendly; randomness is explicit via PRNG keys
(the reference uses torch's global RNG). Angle->extrinsics is differentiable,
which the inversion app relies on (projector_v10.py:211-277 optimises
azim/elev through this path).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CameraParams(NamedTuple):
    extrinsics: jnp.ndarray  # (B, 3, 4) camera-to-world [R | t]
    focal: jnp.ndarray  # (B, 1, 1)
    near: jnp.ndarray  # (B, 1, 1)
    far: jnp.ndarray  # (B, 1, 1)
    viewpoint: jnp.ndarray  # (B, 2) (azim, elev)


def _normalize(v, eps=1e-5):
    # Matches F.normalize(p=2, eps=...): v / max(|v|, eps)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def camera_from_angles(
    azim: jnp.ndarray,
    elev: jnp.ndarray,
    img_size: int,
    fov_ang: float = 6.0,
    dist_radius: float = 0.12,
    up: jnp.ndarray | None = None,
) -> CameraParams:
    """Build look-at extrinsics + intrinsics from (azim, elev) in radians.

    Mirrors nerf_utils.py:369-436 (and the custom-`up` variant :465-564).
    azim/elev: (B,) or (B,1).
    """
    azim = azim.reshape(-1)
    elev = elev.reshape(-1)
    b = azim.shape[0]
    dtype = azim.dtype

    dist = jnp.ones((b,), dtype)
    near = (dist - dist_radius).reshape(b, 1, 1)
    far = (dist + dist_radius).reshape(b, 1, 1)
    fov = jnp.full((b,), fov_ang * np.pi / 180.0, dtype)
    focal = (0.5 * img_size / jnp.tan(fov)).reshape(b, 1, 1)

    # Unit-sphere camera position.
    x = jnp.cos(elev) * jnp.sin(azim)
    y = jnp.sin(elev)
    z = jnp.cos(elev) * jnp.cos(azim)
    camera_dir = jnp.stack([x, y, z], axis=-1)  # (B, 3)
    camera_loc = dist[:, None] * camera_dir

    if up is None:
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], dtype), (b, 3))

    z_axis = _normalize(camera_dir)  # -z points into the screen
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    # Degenerate up || z: rebuild x from y x z (nerf_utils.py:428-431).
    is_close = jnp.all(jnp.abs(x_axis) < 5e-3, axis=-1, keepdims=True)
    replacement = _normalize(jnp.cross(y_axis, z_axis))
    x_axis = jnp.where(is_close, replacement, x_axis)

    # R rows are the axes; extrinsics store R^T | t (camera-to-world).
    r = jnp.stack([x_axis, y_axis, z_axis], axis=1)  # (B, 3, 3)
    extrinsics = jnp.concatenate(
        [jnp.swapaxes(r, 1, 2), camera_loc[:, :, None]], axis=-1
    )  # (B, 3, 4)

    viewpoint = jnp.stack([azim, elev], axis=-1)
    return CameraParams(extrinsics, focal, near, far, viewpoint)


def sample_cameras(
    key: jax.Array,
    batch: int,
    img_size: int,
    azim_range=0.3,
    elev_range=0.15,
    fov_ang: float = 6.0,
    dist_radius: float = 0.12,
    uniform: bool = False,
    dtype=jnp.float32,
) -> CameraParams:
    """Random camera sampling (nerf_utils.py:393-410).

    gaussian (default): angle = range * N(0,1); uniform: U(-range, range) or
    U(range[0], range[1]) when ranges are 2-lists.
    """
    ka, ke = jax.random.split(key)
    if uniform:
        if isinstance(azim_range, (list, tuple)):
            a0, a1 = azim_range
            e0, e1 = elev_range
            azim = jax.random.uniform(ka, (batch,), dtype, a0, a1)
            elev = jax.random.uniform(ke, (batch,), dtype, e0, e1)
        else:
            azim = jax.random.uniform(ka, (batch,), dtype, -azim_range, azim_range)
            elev = jax.random.uniform(ke, (batch,), dtype, -elev_range, elev_range)
    else:
        azim = azim_range * jax.random.normal(ka, (batch,), dtype)
        elev = elev_range * jax.random.normal(ke, (batch,), dtype)
    return camera_from_angles(
        azim, elev, img_size, fov_ang=fov_ang, dist_radius=dist_radius
    )


def sweep_cameras(
    key: jax.Array,
    batch: int,
    img_size: int,
    azim_range=0.3,
    elev_range=0.15,
    fov_ang: float = 6.0,
    dist_radius: float = 0.12,
    dtype=jnp.float32,
) -> CameraParams:
    """8-view azimuth sweep with a shared random elevation per batch item
    (nerf_utils.py:379-392). Returns B*8 cameras."""
    if isinstance(azim_range, (list, tuple)):
        a0, a1 = azim_range
        azim1 = a0 + (a1 - a0) / 7.0 * jnp.arange(8, dtype=dtype)
    else:
        azim1 = -azim_range + (2.0 * azim_range / 7.0) * jnp.arange(8, dtype=dtype)
    azim = jnp.tile(azim1, (batch,))
    if isinstance(elev_range, (list, tuple)):
        e0, e1 = elev_range
        elev_b = e0 + (e1 - e0) * jax.random.uniform(key, (batch, 1), dtype)
    else:
        elev_b = -elev_range + 2 * elev_range * jax.random.uniform(
            key, (batch, 1), dtype
        )
    elev = jnp.repeat(elev_b, 8, axis=1).reshape(-1)
    return camera_from_angles(
        azim, elev, img_size, fov_ang=fov_ang, dist_radius=dist_radius
    )


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation: (..., 3) axis-angle -> (..., 3, 3) matrix.

    Replaces pytorch3d.transforms.axis_angle_to_matrix (nerf_utils.py:8,455)
    with pure math; smooth at theta -> 0 via the standard series fallback.
    """
    # Guard the sqrt so gradients at theta=0 stay finite (double-where trick):
    # the non-small branch never sees the degenerate input.
    t2_raw = jnp.sum(jnp.square(axis_angle), axis=-1, keepdims=True)  # (..., 1)
    small = t2_raw < 1e-12
    t2 = jnp.where(small, 1.0, t2_raw)
    theta = jnp.sqrt(t2)
    # sin(t)/t and (1-cos(t))/t^2 with series expansions near zero.
    sinc = jnp.where(small, 1.0 - t2_raw / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - t2_raw / 24.0, (1.0 - jnp.cos(theta)) / t2)
    x, y, z = axis_angle[..., 0], axis_angle[..., 1], axis_angle[..., 2]
    zero = jnp.zeros_like(x)
    k = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 3) skew matrix
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), k.shape)
    return eye + sinc[..., None] * k + cosc[..., None] * (k @ k)


def camera2world_from_axis_angle(
    rot: jnp.ndarray, trans: jnp.ndarray, homo: bool = False
) -> jnp.ndarray:
    """(B,3) axis-angle + (B,3) translation -> (B,3,4) c2w
    (nerf_utils.py:438-463); differentiable wrt both inputs."""
    prefix = rot.shape[:-1]
    r = axis_angle_to_matrix(rot)
    ext = jnp.concatenate([r, trans.reshape(*prefix, 3, 1)], axis=-1)
    if homo:
        bottom = jnp.zeros((*prefix, 1, 4), rot.dtype).at[..., 0, 3].set(1.0)
        ext = jnp.concatenate([ext, bottom], axis=-2)
    return ext
