"""SDF-sigma volume integration (alpha compositing).

Behavioural contract: exp/cips3d/nerf_utils.py:230-338 (volume_integration).
SDF to density via sigmoid(-sdf/beta)/beta with a learned beta, alpha from
1-exp(-sigma*dist), transmittance cumprod, then weighted sums of
sigmoid(rgb) (mapped to [-1, 1]), features and sample positions.

Works on either (B, H, W, N, C) or flattened (B, R, N, C) layouts — only the
sample axis (-2) and channel axis (-1) matter. The eikonal term is NOT
computed here: in JAX it is a vjp of the SDF network wrt the points, taken by
the renderer (see models/renderer.py), not an autograd mutation of the
forward graph like nerf_utils.py:220-228.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdf_to_sigma(sdf: jnp.ndarray, sigmoid_beta: jnp.ndarray) -> jnp.ndarray:
    """sigma = sigmoid(-sdf / beta) / beta (nerf_utils.py:278)."""
    return jax.nn.sigmoid(-sdf / sigmoid_beta) / sigmoid_beta


def volume_integration(
    rgb: jnp.ndarray,  # (..., N, 3)
    sdf: jnp.ndarray,  # (..., N, 1)
    features: jnp.ndarray | None,  # (..., N, C)
    z_vals: jnp.ndarray,  # (..., N)
    rays_d: jnp.ndarray,  # (..., 3)
    pts: jnp.ndarray,  # (..., N, 3)
    with_sdf: bool = True,
    sigmoid_beta: jnp.ndarray | None = None,
    raw_noise_std: float = 0.0,
    force_background: bool = False,
    noise_key: jax.Array | None = None,
):
    """Composite samples along each ray.

    Returns (rgb_map (...,3), feature_map (...,C) | None, xyz (...,3),
    mask_depth (...,2) = [background-weight, -|xyz|]).
    """
    # Distances between consecutive samples; last interval open (1e10),
    # scaled by |d| so they are metric (nerf_utils.py:266-274).
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    rays_d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)  # (..., 1)
    inf = jnp.full_like(rays_d_norm, 1e10)
    dists = jnp.concatenate([dists, inf], axis=-1) * rays_d_norm  # (..., N)

    if with_sdf:
        sigma = sdf_to_sigma(sdf, sigmoid_beta)
        alpha = 1.0 - jnp.exp(-sigma * dists[..., None])  # (..., N, 1)
    else:
        noise = 0.0
        if raw_noise_std > 0.0:
            if noise_key is None:
                raise ValueError("raw_noise_std > 0 requires noise_key")
            noise = raw_noise_std * jax.random.normal(noise_key, sdf.shape, sdf.dtype)
        alpha = 1.0 - jnp.exp(-jax.nn.softplus(sdf + noise) * dists[..., None])

    # Transmittance: cumprod of (1 - alpha) shifted by one (leading ones).
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-2)
    ones = jnp.ones_like(alpha[..., :1, :])
    visibility = jnp.concatenate([ones, trans[..., :-1, :]], axis=-2)
    weights = alpha * visibility  # (..., N, 1)

    if force_background:
        last = 1.0 - jnp.sum(weights[..., :-1, :], axis=-2, keepdims=True)
        weights = jnp.concatenate([weights[..., :-1, :], last], axis=-2)

    rgb_map = -1.0 + 2.0 * jnp.sum(weights * jax.nn.sigmoid(rgb), axis=-2)

    feature_map = None
    if features is not None:
        feature_map = jnp.sum(weights * features, axis=-2)

    xyz = jnp.sum(weights * pts, axis=-2)  # surface point cloud (world coords)
    mask = weights[..., -1, :]  # background probability
    depth = -jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    mask_depth = jnp.concatenate([mask, depth], axis=-1)

    return rgb_map, feature_map, xyz, mask_depth
