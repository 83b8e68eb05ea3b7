"""DiffAugment: differentiable color / translation / cutout augmentations.

Behavioural contract: exp/cips3d/models/diffaug.py:9-85 (policy
'color,translation,cutout'). NHWC, explicit PRNG key, fully traceable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_brightness(x, key):
    return x + (jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) - 0.5)


def rand_saturation(x, key):
    mean = x.mean(axis=-1, keepdims=True)
    mag = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) * 2.0
    return (x - mean) * mag + mean


def rand_contrast(x, key):
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    mag = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - mean) * mag + mean


def rand_translation(x, key, ratio: float = 0.125):
    """Random per-sample integer shift with zero padding, via gather."""
    b, h, w, c = x.shape
    kh, kw = jax.random.split(key)
    sh = int(h * ratio + 0.5)
    sw = int(w * ratio + 0.5)
    ty = jax.random.randint(kh, (b, 1, 1), -sh, sh + 1)
    tx = jax.random.randint(kw, (b, 1, 1), -sw, sw + 1)
    grid_y = jnp.arange(h)[None, :, None] + ty  # (B, H, 1)
    grid_x = jnp.arange(w)[None, None, :] + tx  # (B, 1, W)
    valid = (
        (grid_y >= 0) & (grid_y < h) & (grid_x >= 0) & (grid_x < w)
    )  # (B, H, W)
    gy = jnp.clip(grid_y, 0, h - 1)
    gx = jnp.clip(grid_x, 0, w - 1)
    out = jnp.take_along_axis(
        x, jnp.broadcast_to(gy[..., None], (b, h, w, c)), axis=1
    )
    out = jnp.take_along_axis(
        out, jnp.broadcast_to(gx[..., None], (b, h, w, c)), axis=2
    )
    return out * valid[..., None].astype(x.dtype)


def rand_cutout(x, key, ratio: float = 0.2):
    # ratio 0.2: this fork's value (exp/cips3d/models/diffaug.py:67), not the
    # published DiffAugment default of 0.5 — training-dynamics parity.
    b, h, w, _ = x.shape
    kh, kw = jax.random.split(key)
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    oy = jax.random.randint(kh, (b, 1, 1), 0, h + (1 - ch % 2))
    ox = jax.random.randint(kw, (b, 1, 1), 0, w + (1 - cw % 2))
    gy = jnp.arange(h)[None, :, None]
    gx = jnp.arange(w)[None, None, :]
    inside = (
        (gy >= oy - ch // 2)
        & (gy < oy + ch - ch // 2)
        & (gx >= ox - cw // 2)
        & (gx < ox + cw - cw // 2)
    )
    return x * (1.0 - inside[..., None].astype(x.dtype))


def diff_augment(x, key, policy: str = "color,translation,cutout"):
    fns = {
        "color": [rand_brightness, rand_saturation, rand_contrast],
        "translation": [rand_translation],
        "cutout": [rand_cutout],
    }
    for p in policy.split(","):
        for f in fns[p]:
            key, sub = jax.random.split(key)
            x = f(x, sub)
    return x
