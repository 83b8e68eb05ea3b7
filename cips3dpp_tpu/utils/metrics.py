"""Image quality metrics in pure jnp (the reference pulls skimage + lpips,
projector_v10.py:1266-1275; here PSNR/SSIM are self-contained and LPIPS-style
perceptual distance lives in models/vgg.py with pluggable weights)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """Peak SNR; default data_range=2 for [-1, 1] images."""
    mse = jnp.mean(jnp.square(a - b))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 2.0,
    size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over an NHWC batch (standard Wang et al. constants)."""
    if a.ndim == 3:
        a, b = a[None], b[None]
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    k = _gaussian_kernel(size, sigma)
    ch = a.shape[-1]
    rhs = jnp.broadcast_to(k[:, :, None, None], (size, size, 1, ch)).astype(a.dtype)

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, rhs, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch,
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den)
