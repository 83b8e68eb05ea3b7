"""GAN + geometry losses.

Behavioural contract: exp/stylesdf/losses.py:7-69. All are pure functions;
the grad-through-grad ones (R1, path length) take the function to
differentiate, expressed with jax.grad/vjp instead of torch autograd.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def d_logistic_loss(real_pred, fake_pred):
    """softplus(-real) + softplus(fake) (losses.py:27-31)."""
    return jax.nn.softplus(-real_pred).mean() + jax.nn.softplus(fake_pred).mean()


def g_nonsaturating_loss(fake_pred):
    """softplus(-fake) (losses.py:43-46)."""
    return jax.nn.softplus(-fake_pred).mean()


def r1_penalty(d_fn, real_imgs):
    """sum-of-squares of d(d_fn)/d(real) per sample, meaned (losses.py:34-40).

    d_fn: imgs -> logits (params closed over). Differentiable again wrt the
    discriminator params (grad-of-grad), which the D update needs."""
    grad = jax.grad(lambda x: d_fn(x).sum())(real_imgs)
    return jnp.square(grad).reshape(grad.shape[0], -1).sum(axis=1).mean()


def eikonal_loss(eikonal_term):
    """(|grad sdf| - 1)^2 (losses.py:13-18)."""
    return jnp.square(jnp.linalg.norm(eikonal_term, axis=-1) - 1.0).mean()


def minimal_surface_loss(sdf, beta: float = 100.0):
    """exp(-beta * |sdf|) (losses.py:20-24)."""
    return jnp.exp(-beta * jnp.abs(sdf)).mean()


def viewpoint_loss(pred, target):
    """smooth-L1 / Huber(beta=1) on (azim, elev) (losses.py:7-10)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5).mean()


def path_length_penalty(fake_img, latents_grad, mean_path_length, decay=0.01):
    """StyleGAN2 perceptual path-length regulariser (losses.py:49-69).

    latents_grad: d(sum(fake*noise))/d(style_decoder), (B, L, D), computed by
    the caller via jax.grad (the reference calls autograd.grad).
    Returns (penalty, new_mean_path_length, path_lengths)."""
    path_lengths = jnp.sqrt(
        jnp.square(latents_grad).sum(axis=2).mean(axis=1)
    )  # (B,)
    path_mean = mean_path_length + decay * (path_lengths.mean() - mean_path_length)
    penalty = jnp.square(path_lengths - path_mean).mean()
    return penalty, jax.lax.stop_gradient(path_mean), path_lengths


def path_noise(key, fake_img):
    """randn / sqrt(H*W) image-shaped noise (losses.py:53-55), NHWC."""
    b, h, w, c = fake_img.shape
    return jax.random.normal(key, fake_img.shape, fake_img.dtype) / math.sqrt(h * w)
