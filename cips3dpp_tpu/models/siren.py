"""FiLM-SIREN MLP — the NeRF backbone network.

Behavioural contract: exp/cips3d/volume_renderer.py:14-160 (LinearLayer,
FiLMSiren, SirenGenerator). A stack of sine layers whose frequency (gamma)
and phase (beta) are style-modulated, a linear SDF head after the point
stack, and a view-conditioned final sine layer feeding linear RGB / feature
heads.

TPU notes: all layers are (N, C) x (C, C') matmuls over the flattened
ray x sample axis — MXU-shaped by construction. The whole stack evaluates
~24 samples x 64^2 rays x 256 channels per image; keeping it as large batched
matmuls is the speed-of-light layout, no kernel fission needed.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import uniform_bound, kaiming_normal_leaky


def _siren_uniform(bound_fn):
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        b = bound_fn(fan_in)
        return jax.random.uniform(key, shape, dtype, -b, b)

    return init


class SirenLinear(nn.Module):
    """SIREN linear with affine-scaled output: y = std*(xW+b) + shift
    (volume_renderer.py:15-35). init: 'first' U(+-1/in), 'freq'
    U(+-sqrt(6/in)/25), else 0.25*kaiming_normal."""

    out_dim: int
    std: float = 1.0
    shift: float = 0.0
    init: str = "kaiming"  # kaiming | first | freq

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        if self.init == "first":
            w_init = _siren_uniform(lambda n: 1.0 / n)
        elif self.init == "freq":
            w_init = _siren_uniform(lambda n: np.sqrt(6.0 / n) / 25.0)
        else:
            w_init = kaiming_normal_leaky(0.2, 0.25)
        w = self.param("weight", w_init, (in_dim, self.out_dim))
        b = self.param("bias", uniform_bound(np.sqrt(1.0 / in_dim)), (self.out_dim,))
        y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype) + b
        return self.std * y + self.shift


class FiLMSiren(nn.Module):
    """sin(gamma(w) * (xW + b) + beta(w)) (volume_renderer.py:39-85).

    gamma head: 15*linear + 30 (so freq ~ N(30, 15*sigma)); beta: 0.25*linear.
    """

    out_dim: int
    is_first: bool = False

    @nn.compact
    def __call__(self, x, style):
        in_dim = x.shape[-1]
        if self.is_first:
            w_init = _siren_uniform(lambda n: 1.0 / 3.0)
        else:
            w_init = _siren_uniform(lambda n: np.sqrt(6.0 / n) / 25.0)
        w = self.param("weight", w_init, (in_dim, self.out_dim))
        b = self.param("bias", uniform_bound(np.sqrt(1.0 / in_dim)), (self.out_dim,))
        # Matmul inputs may be bf16 (storage/HBM halved, MXU rate doubled)
        # but the accumulation and the whole phase computation stay fp32:
        # sin() with gamma ~ 30 would lose phase accuracy in bf16.
        lin = jnp.dot(
            x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ) + b

        gamma = SirenLinear(self.out_dim, std=15.0, shift=30.0, name="gamma")(style)
        beta = SirenLinear(self.out_dim, std=0.25, shift=0.0, name="beta")(style)
        # style is (B, style_dim); lin is (B, ..., out) — broadcast over the
        # ray/sample axes (volume_renderer.py:76-82).
        extra = lin.ndim - gamma.ndim
        gamma = gamma.reshape(gamma.shape[:1] + (1,) * extra + gamma.shape[1:])
        beta = beta.reshape(beta.shape[:1] + (1,) * extra + beta.shape[1:])
        return jnp.sin(gamma * lin + beta).astype(x.dtype)


class SirenGenerator(nn.Module):
    """Point MLP: D FiLM-SIREN layers -> sdf head; +viewdirs -> final
    FiLM-SIREN -> features -> rgb head (volume_renderer.py:89-160).

    styles: (B, D+1, style_dim) — one style per pts layer plus one for the
    view layer. Inputs x = concat(pts, viewdirs): (B, ..., 3+3).
    """

    depth: int = 8
    width: int = 256
    input_ch: int = 3
    view_ch: int = 3

    @nn.compact
    def __call__(self, x, styles):
        pts = x[..., : self.input_ch]
        views = x[..., self.input_ch : self.input_ch + self.view_ch]

        h = FiLMSiren(self.width, is_first=True, name="pts_0")(pts, styles[:, 0])
        for i in range(1, self.depth):
            h = FiLMSiren(self.width, name=f"pts_{i}")(h, styles[:, i])

        sdf = SirenLinear(1, init="freq", name="sigma_head")(h)

        h = jnp.concatenate([h, views], axis=-1)
        features = FiLMSiren(self.width, name="views")(h, styles[:, -1])
        rgb = SirenLinear(3, init="freq", name="rgb_head")(features)

        return rgb, sdf, features
