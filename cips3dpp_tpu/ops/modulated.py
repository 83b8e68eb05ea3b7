"""Style-modulated convolutions, MXU-shaped.

The reference ModulatedConv2d (exp/cips3d/models/model_v3.py:218-314) builds a
per-sample weight `w_b = scale * W * style_b`, optionally demodulates it, then
runs a grouped conv with groups=batch. The v10 flagship decoder uses
kernel_size=1 everywhere, for which the reference switches to a bmm fast path
(model_v3.py:302-306). On TPU that per-pixel matmul IS the natural form:
an (HW, Cin) x (Cin, Cout) contraction that tiles straight onto the MXU, so
the 1x1 path here is a batched einsum, and k>1 falls back to a grouped
`lax.conv_general_dilated` (NHWC).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def modulate_weights_1x1(
    weight: jnp.ndarray,  # (Cin, Cout) base weight
    style: jnp.ndarray,  # (B, Cin) modulation (EqualLinear output, bias_init=1)
    demodulate: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """Per-sample modulated 1x1 weights: (B, Cin, Cout).

    Mirrors model_v3.py:264-277 for kernel_size=1: w = scale * W * s_in, then
    demod over the input axis: w /= sqrt(sum_in w^2 + 1e-8) per out channel.
    """
    cin, cout = weight.shape
    if scale is None:
        scale = 1.0 / (cin**0.5)
    w = scale * weight[None, :, :] * style[:, :, None]  # (B, Cin, Cout)
    if demodulate:
        demod = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=1, keepdims=True) + 1e-8)
        w = w * demod
    return w


def modulated_matmul(
    x: jnp.ndarray,  # (B, N, Cin) pixels as rows
    weight: jnp.ndarray,  # (Cin, Cout)
    style: jnp.ndarray,  # (B, Cin)
    demodulate: bool = True,
    preferred_dtype=jnp.float32,
) -> jnp.ndarray:
    """1x1 modulated conv as a batched matmul (B, N, Cout)."""
    w = modulate_weights_1x1(weight, style, demodulate=demodulate)
    return jnp.einsum(
        "bnc,bco->bno", x, w.astype(x.dtype), preferred_element_type=preferred_dtype
    ).astype(x.dtype)


def _modulate_weights_kxk(
    weight: jnp.ndarray,  # (kh, kw, Cin, Cout)
    style: jnp.ndarray,  # (B, Cin)
    demodulate: bool,
) -> jnp.ndarray:
    kh, kw, cin, cout = weight.shape
    scale = 1.0 / ((cin * kh * kw) ** 0.5)
    w = scale * weight[None] * style[:, None, None, :, None]  # (B, kh, kw, Cin, Cout)
    if demodulate:
        demod = jax.lax.rsqrt(
            jnp.sum(jnp.square(w), axis=(1, 2, 3), keepdims=True) + 1e-8
        )
        w = w * demod
    return w


def modulated_conv2d(
    x: jnp.ndarray,  # (B, H, W, Cin)
    weight: jnp.ndarray,  # (kh, kw, Cin, Cout)
    style: jnp.ndarray,  # (B, Cin)
    demodulate: bool = True,
    padding: str | tuple = "SAME",
) -> jnp.ndarray:
    """General k x k modulated conv via groups=batch (model_v3.py:308-312)."""
    b, h, w_sp, cin = x.shape
    kh, kw, _, cout = weight.shape
    wmod = _modulate_weights_kxk(weight, style, demodulate)  # (B,kh,kw,Cin,Cout)
    # Grouped conv: lhs (1,H,W,B*Cin), rhs (kh,kw,Cin,B*Cout) grouped by batch.
    lhs = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w_sp, b * cin)
    rhs = jnp.transpose(wmod, (1, 2, 3, 0, 4)).reshape(kh, kw, cin, b * cout)
    if isinstance(padding, str):
        pad = padding
    else:
        pad = (padding, padding) if isinstance(padding[0], int) else padding
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs.astype(x.dtype),
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b,
    )
    _, oh, ow, _ = out.shape
    out = out.reshape(oh, ow, b, cout).transpose(2, 0, 1, 3)
    return out
