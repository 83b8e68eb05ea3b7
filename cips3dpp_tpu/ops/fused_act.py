"""Fused bias + leaky-ReLU (+ gain) — the StyleGAN2 `fused_bias_act` op.

Semantics (defined by the reference CPU fallback, exp/op/fused_act.py:104-119):

    y = leaky_relu(x + bias, negative_slope) * scale

`bias` broadcasts over the channel axis. The reference ships a CUDA kernel
with hand-written grad and grad-grad paths because R1/path-length
regularisation differentiate twice through it; in JAX the expression is a
composition of primitives that XLA fuses into the producing matmul/conv, and
`jax.grad(jax.grad(...))` works natively, so no custom VJP is required for
correctness. The op stays a single function so a Pallas kernel can be swapped
in behind the same signature.
"""

from __future__ import annotations

import jax.numpy as jnp

SQRT2 = 1.4142135623730951


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = SQRT2,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """y = leaky_relu(x + bias) * scale, bias broadcast along `channel_axis`.

    The reference broadcasts the 1-D bias over dim=1 of an NCHW tensor
    (exp/op/fused_act.py:106-110); this framework is NHWC/channel-last, so the
    default channel axis is -1.
    """
    if bias is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = bias.shape[0]
        # keep the compute dtype: fp32 bias must not upcast bf16 activations
        x = x + bias.reshape(shape).astype(x.dtype)
    y = jnp.where(x >= 0, x, x * negative_slope)
    if scale != 1.0:
        y = y * scale
    return y
