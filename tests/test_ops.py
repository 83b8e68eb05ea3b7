"""Kernel parity tests: ops vs independent numpy oracles.

Mirrors the reference's implicit-oracle strategy (its CPU fallbacks defined
the CUDA kernels' semantics, exp/op/fused_act.py:104-119,
exp/op/upfirdn2d.py:160-201) — here the oracles are naive numpy loops.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cips3dpp_tpu.ops import (
    fused_leaky_relu,
    upfirdn2d,
    make_blur_kernel,
    upsample2x,
    downsample2x,
    modulated_matmul,
    modulated_conv2d,
)


def np_upfirdn2d(x_nhwc, kernel, up, down, pad0, pad1):
    """Naive oracle: zero-stuff AFTER each sample, pad, true-convolve, decimate."""
    b, h, w, c = x_nhwc.shape
    kh, kw = kernel.shape
    up_h = np.zeros((b, h * up, w * up, c), x_nhwc.dtype)
    up_h[:, ::up, ::up, :] = x_nhwc
    padded = np.pad(up_h, ((0, 0), (pad0, pad1), (pad0, pad1), (0, 0)))
    kf = kernel[::-1, ::-1]
    oh = (h * up + pad0 + pad1 - kh) // down + 1
    ow = (w * up + pad0 + pad1 - kw) // down + 1
    out = np.zeros((b, oh, ow, c), x_nhwc.dtype)
    for i in range(oh):
        for j in range(ow):
            patch = padded[:, i * down : i * down + kh, j * down : j * down + kw, :]
            out[:, i, j, :] = np.einsum("bhwc,hw->bc", patch, kf)
    return out


@pytest.mark.parametrize(
    "up,down,pad",
    [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (2, 1)), (2, 1, (2, 2)), (1, 2, (1, 2))],
)
def test_upfirdn2d_matches_naive(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    k = np.asarray(make_blur_kernel((1, 3, 3, 1)))
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad))
    want = np_upfirdn2d(x, k, up, down, pad[0], pad[1])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample_downsample_shapes():
    x = jnp.ones((1, 16, 16, 4))
    assert upsample2x(x).shape == (1, 32, 32, 4)
    assert downsample2x(x).shape == (1, 8, 8, 4)


def test_upsample2x_separable_matches_conv_path():
    """The shift-add fast path must equal the generic upfirdn conv path."""
    from cips3dpp_tpu.ops.upfirdn2d import make_blur_kernel, upfirdn2d

    x = jnp.asarray(np.random.RandomState(3).randn(2, 9, 7, 5), jnp.float32)
    got = upsample2x(x)  # separable fast path (4-tap kernel)
    k = make_blur_kernel((1, 3, 3, 1), upsample_factor=2)
    want = upfirdn2d(x, k, up=2, down=1, pad=(2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_upsample_preserves_dc():
    # The x4 kernel gain makes a constant image stay constant under 2x up.
    x = jnp.full((1, 8, 8, 1), 3.0)
    y = upsample2x(x)
    np.testing.assert_allclose(np.asarray(y[0, 2:-2, 2:-2, 0]), 3.0, atol=1e-5)


def test_fused_leaky_relu():
    x = jnp.asarray([[-1.0, 0.5], [2.0, -3.0]])
    b = jnp.asarray([0.5, -0.5])
    got = fused_leaky_relu(x, b)
    xb = np.asarray(x) + np.asarray(b)[None, :]
    want = np.where(xb >= 0, xb, 0.2 * xb) * np.sqrt(2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_fused_leaky_relu_double_grad():
    # R1 / path-length regularisers differentiate twice through this op
    # (exp/stylesdf/losses.py:34-69).
    f = lambda x: jnp.sum(fused_leaky_relu(x, jnp.asarray([0.1])) ** 2)
    g = jax.grad(f)
    h = jax.grad(lambda x: jnp.sum(g(x) ** 2))
    out = h(jnp.asarray([[0.3], [-0.2]]))
    assert out.shape == (2, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_modulated_matmul_demod_unit_norm():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (16, 8))
    style = jax.random.normal(jax.random.PRNGKey(1), (2, 16)) + 1.0
    from cips3dpp_tpu.ops import modulate_weights_1x1

    wm = modulate_weights_1x1(w, style, demodulate=True)
    norms = jnp.sqrt(jnp.sum(wm**2, axis=1))
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-3)


def test_modulated_matmul_equals_conv1x1():
    # The bmm fast path (model_v3.py:302-306) must agree with the grouped
    # conv path for kernel_size=1.
    key = jax.random.PRNGKey(2)
    b, h, w_sp, cin, cout = 2, 4, 4, 8, 16
    x = jax.random.normal(key, (b, h, w_sp, cin))
    weight = jax.random.normal(jax.random.PRNGKey(3), (cin, cout))
    style = jax.random.normal(jax.random.PRNGKey(4), (b, cin))
    via_mm = modulated_matmul(x.reshape(b, -1, cin), weight, style).reshape(
        b, h, w_sp, cout
    )
    via_conv = modulated_conv2d(x, weight.reshape(1, 1, cin, cout), style)
    np.testing.assert_allclose(
        np.asarray(via_mm), np.asarray(via_conv), atol=2e-5, rtol=1e-4
    )
