"""Pallas kernel parity tests (interpret mode on CPU) vs jnp oracles —
the reference's CPU-fallback-as-oracle pattern (SURVEY.md §4.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cips3dpp_tpu.kernels.siren_render import (
    siren_render_fused,
    siren_render_reference,
    _pack_siren_params,
)


def _make_renderer_params(key, width=256):
    """Random params in the renderer tree layout (depth-2 flagship)."""
    ks = jax.random.split(key, 32)
    i = iter(range(32))

    def lin(k1, k2, din, dout, s=0.05):
        return {
            "weight": s * jax.random.normal(k1, (din, dout)),
            "bias": 0.1 * jax.random.normal(k2, (dout,)),
        }

    def film(din, dout, sd=256):
        return {
            **lin(ks[next(i)], ks[next(i)], din, dout),
            "gamma": lin(ks[next(i)], ks[next(i)], sd, dout, s=0.02),
            "beta": lin(ks[next(i)], ks[next(i)], sd, dout, s=0.02),
        }

    net = {
        "pts_0": film(3, width),
        "pts_1": film(width, width),
        "views": film(width + 3, width),
        "sigma_head": lin(ks[next(i)], ks[next(i)], width, 1),
        "rgb_head": lin(ks[next(i)], ks[next(i)], width, 3),
    }
    return {"sigmoid_beta": jnp.asarray([0.1]), "network": net}


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = _make_renderer_params(key, width=128)
    r, s = 512, 24
    styles = jax.random.normal(jax.random.PRNGKey(1), (3, 256))
    pts = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (r, s, 3))
    viewdirs = jax.random.normal(jax.random.PRNGKey(3), (r, 3))
    viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
    z_base = jnp.linspace(0.88, 1.12, s)
    z_vals = jnp.broadcast_to(z_base, (r, s)) + 0.001 * jax.random.normal(
        jax.random.PRNGKey(4), (r, 1)
    )
    rays_d = viewdirs * 1.05
    near = jnp.asarray(0.88)
    far = jnp.asarray(1.12)
    return params, styles, pts, viewdirs, z_vals, rays_d, near, far


def test_fast_sin_minimax_degrees():
    """Range-reduced polynomial sin at both degrees: 9 (default, 8e-6) and
    the SIN_DEGREE=7 serving option (2.5e-4 — still an order below bf16
    activation noise). Domain covers SIREN phases (gamma ~ 30)."""
    import cips3dpp_tpu.kernels.siren_render as sr

    x = jnp.linspace(-40.0, 40.0, 200_001)
    ref = np.sin(np.asarray(x, np.float64))
    assert sr.SIN_DEGREE == 9
    err9 = np.abs(np.asarray(sr.fast_sin(x), np.float64) - ref).max()
    assert err9 < 2e-5
    try:
        sr.SIN_DEGREE = 7
        err7 = np.abs(np.asarray(sr.fast_sin(x), np.float64) - ref).max()
    finally:
        sr.SIN_DEGREE = 9
    assert err7 < 3.5e-4
    assert err7 > err9  # distinct code paths actually taken


def test_fused_matches_reference_interpret(setup):
    params, styles, pts, viewdirs, z_vals, rays_d, near, far = setup
    ref = siren_render_reference(
        params, styles, pts, viewdirs, z_vals, rays_d, near, far
    )
    fused = siren_render_fused(
        params, styles, pts, viewdirs, z_vals, rays_d, near, far,
        ray_tile=128, interpret=True,
    )
    names = ["thumb", "feat", "sdf", "mask_depth", "xyz"]
    # sin(gamma~30 * x) amplifies bf16 rounding: raw per-sample features are
    # the most sensitive output; the composited image values match tightly.
    atol = {"thumb": 2e-2, "feat": 1.5e-1, "sdf": 2e-2, "mask_depth": 2e-2,
            "xyz": 2e-2}
    for name, a, b in zip(names, ref, fused):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, (name, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=atol[name], err_msg=name)


def test_fused_packing_shapes(setup):
    params, styles, *_ = setup
    w = _pack_siren_params(params["network"], styles)
    assert w[0].shape == (3, 128)  # w0
    assert w[1].shape == (1, 128)  # gamma0
    assert w[2].shape == (1, 128)  # beff0 = g*b + beta
    assert w[6].shape == (128, 128)  # view layer weight, h rows
    assert w[7].shape == (3, 128)  # view layer weight, view rows
    assert w[10].shape == (128, 1)  # sdf head
    assert w[12].shape == (128, 3)  # rgb head


def test_decoder_block_fused_matches_reference():
    from cips3dpp_tpu.kernels.decoder_block import (
        decoder_block_fused,
        decoder_block_reference,
    )

    key = jax.random.PRNGKey(0)
    hp, wp, c = 32, 16, 32
    ks = jax.random.split(key, 10)
    y1 = jax.random.normal(ks[0], (hp, wp, c))
    skip = jax.random.normal(ks[1], (hp, wp, 3))
    n1 = jax.random.normal(ks[2], (2 * hp, 2 * wp, 1))
    n2 = jax.random.normal(ks[3], (2 * hp, 2 * wp, 1))
    w2 = 0.1 * jax.random.normal(ks[4], (c, c))
    wrgb = 0.1 * jax.random.normal(ks[5], (c, 3))
    b1 = 0.1 * jax.random.normal(ks[6], (c,))
    b2 = 0.1 * jax.random.normal(ks[7], (c,))
    brgb = 0.1 * jax.random.normal(ks[8], (3,))
    nw1 = jnp.asarray(0.3)
    nw2 = jnp.asarray(0.2)

    ref_f, ref_rgb = decoder_block_reference(
        y1, skip, n1, n2, w2, wrgb, b1, b2, brgb, nw1, nw2
    )
    fus_f, fus_rgb = decoder_block_fused(
        y1, skip, n1, n2, w2, wrgb, b1, b2, brgb, nw1, nw2,
        t_rows=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(ref_f), np.asarray(fus_f), atol=2e-3, err_msg="feat"
    )
    np.testing.assert_allclose(
        np.asarray(ref_rgb), np.asarray(fus_rgb), atol=2e-3, err_msg="rgb"
    )


def test_siren_render_custom_vjp(setup):
    """Fused forward + XLA backward: grads flow to styles and params and
    match pure-reference grads."""
    from cips3dpp_tpu.kernels.siren_render import (
        siren_render,
        siren_render_reference,
    )

    params, styles, pts, viewdirs, z_vals, rays_d, near, far = setup

    def loss_fused(styles, params):
        out = siren_render(params, styles, pts, viewdirs, z_vals, rays_d,
                           near, far)
        return jnp.mean(jnp.square(out[0])) + jnp.mean(out[1])

    def loss_ref(styles, params):
        out = siren_render_reference(params, styles, pts, viewdirs, z_vals,
                                     rays_d, near, far)
        return jnp.mean(jnp.square(out[0])) + jnp.mean(out[1])

    # interpret-mode pallas inside grad on CPU: wrap fused fwd in interpret
    import cips3dpp_tpu.kernels.siren_render as K
    import functools

    orig = K.siren_render_fused
    K.siren_render_fused = functools.partial(orig, ray_tile=128, interpret=True)
    try:
        g_fused = jax.grad(loss_fused, argnums=(0, 1))(styles, params)
    finally:
        K.siren_render_fused = orig
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(styles, params)

    # grads agree up to the forward-value delta (the loss cotangent is
    # computed from the kernel's output; backward replays the reference)
    np.testing.assert_allclose(
        np.asarray(g_fused[0]), np.asarray(g_ref[0]), atol=3e-2
    )
    leaves_f = jax.tree.leaves(g_fused[1])
    leaves_r = jax.tree.leaves(g_ref[1])
    for a, b in zip(leaves_f, leaves_r):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        # relative check with a small absolute floor: the cotangent comes
        # from the kernel's forward (bf16-rounded, gamma folded into the
        # weights), so near-zero-grad leaves see O(forward-delta) absolute
        # noise that a pure relative bound over-penalises
        denom = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() < 0.1 * denom + 2.5e-3


@pytest.mark.parametrize("c", [32, 64, 128])
def test_decoder_block_packed_parity(c):
    """Packed-lane decoder block kernel (interpret mode) vs jnp oracle —
    the narrow-channel (C=32/64) layout is the round-2 unblock."""
    from cips3dpp_tpu.kernels.decoder_block import (
        decoder_block_packed,
        decoder_block_packed_reference,
    )

    hp = wp = 16
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 6)
    y1 = jax.random.normal(ks[0], (hp, wp, c))
    noise1 = jax.random.normal(ks[1], (2 * hp, 2 * wp, 1))
    noise2 = jax.random.normal(ks[2], (2 * hp, 2 * wp, 1))
    w2 = jax.random.normal(ks[3], (c, c)) / np.sqrt(c)
    b1 = jax.random.normal(ks[4], (c,)) * 0.1
    b2 = jax.random.normal(ks[5], (c,)) * 0.1

    out = decoder_block_packed(
        y1, noise1, noise2, w2, b1, b2, 0.3, -0.2,
        t_rows=8, interpret=True,
    )
    ref = decoder_block_packed_reference(
        y1, noise1, noise2, w2, b1, b2, 0.3, -0.2
    )
    assert out.shape == (2 * hp, 2 * wp, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)
    # upsample/noise/bias path must be exact (fp32 end-to-end): zero conv
    zero = decoder_block_packed(
        y1, noise1, noise2, jnp.zeros((c, c)), b1, jnp.zeros((c,)),
        0.3, 0.0, t_rows=8, interpret=True,
    )
    zref = decoder_block_packed_reference(
        y1, noise1, noise2, jnp.zeros((c, c)), b1, jnp.zeros((c,)), 0.3, 0.0
    )
    np.testing.assert_allclose(np.asarray(zero), np.asarray(zref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("c", [32, 128])
def test_decoder_block_packed_rgb_fold(c):
    """ToRGB folded into the packed kernel: (feat, rgb) vs the jnp block
    oracle, and the final-block mode (emit_feat=False) must return the
    identical rgb with the feature store elided."""
    from cips3dpp_tpu.kernels.decoder_block import (
        decoder_block_packed,
        decoder_block_reference,
    )

    hp = wp = 16
    ks = jax.random.split(jax.random.PRNGKey(42), 7)
    y1 = jax.random.normal(ks[0], (hp, wp, c))
    noise1 = jax.random.normal(ks[1], (2 * hp, 2 * wp, 1))
    noise2 = jax.random.normal(ks[2], (2 * hp, 2 * wp, 1))
    w2 = jax.random.normal(ks[3], (c, c)) / np.sqrt(c)
    b1 = jax.random.normal(ks[4], (c,)) * 0.1
    b2 = jax.random.normal(ks[5], (c,)) * 0.1
    wrgb = jax.random.normal(ks[6], (c, 3)) / np.sqrt(c)
    zero3 = jnp.zeros((3,))
    zskip = jnp.zeros((hp, wp, 3))

    feat, rgb = decoder_block_packed(
        y1, noise1, noise2, w2, b1, b2, 0.3, -0.2, wrgb=wrgb,
        t_rows=8, interpret=True,
        out_dtype=jnp.bfloat16, rgb_dtype=jnp.bfloat16,
        colup_dtype=jnp.bfloat16,
    )
    # oracle: upsample fp32 (colup bf16 rounding covered by tolerance)
    feat_ref, rgb_ref = decoder_block_reference(
        y1, zskip, noise1, noise2, w2, wrgb, b1, b2, zero3, 0.3, -0.2
    )
    # the oracle's rgb includes the (zero) skip upsample, which is exact
    assert feat.shape == (2 * hp, 2 * wp, c)
    assert rgb.shape == (2 * hp, 2 * wp, 3)
    np.testing.assert_allclose(
        np.asarray(feat, np.float32), np.asarray(feat_ref),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(rgb_ref), rtol=5e-2, atol=5e-2
    )

    rgb_only = decoder_block_packed(
        y1, noise1, noise2, w2, b1, b2, 0.3, -0.2, wrgb=wrgb,
        t_rows=8, interpret=True,
        out_dtype=jnp.bfloat16, rgb_dtype=jnp.bfloat16,
        colup_dtype=jnp.bfloat16, emit_feat=False,
    )
    np.testing.assert_array_equal(np.asarray(rgb_only), np.asarray(rgb))

    # the dense-lane RGBx store (auto above when widths divide) must match
    # the padded (rows, 3P) store to dot-accumulation-order rounding (same
    # products, same K length; the different N dim may reassociate the
    # K loop -> last-ULP fp32 differences, measured max 7e-7)
    _, rgb_pad = decoder_block_packed(
        y1, noise1, noise2, w2, b1, b2, 0.3, -0.2, wrgb=wrgb,
        t_rows=8, interpret=True,
        out_dtype=jnp.bfloat16, rgb_dtype=jnp.bfloat16,
        colup_dtype=jnp.bfloat16, rgb_pack="pad",
    )
    np.testing.assert_allclose(
        np.asarray(rgb_pad), np.asarray(rgb), rtol=0, atol=5e-6
    )


def test_decoder_block_packed_hash_noise():
    """In-kernel hash noise (serving): the kernel with noise_seeds must
    equal the kernel fed the SAME realization as explicit buffers
    (hash_noise_map is the jnp oracle of the in-kernel generator), and the
    realization must be sane N(0,1)."""
    from cips3dpp_tpu.kernels.decoder_block import (
        decoder_block_packed,
        hash_noise_map,
    )

    c, hp, wp = 32, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    y1 = jax.random.normal(ks[0], (hp, wp, c))
    w2 = jax.random.normal(ks[1], (c, c)) / np.sqrt(c)
    b1 = jax.random.normal(ks[2], (c,)) * 0.1
    b2 = jax.random.normal(ks[3], (c,)) * 0.1
    seeds = jnp.asarray([123, 456], jnp.uint32)
    n1 = hash_noise_map(2 * hp, 2 * wp, seeds[0])
    n2 = hash_noise_map(2 * hp, 2 * wp, seeds[1])

    # statistics of the hash realization at scale
    big = np.asarray(hash_noise_map(256, 256, jnp.uint32(9)))
    assert abs(big.mean()) < 0.02 and abs(big.std() - 1.0) < 0.02
    # rows decorrelated
    flat = big.reshape(256, 256)
    corr = np.corrcoef(flat[:-1].ravel(), flat[1:].ravel())[0, 1]
    assert abs(corr) < 0.02

    out_hash = decoder_block_packed(
        y1, None, None, w2, b1, b2, 0.3, -0.2, noise_seeds=seeds,
        t_rows=8, interpret=True,
    )
    out_buf = decoder_block_packed(
        y1, n1, n2, w2, b1, b2, 0.3, -0.2,
        t_rows=8, interpret=True,
    )
    # same realization up to cross-program FMA-contraction noise (XLA may
    # fuse a*b+c differently in separately compiled programs)
    np.testing.assert_allclose(
        np.asarray(out_hash), np.asarray(out_buf), rtol=0, atol=5e-3
    )


def test_decoder_fused_apply_noise_seed():
    """Seed-driven decoder == buffer-driven decoder when the buffers are
    the seed's own hash realization (layer_seed contract)."""
    from cips3dpp_tpu.models.decoder import Decoder
    from cips3dpp_tpu.kernels.decoder_fused import decoder_fused_apply
    from cips3dpp_tpu.kernels.decoder_block import (
        hash_noise_map,
        layer_seed,
    )

    dec = Decoder(
        size_start=4, size_end=1024, in_channel=64, channel_multiplier=2,
        kernel_size=1, upsample_list=(128, 256, 512, 1024),
    )
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 64))
    styles = jax.random.normal(jax.random.PRNGKey(2), (1, dec.n_latent, 512))
    ref_noise = dec.make_noise(jax.random.PRNGKey(3), 8)
    variables = dec.init(key, feats, styles, ref_noise)

    seed = 42
    bufs = [
        hash_noise_map(s[1], s[2], layer_seed(seed, i))[None]
        for i, s in enumerate(dec.noise_shapes(8))
    ]
    out_seed = decoder_fused_apply(
        variables["params"], feats, styles, None,
        upsample_list=(128, 256, 512, 1024),
        dtype=jnp.float32, interpret=True, noise_seed=seed,
    )
    out_bufs = decoder_fused_apply(
        variables["params"], feats, styles, bufs,
        upsample_list=(128, 256, 512, 1024),
        dtype=jnp.float32, interpret=True,
    )
    # same realization up to cross-program FMA-contraction noise
    np.testing.assert_allclose(
        np.asarray(out_seed), np.asarray(out_bufs), rtol=0, atol=1e-2
    )


def test_decoder_fused_apply_parity():
    """Full fused serving decoder (interpret mode) vs the flax Decoder on
    the real flagship channel schedule at 1/8 spatial size."""
    from cips3dpp_tpu.models.decoder import Decoder
    from cips3dpp_tpu.kernels.decoder_fused import decoder_fused_apply

    dec = Decoder(
        size_start=4, size_end=1024, in_channel=64, channel_multiplier=2,
        kernel_size=1, upsample_list=(128, 256, 512, 1024),
    )
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 64))
    styles = jax.random.normal(jax.random.PRNGKey(2), (1, dec.n_latent, 512))
    noise = dec.make_noise(jax.random.PRNGKey(3), 8)
    variables = dec.init(key, feats, styles, noise)

    ref = dec.apply(variables, feats, styles, noise)
    out = decoder_fused_apply(
        variables["params"], feats, styles, noise,
        upsample_list=(128, 256, 512, 1024),
        dtype=jnp.float32, interpret=True,
    )
    assert out.shape == ref.shape == (1, 128, 128, 3)
    # conv2-of-upsample-blocks rounds to bf16 inside the kernel; everything
    # else is fp32 — tolerances sized to the bf16 matmul noise
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-2
    )
    err = np.abs(np.asarray(out) - np.asarray(ref))
    # median error stays at the bf16-rounding scale (the fp32-path flax
    # reference has no bf16 rounding on CPU; on TPU both paths round)
    assert float(np.median(err)) < 1.5e-2


def test_decoder_fused_apply_fuse_res_subset():
    """fuse_res moves the XLA/kernel boundary only: a narrow-only subset
    (kernel for the late blocks, XLA math for the wide ones) must match the
    flax Decoder exactly as tightly as fuse-everything."""
    from cips3dpp_tpu.models.decoder import Decoder
    from cips3dpp_tpu.kernels.decoder_fused import decoder_fused_apply

    dec = Decoder(
        size_start=4, size_end=1024, in_channel=64, channel_multiplier=2,
        kernel_size=1, upsample_list=(128, 256, 512, 1024),
    )
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 64))
    styles = jax.random.normal(jax.random.PRNGKey(2), (1, dec.n_latent, 512))
    noise = dec.make_noise(jax.random.PRNGKey(3), 8)
    variables = dec.init(key, feats, styles, noise)
    ref = dec.apply(variables, feats, styles, noise)

    out = decoder_fused_apply(
        variables["params"], feats, styles, noise,
        upsample_list=(128, 256, 512, 1024), fuse_res=(512, 1024),
        dtype=jnp.float32, interpret=True,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-2
    )
    assert float(np.median(np.abs(np.asarray(out) - np.asarray(ref)))) < 1.5e-2


def test_decoder_fused_apply_chain_y1():
    """chain_y1 emits each fused block's successor conv_a output inside the
    kernel (packed for the successor's 2x pack), replacing the XLA dot +
    repack between blocks. Must match the flax Decoder like the base fused
    path (measured slower on v5e — kept as a parity-tested option)."""
    from cips3dpp_tpu.models.decoder import Decoder
    from cips3dpp_tpu.kernels.decoder_fused import decoder_fused_apply

    dec = Decoder(
        size_start=4, size_end=1024, in_channel=64, channel_multiplier=2,
        kernel_size=1, upsample_list=(128, 256, 512, 1024),
    )
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 64))
    styles = jax.random.normal(jax.random.PRNGKey(2), (1, dec.n_latent, 512))
    noise = dec.make_noise(jax.random.PRNGKey(3), 8)
    variables = dec.init(key, feats, styles, noise)
    ref = dec.apply(variables, feats, styles, noise)

    out = decoder_fused_apply(
        variables["params"], feats, styles, noise,
        upsample_list=(128, 256, 512, 1024),
        dtype=jnp.float32, interpret=True, chain_y1=True,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-2
    )
    assert float(np.median(np.abs(np.asarray(out) - np.asarray(ref)))) < 1.5e-2


@pytest.mark.parametrize("c", [32, 128])
def test_decoder_block_packed_fold_noise(c):
    """fold_noise folds the first noise injection into the column-upsample
    matmuls (K: 2L -> 2L+P); fp32 must be bit-identical to the unfolded
    kernel, and the hash-noise mode must compose with it."""
    from cips3dpp_tpu.kernels.decoder_block import (
        decoder_block_packed,
        hash_noise_map,
        layer_seed,
    )

    hp = wp = 16
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    y1 = jax.random.normal(ks[0], (hp, wp, c))
    noise1 = jax.random.normal(ks[1], (2 * hp, 2 * wp, 1))
    noise2 = jax.random.normal(ks[2], (2 * hp, 2 * wp, 1))
    w2 = jax.random.normal(ks[3], (c, c)) / np.sqrt(c)
    b1 = jax.random.normal(ks[4], (c,)) * 0.1
    b2 = jax.random.normal(ks[5], (c,)) * 0.1

    base = decoder_block_packed(
        y1, noise1, noise2, w2, b1, b2, 0.3, -0.2, t_rows=8, interpret=True
    )
    fold = decoder_block_packed(
        y1, noise1, noise2, w2, b1, b2, 0.3, -0.2, t_rows=8, interpret=True,
        fold_noise=True,
    )
    # fp32 fold differs from the unfolded kernel only by fp32 dot
    # accumulation order (the noise/bias terms join the blend dot product)
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(fold), rtol=1e-3, atol=2e-4
    )

    # full fold (KERNEL_NOTES headroom #1): b1 rides a ones lane in the
    # maps (K = 2L+P+1); same accumulation-order tolerance
    fold_b = decoder_block_packed(
        y1, noise1, noise2, w2, b1, b2, 0.3, -0.2, t_rows=8, interpret=True,
        fold_noise="bias",
    )
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(fold_b), rtol=1e-3, atol=2e-4
    )

    # hash-noise + fold: equals buffers built from the same hash realization
    seeds = jnp.stack([layer_seed(11, 0), layer_seed(11, 1)])
    n1h = hash_noise_map(2 * hp, 2 * wp, seeds[0])
    n2h = hash_noise_map(2 * hp, 2 * wp, seeds[1])
    a = decoder_block_packed(
        y1, n1h, n2h, w2, b1, b2, 0.3, -0.2, t_rows=8, interpret=True,
        fold_noise=True,
    )
    b_ = decoder_block_packed(
        y1, None, None, w2, b1, b2, 0.3, -0.2, noise_seeds=seeds,
        t_rows=8, interpret=True, fold_noise=True,
    )
    # same realization up to cross-program FMA-contraction noise (see
    # test_decoder_block_packed_hash_noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=0, atol=5e-3)


def test_decoder_fused_render_frame_batched():
    """decoder_fused_render with F frames stacked on the leading axis ==
    per-frame renders from the SAME prep — for both the padded-rgb and
    dense-lane (fold_rgb) stores, and for hash-noise prep (per-frame noise
    row ids inside the kernel)."""
    from cips3dpp_tpu.models.decoder import Decoder
    from cips3dpp_tpu.kernels.decoder_fused import (
        decoder_fused_prepare,
        decoder_fused_render,
    )

    dec = Decoder(
        size_start=4, size_end=1024, in_channel=64, channel_multiplier=2,
        kernel_size=1, upsample_list=(128, 256, 512, 1024),
    )
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 8, 64))
    styles = jax.random.normal(jax.random.PRNGKey(2), (1, dec.n_latent, 512))
    noise = dec.make_noise(jax.random.PRNGKey(3), 8)
    variables = dec.init(key, feats[:1], styles, noise)
    kw = dict(
        upsample_list=(128, 256, 512, 1024), dtype=jnp.float32,
    )

    for fold_rgb, noise_kw in (
        (False, {"noise": noise}),
        (True, {"noise": noise}),
        (True, {"noise": None, "noise_seed": 42}),
    ):
        prep = decoder_fused_prepare(
            variables["params"], styles, noise_kw.get("noise"),
            fold_rgb=fold_rgb, feat_size=8,
            noise_seed=noise_kw.get("noise_seed"), **kw,
        )
        batched = decoder_fused_render(
            prep, feats, interpret=True, fold_rgb=fold_rgb, **kw
        )
        singles = jnp.concatenate([
            decoder_fused_render(
                prep, feats[i : i + 1], interpret=True, fold_rgb=fold_rgb,
                **kw,
            )
            for i in range(3)
        ])
        assert batched.shape == (3, 128, 128, 3)
        np.testing.assert_allclose(
            np.asarray(batched), np.asarray(singles), rtol=0, atol=1e-5
        )
