"""Model-level build+forward tests (the reference's test_discriminator.py
pattern, exp/cips3d/models/test_discriminator.py:15-383, without GPUs)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cips3dpp_tpu.core import sample_cameras
from cips3dpp_tpu.models.generator import (
    Generator,
    GeneratorConfig,
    RendererConfig,
    DecoderConfig,
)
from cips3dpp_tpu.models.discriminator import DStyleGAN, DStyleGANProgressive
from cips3dpp_tpu.models.discriminator_pose import (
    DVolumeRender,
    DVolumeRenderProgressive,
)


def tiny_config(img_size=8, upsample_list=(128, 256), n_samples=4):
    """Small generator for CPU tests: 8^2 rays, 2 upsamples -> 32^2 output."""
    return GeneratorConfig(
        renderer=RendererConfig(n_layers=2, hidden_dim=32),
        decoder=DecoderConfig(
            size_start=4,
            size_end=1024,
            channel_multiplier=2,
            kernel_size=1,
            upsample_list=upsample_list,
            style_dim=64,
            mapping_n_layers=2,
        ),
        img_size=img_size,
        n_samples=n_samples,
    )


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = tiny_config()
    model = Generator(cfg)
    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=cfg.img_size)
    zs = (
        jax.random.normal(jax.random.PRNGKey(2), (2, cfg.mapping.z_dim)),
        jax.random.normal(jax.random.PRNGKey(3), (2, cfg.mapping.z_dim)),
    )
    params = model.init(
        {"params": key, "perturb": key, "noise": key},
        zs=zs,
        cam_poses=cam.extrinsics,
        focals=cam.focal,
        near=cam.near,
        far=cam.far,
    )
    return model, params, cam, zs


def test_generator_forward_shapes(tiny_gen):
    model, params, cam, zs = tiny_gen
    out = model.apply(
        params,
        zs=zs,
        cam_poses=cam.extrinsics,
        focals=cam.focal,
        near=cam.near,
        far=cam.far,
        rngs={"perturb": jax.random.PRNGKey(5), "noise": jax.random.PRNGKey(6)},
    )
    assert out["rgb"].shape == (2, 32, 32, 3)  # 8 * 2^2 upsamples
    assert out["thumb_rgb"].shape == (2, 8, 8, 3)
    assert out["mask"].shape == (2, 8, 8, 1)
    assert out["depth"].shape == (2, 8, 8, 1)
    assert out["xyz"].shape == (2, 8, 8, 3)
    assert out["sdf"].shape == (2, 8, 8, 4, 1)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.abs(np.asarray(out["thumb_rgb"])).max() <= 1.0 + 1e-5


def test_generator_ray_chunk_matches_full(tiny_gen):
    model, params, cam, zs = tiny_gen
    kwargs = dict(
        zs=zs,
        cam_poses=cam.extrinsics,
        focals=cam.focal,
        near=cam.near,
        far=cam.far,
        perturb=False,
    )
    rngs = {"noise": jax.random.PRNGKey(7)}
    full = model.apply(params, **kwargs, rngs=rngs)
    chunked = model.apply(params, **kwargs, ray_chunk=16, rngs=rngs)
    np.testing.assert_allclose(
        np.asarray(full["thumb_rgb"]), np.asarray(chunked["thumb_rgb"]), atol=1e-5
    )


def test_generator_eikonal(tiny_gen):
    model, params, cam, zs = tiny_gen
    out = model.apply(
        params,
        zs=zs,
        cam_poses=cam.extrinsics,
        focals=cam.focal,
        near=cam.near,
        far=cam.far,
        perturb=False,
        eikonal_reg=True,
        rngs={"noise": jax.random.PRNGKey(8)},
    )
    eik = out["eikonal_term"]
    assert eik.shape == (2, 8 * 8, 4, 3)
    assert np.isfinite(np.asarray(eik)).all()
    # eikonal norm should be O(1)-ish, not zero: the SDF has real gradients
    assert float(jnp.abs(eik).max()) > 0


def test_generator_deterministic_with_noise_bufs(tiny_gen):
    model, params, cam, zs = tiny_gen
    noise = model.bind(params).decoder.make_noise(jax.random.PRNGKey(0), 8)
    kwargs = dict(
        zs=zs,
        cam_poses=cam.extrinsics,
        focals=cam.focal,
        near=cam.near,
        far=cam.far,
        perturb=False,
        noise_bufs=noise,
    )
    a = model.apply(params, **kwargs)
    b = model.apply(params, **kwargs)
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))


def test_generator_truncation(tiny_gen):
    model, params, cam, zs = tiny_gen
    means = model.apply(
        params, jax.random.PRNGKey(0), 256, method=Generator.mean_latents
    )
    out = model.apply(
        params,
        zs=zs,
        cam_poses=cam.extrinsics,
        focals=cam.focal,
        near=cam.near,
        far=cam.far,
        perturb=False,
        truncation=0.5,
        mean_latents=means,
        rngs={"noise": jax.random.PRNGKey(9)},
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_generator_sphere_init_pass(tiny_gen):
    model, params, cam, zs = tiny_gen
    sdf, target = model.apply(
        params,
        zs=zs,
        cam_poses=cam.extrinsics,
        focals=cam.focal,
        near=cam.near,
        far=cam.far,
        method=Generator.init_forward,
    )
    assert sdf.shape == target.shape == (2, 8, 8, 4)


def test_d_stylegan():
    d = DStyleGAN(input_size=64, channel_multiplier=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    params = d.init(jax.random.PRNGKey(1), x)
    out = d.apply(params, x)
    assert out.shape == (4, 1)


def test_d_stylegan_progressive_fade():
    d = DStyleGANProgressive(input_size=1024, channel_multiplier=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    params = d.init(jax.random.PRNGKey(1), x, alpha=0.5)
    out_half = d.apply(params, x, alpha=0.5)
    out_full = d.apply(params, x, alpha=1.0)
    assert out_half.shape == (2, 1)
    assert not np.allclose(np.asarray(out_half), np.asarray(out_full))
    # param structure covers every resolution (progressive growth ready)
    names = jax.tree_util.tree_leaves_with_path(params)
    assert any("conv_in_1024" in jax.tree_util.keystr(p) for p, _ in names)
    assert any("conv_in_8" in jax.tree_util.keystr(p) for p, _ in names)


def test_d_pose():
    d = DVolumeRender(input_size=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    params = d.init(jax.random.PRNGKey(1), x)
    gan, view = d.apply(params, x)
    assert gan.shape == (4, 1)
    assert view.shape == (4, 2)


def test_d_pose_progressive():
    d = DVolumeRenderProgressive(input_size=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    params = d.init(jax.random.PRNGKey(1), x, alpha=0.3)
    gan, view = d.apply(params, x, alpha=0.3)
    assert gan.shape == (2, 1)
    assert view.shape == (2, 2)


def test_d_multiscale():
    from cips3dpp_tpu.models.discriminator_multi_scale import DiscriminatorMultiScale

    d = DiscriminatorMultiScale(max_size=256, channel_multiplier=1)
    for size in (64, 128):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, size, size, 3))
        params = d.init(jax.random.PRNGKey(1), x, alpha=0.5)
        out, latent, pos = d.apply(params, x, alpha=0.5)
        assert out.shape == (4, 1)
        assert latent is None and pos is None
    # same params work across input sizes (multi-scale contract)
    x64 = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    x128 = jax.random.normal(jax.random.PRNGKey(3), (2, 128, 128, 3))
    p = d.init(jax.random.PRNGKey(4), x128, alpha=1.0)
    o1, *_ = d.apply(p, x64, alpha=1.0)
    o2, *_ = d.apply(p, x128, alpha=1.0)
    assert o1.shape == o2.shape == (2, 1)


def test_map_zs_inject_index_crossover(tiny_gen):
    """Mid-layer decoder-style crossover (mapping_decoder,
    model_v3.py:1350-1378): with a third z, layers [0, inject_index) carry
    w(z1) and the rest w(z2); default inject_index = n_latent (all-first)."""
    model, params, cam, zs = tiny_gen
    z2 = jax.random.normal(jax.random.PRNGKey(11), zs[1].shape)
    n_latent = model.bind(params).decoder.n_latent

    _, sd_single = model.apply(params, zs, method=Generator.map_zs)
    _, sd_other = model.apply(params, (zs[0], z2), method=Generator.map_zs)

    k = n_latent // 2
    _, sd_mix = model.apply(
        params, (zs[0], zs[1], z2), inject_index=k, method=Generator.map_zs
    )
    assert sd_mix.shape == sd_single.shape
    np.testing.assert_allclose(sd_mix[:, :k], sd_single[:, :k], rtol=1e-6)
    np.testing.assert_allclose(sd_mix[:, k:], sd_other[:, k:], rtol=1e-6)

    # reference default: inject_index=None with two decoder z's = all-first
    _, sd_default = model.apply(
        params, (zs[0], zs[1], z2), method=Generator.map_zs
    )
    np.testing.assert_allclose(sd_default, sd_single, rtol=1e-6)

    # end-to-end: forward accepts a 3-z tuple + inject_index
    out = model.apply(
        params,
        zs=(zs[0], zs[1], z2),
        inject_index=k,
        cam_poses=cam.extrinsics,
        focals=cam.focal,
        near=cam.near,
        far=cam.far,
        perturb=False,
        rngs={"noise": jax.random.PRNGKey(9)},
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_convlayer_fused_blur_down_exact():
    """FUSE_DOWN_CONV composes Blur(4-tap) -> stride-2 conv into one dense
    (k+3)x(k+3) conv from the SAME stored weight: outputs must match the
    two-op form to fp32 reassociation noise, and the param tree must be
    IDENTICAL (path, shape, init values) so checkpoints are unaffected."""
    import cips3dpp_tpu.models.layers as L

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    orig = L.FUSE_DOWN_CONV
    try:
        for k in (1, 3):
            outs, params = {}, None
            for flag in (False, True):
                L.FUSE_DOWN_CONV = flag
                m = L.ConvLayer(12, k, downsample=True)
                p = m.init(jax.random.PRNGKey(1), x)
                if params is None:
                    params = p
                assert jax.tree.structure(p) == jax.tree.structure(params)
                for a, b_ in zip(jax.tree.leaves(p), jax.tree.leaves(params)):
                    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
                outs[flag] = m.apply(params, x)
            assert outs[True].shape == outs[False].shape == (2, 8, 8, 12)
            np.testing.assert_allclose(
                np.asarray(outs[True]), np.asarray(outs[False]),
                rtol=0, atol=1e-5,
            )
    finally:
        L.FUSE_DOWN_CONV = orig
