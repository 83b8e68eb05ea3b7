"""Reference-forward-as-oracle parity (VERDICT r3 missing #2).

Runs the ACTUAL reference Generator (exp/cips3d/models/model_v3.py:809,
imported verbatim from /root/reference with its heavyweight deps stubbed —
see ref_oracle.py) on CPU with random-init weights EXPORTED FROM the JAX
model, then asserts the JAX forward reproduces its outputs for a fixed
(z, camera, noise). This pins every convention end-to-end — offset z-val
sampling, SDF->sigma integration, mapping depths, bmm mod-conv, blur pads,
noise injection order, skip-RGB accumulation — without released weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cips3dpp_tpu.core import camera_from_angles
from cips3dpp_tpu.models.generator import Generator
from cips3dpp_tpu.io.torch_import import export_generator_state_dict

from test_models import tiny_config
from ref_oracle import build_reference_generator

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module", params=["ks1_b1", "ks3_b2"])
def matched_pair(request):
    """JAX model + the reference torch Generator loaded with ITS weights.

    Two architecture variants: the flagship's kernel_size=1 decoder at
    batch 1, and a kernel_size=3 decoder (different blur-pad path through
    the reference's upfirdn2d) at batch 2."""
    if request.param == "ks1_b1":
        cfg, batch = tiny_config(), 1
    else:
        import dataclasses

        base = tiny_config(upsample_list=(128,))
        cfg = dataclasses.replace(
            base, decoder=dataclasses.replace(base.decoder, kernel_size=3)
        )
        batch = 2
    model = Generator(cfg)

    cam = camera_from_angles(
        jnp.linspace(0.11, -0.2, batch), jnp.linspace(-0.07, 0.1, batch),
        cfg.img_size, fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius,
    )
    zs = (
        jax.random.normal(jax.random.PRNGKey(2), (batch, cfg.mapping.z_dim)),
        jax.random.normal(jax.random.PRNGKey(3), (batch, cfg.mapping.z_dim)),
    )
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "perturb": key, "noise": key},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )

    ref_gen = build_reference_generator(cfg)
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_generator_state_dict(params).items()
    }
    result = ref_gen.load_state_dict(sd, strict=False)
    # only FIR buffers (rebuilt constants) may be absent from the export
    assert all(".kernel" in k for k in result.missing_keys), result.missing_keys
    assert result.unexpected_keys == [], result.unexpected_keys

    # fixed per-layer noise, torch layout (1,1,h,w) <-> jax (1,h,w,1)
    rng = np.random.default_rng(7)
    noise_t, noise_j = [], []
    with torch.no_grad():
        shapes = [
            tuple(b.shape)
            for b in ref_gen.create_noise_bufs(
                start_size=cfg.img_size, device="cpu"
            )
        ]
    for s in shapes:
        buf = rng.standard_normal(s).astype(np.float32)
        noise_t.append(torch.from_numpy(buf))
        noise_j.append(jnp.asarray(np.transpose(buf, (0, 2, 3, 1))))

    return cfg, model, params, cam, zs, ref_gen, noise_t, noise_j


def _ref_forward(cfg, ref_gen, cam, zs, noise_t):
    with torch.no_grad():
        return ref_gen(
            zs=[torch.from_numpy(np.asarray(z)) for z in zs],
            cam_poses=torch.from_numpy(np.asarray(cam.extrinsics)),
            focals=torch.from_numpy(np.asarray(cam.focal)),
            img_size=cfg.img_size,
            near=torch.from_numpy(np.asarray(cam.near)),
            far=torch.from_numpy(np.asarray(cam.far)),
            noise_bufs=noise_t,
            nerf_cfg=dict(
                N_samples=cfg.n_samples,
                perturb=False,
                static_viewdirs=cfg.static_viewdirs,
            ),
            return_sdf=True,
            return_xyz=True,
        )


def test_forward_matches_reference(matched_pair):
    cfg, model, params, cam, zs, ref_gen, noise_t, noise_j = matched_pair

    ref = _ref_forward(cfg, ref_gen, cam, zs, noise_t)

    with jax.default_matmul_precision("highest"):
        got = model.apply(
            params,
            zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
            perturb=False, noise_bufs=noise_j,
        )

    def chw(x):  # torch (b,c,h,w) -> (b,h,w,c)
        return np.transpose(x.numpy(), (0, 2, 3, 1))

    thumb_ref = chw(ref["thumb_rgb"])
    thumb_got = np.asarray(got["thumb_rgb"], dtype=np.float32)
    np.testing.assert_allclose(thumb_got, thumb_ref, atol=2e-4, rtol=1e-4)

    rgb_ref = chw(ref["rgb"])
    rgb_got = np.asarray(got["rgb"], dtype=np.float32)
    assert rgb_got.shape == rgb_ref.shape
    np.testing.assert_allclose(rgb_got, rgb_ref, atol=5e-4, rtol=1e-4)

    mask_ref = chw(ref["mask"])[..., 0]
    depth_ref = chw(ref["depth"])[..., 0]
    np.testing.assert_allclose(
        np.asarray(got["mask"]).reshape(mask_ref.shape), mask_ref, atol=2e-4,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["depth"]).reshape(depth_ref.shape), depth_ref,
        atol=2e-4, rtol=1e-4,
    )


def test_truncation_matches_reference(matched_pair):
    """Truncated styles: both sides lerp toward the mean latent. The mean is
    estimated from N random draws on each side (different RNGs), so compare
    via EXPLICIT shared styles instead: feed the reference's own truncated
    styles through both forwards."""
    cfg, model, params, cam, zs, ref_gen, noise_t, noise_j = matched_pair

    z0 = torch.from_numpy(np.asarray(zs[0]))
    z1 = torch.from_numpy(np.asarray(zs[1]))
    with torch.no_grad():
        mean_r, mean_d = ref_gen.get_mean_latent(N_noises=512, device="cpu")
        style_render, style_decoder = ref_gen.mapping_networks(
            zs=[z0, z1], truncation=1.0, inject_index=None
        )
        trunc = 0.6
        style_render = mean_r + trunc * (style_render - mean_r)
        style_decoder = mean_d.unsqueeze(1) + trunc * (
            style_decoder - mean_d.unsqueeze(1)
        )
        ref = ref_gen(
            zs=[z0, z1],
            cam_poses=torch.from_numpy(np.asarray(cam.extrinsics)),
            focals=torch.from_numpy(np.asarray(cam.focal)),
            img_size=cfg.img_size,
            near=torch.from_numpy(np.asarray(cam.near)),
            far=torch.from_numpy(np.asarray(cam.far)),
            style_render=style_render,
            style_decoder=style_decoder,
            noise_bufs=noise_t,
            nerf_cfg=dict(
                N_samples=cfg.n_samples, perturb=False,
                static_viewdirs=cfg.static_viewdirs,
            ),
        )

    with jax.default_matmul_precision("highest"):
        got = model.apply(
            params,
            zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
            perturb=False, noise_bufs=noise_j,
            style_render=jnp.asarray(style_render.numpy()),
            style_decoder=jnp.asarray(style_decoder.numpy()),
        )

    rgb_ref = np.transpose(ref["rgb"].numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(got["rgb"], dtype=np.float32), rgb_ref, atol=5e-4,
        rtol=1e-4,
    )


# ======================================================== discriminators ==


def _chw_t(x):
    return torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)).copy())


def test_d_stylegan_matches_reference():
    """Progressive image D vs the reference's own D_StyleGAN_Progressive:
    per-res input convs, ResBlocks (blur->stride-2 conv path), mb-stddev,
    channel-first final flatten, and the alpha<1 bilinear fade branch."""
    from cips3dpp_tpu.models.discriminator import DStyleGANProgressive
    from cips3dpp_tpu.io.torch_import import (
        export_d_stylegan_state_dict,
        import_d_stylegan_state_dict,
    )
    from ref_oracle import load_reference_discriminators

    ref_d, _ = load_reference_discriminators()

    d = DStyleGANProgressive(input_size=32, channel_multiplier=1)
    p = d.init(jax.random.PRNGKey(0), jnp.zeros((4, 32, 32, 3)))
    sd = export_d_stylegan_state_dict(p)

    ref = ref_d.D_StyleGAN_Progressive(input_size=32, channel_multiplier=1)
    ref.eval()
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    # allowed missing: FIR buffers + the reference's always-registered
    # resolutions above our input_size (discriminator.py:172 hardcodes
    # range(10, 2, -1))
    for k in res.missing_keys:
        top_res = int(k.split(".")[1]) if k.split(".")[1].isdigit() else 0
        assert ".kernel" in k or top_res > 32, k
    assert res.unexpected_keys == [], res.unexpected_keys

    x = np.random.RandomState(3).uniform(-1, 1, (4, 32, 32, 3)).astype(
        np.float32
    )
    for alpha in (1.0, 0.5):
        with torch.no_grad():
            want = ref(_chw_t(x), alpha=alpha).numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(d.apply(p, jnp.asarray(x), alpha=alpha))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4,
                                   err_msg=f"alpha={alpha}")

    # progressive: a half-res input goes through the smaller entry conv
    x16 = x[:, ::2, ::2]
    with torch.no_grad():
        want = ref(_chw_t(x16), alpha=0.7).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(d.apply(p, jnp.asarray(x16), alpha=0.7))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)

    # round-trip import reproduces the flax tree exactly
    imported = import_d_stylegan_state_dict(sd, p)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(p),
               key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(imported),
               key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_d_pose_matches_reference():
    """Progressive pose D vs the reference's D_VolumeRender_Progressive:
    CoordConv blocks, avg-pool downsampling, dual GAN+viewpoint head, and
    the alpha fade."""
    from cips3dpp_tpu.models.discriminator_pose import DVolumeRenderProgressive
    from cips3dpp_tpu.io.torch_import import (
        export_d_pose_state_dict,
        import_d_pose_state_dict,
    )
    from ref_oracle import load_reference_discriminators

    _, ref_dp = load_reference_discriminators()

    d = DVolumeRenderProgressive(input_size=32, viewpoint_loss=True)
    p = d.init(jax.random.PRNGKey(0), jnp.zeros((4, 32, 32, 3)))
    sd = export_d_pose_state_dict(p)

    ref = ref_dp.D_VolumeRender_Progressive(
        input_size=32, viewpoint_loss=True
    )
    ref.eval()
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not res.missing_keys and not res.unexpected_keys

    x = np.random.RandomState(5).uniform(-1, 1, (4, 32, 32, 3)).astype(
        np.float32
    )
    for alpha in (1.0, 0.4):
        with torch.no_grad():
            want_g, want_v = ref(_chw_t(x), alpha=alpha)
        with jax.default_matmul_precision("highest"):
            got_g, got_v = d.apply(p, jnp.asarray(x), alpha=alpha)
        np.testing.assert_allclose(
            np.asarray(got_g), want_g.numpy(), rtol=1e-4, atol=2e-4,
            err_msg=f"gan alpha={alpha}",
        )
        np.testing.assert_allclose(
            np.asarray(got_v), want_v.numpy(), rtol=1e-4, atol=2e-4,
            err_msg=f"view alpha={alpha}",
        )

    imported = import_d_pose_state_dict(sd, p)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(imported)[0]),
        np.asarray(jax.tree.leaves(p)[0]),
    )
