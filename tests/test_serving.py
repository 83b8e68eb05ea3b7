"""Serving module: prepare-once/render-per-frame vs the one-shot fused
path. The split must be a pure rescheduling — same kernels, same numbers
(reference contract: get_ws-once + per-frame synthesis,
render_video_web_v10.py:1695-1824)."""

import numpy as np
import jax
import jax.numpy as jnp

from cips3dpp_tpu.core.camera import camera_from_angles
from cips3dpp_tpu.core.rays import prepare_nerf_inputs
from cips3dpp_tpu.models.generator import (
    Generator,
    GeneratorConfig,
    RendererConfig,
    DecoderConfig,
)
from cips3dpp_tpu.serving import (
    prepare_trajectory,
    render_frame,
    render_trajectory_scan,
)


def _tiny_serving_model():
    cfg = GeneratorConfig(
        renderer=RendererConfig(n_layers=2, hidden_dim=32),
        decoder=DecoderConfig(
            size_end=64, upsample_list=(32, 64), style_dim=64,
            mapping_n_layers=2,
        ),
        img_size=16,
        n_samples=8,
    )
    model = Generator(cfg)
    cam = camera_from_angles(
        jnp.zeros((1,)), jnp.zeros((1,)), cfg.img_size,
        fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius,
    )
    zs = (
        jax.random.normal(jax.random.PRNGKey(1), (1, cfg.mapping.z_dim)),
        jax.random.normal(jax.random.PRNGKey(2), (1, cfg.mapping.z_dim)),
    )
    k = jax.random.PRNGKey(0)
    params = model.init(
        {"params": k, "perturb": k, "noise": k},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    return model, params, zs


def test_render_frame_matches_oneshot_fused():
    """prepare+render == siren_render_fused + decoder_fused_apply at two
    different cameras from ONE prep (the prep really is frame-invariant)."""
    from cips3dpp_tpu.kernels.siren_render import siren_render_fused
    from cips3dpp_tpu.kernels.decoder_fused import decoder_fused_apply

    model, params, zs = _tiny_serving_model()
    cfg = model.cfg
    noise = model.bind(params).decoder.make_noise(
        jax.random.PRNGKey(7), cfg.img_size
    )
    prep = prepare_trajectory(model, params, zs, noise_bufs=noise)
    sr, sd = model.apply(params, zs, method=Generator.map_zs)

    for az in (0.15, -0.3):
        azim = jnp.full((1,), az)
        elev = jnp.zeros((1,))
        got = render_frame(model, prep, azim, elev, interpret=True)

        cam = camera_from_angles(
            azim, elev, cfg.img_size, fov_ang=cfg.fov_ang,
            dist_radius=cfg.dist_radius,
        )
        pts, rays_d, viewdirs, z_vals = prepare_nerf_inputs(
            focal=cam.focal, img_size=cfg.img_size,
            cam_poses=cam.extrinsics, near=cam.near, far=cam.far,
            n_samples=cfg.n_samples, perturb=False,
            static_viewdirs=cfg.static_viewdirs,
        )
        b, h, w, n, _ = pts.shape
        flat = lambda a: a.reshape(h * w, *a.shape[3:])
        thumb, feat, _, _, _ = siren_render_fused(
            params["params"]["renderer"], sr[0],
            flat(pts), flat(viewdirs), flat(z_vals), flat(rays_d),
            cam.near.reshape(-1)[0], cam.far.reshape(-1)[0],
            interpret=True,
        )
        rgb = decoder_fused_apply(
            params["params"]["decoder"], feat.reshape(1, h, w, -1), sd,
            noise,
            upsample_list=tuple(cfg.decoder.upsample_list),
            size_start=cfg.decoder.size_start,
            size_end=cfg.decoder.size_end,
            channel_multiplier=cfg.decoder.channel_multiplier,
            dtype=jnp.dtype(cfg.decoder.dtype),
            interpret=True,
            fold_rgb=True,  # serving default (render_frame folds ToRGB)
        )
        assert got["rgb"].shape == rgb.shape == (1, 64, 64, 3)
        np.testing.assert_allclose(
            np.asarray(got["rgb"]), np.asarray(rgb), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got["thumb_rgb"]),
            np.asarray(thumb.reshape(1, h, w, 3)), rtol=0, atol=1e-5,
        )


def test_render_trajectory_scan_runs_and_depends_on_camera():
    model, params, zs = _tiny_serving_model()
    noise = model.bind(params).decoder.make_noise(
        jax.random.PRNGKey(7), model.cfg.img_size
    )
    prep = prepare_trajectory(model, params, zs, noise_bufs=noise)
    a = render_frame(model, prep, jnp.full((1,), 0.2), jnp.zeros((1,)),
                     interpret=True)
    b = render_frame(model, prep, jnp.full((1,), -0.2), jnp.zeros((1,)),
                     interpret=True)
    assert np.isfinite(np.asarray(a["rgb"])).all()
    # the camera must actually steer the render
    assert float(np.abs(np.asarray(a["rgb"]) - np.asarray(b["rgb"])).max()) > 1e-3

    # jitted whole-trajectory scan == sum of per-frame means (bench path)
    yaws = jnp.array([0.2, -0.2])
    checksum = jax.jit(
        lambda p, y: render_trajectory_scan(model, p, y, interpret=True)
    )(prep, yaws)
    want = (np.asarray(a["rgb"], np.float32).mean()
            + np.asarray(b["rgb"], np.float32).mean())
    np.testing.assert_allclose(float(checksum), want, rtol=0, atol=1e-5)


def test_render_frame_batched_matches_per_frame():
    """F frames through one launch (frame axis stacked on kernel rows) ==
    the same frames rendered one by one from the same prep. Exercises the
    frame-boundary halo masks and per-frame noise tiling in
    decoder_block_packed(frames=F)."""
    model, params, zs = _tiny_serving_model()
    noise = model.bind(params).decoder.make_noise(
        jax.random.PRNGKey(7), model.cfg.img_size
    )
    prep = prepare_trajectory(model, params, zs, noise_bufs=noise)
    azims = jnp.array([0.25, 0.0, -0.25])
    elevs = jnp.array([0.0, 0.1, -0.1])

    batched = render_frame(model, prep, azims, elevs, interpret=True)
    singles = [
        render_frame(model, prep, azims[i : i + 1], elevs[i : i + 1],
                     interpret=True)
        for i in range(3)
    ]
    assert batched["rgb"].shape == (3, 64, 64, 3)
    for k in ("rgb", "thumb_rgb"):
        want = np.concatenate([np.asarray(s[k]) for s in singles])
        np.testing.assert_allclose(
            np.asarray(batched[k]), want, rtol=0, atol=1e-5
        )

    # scan with frames_per_step grouping gives the same trajectory checksum
    yaws = jnp.array([0.25, 0.0, -0.25, 0.4])
    c1 = jax.jit(
        lambda p, y: render_trajectory_scan(model, p, y, interpret=True,
                                            frames_per_step=1)
    )(prep, yaws)
    c2 = jax.jit(
        lambda p, y: render_trajectory_scan(model, p, y, interpret=True,
                                            frames_per_step=2)
    )(prep, yaws)
    np.testing.assert_allclose(float(c1), float(c2), rtol=0, atol=1e-5)
