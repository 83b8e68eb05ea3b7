"""App-level tests: trajectories, rendering, style mixing, decoder interp,
flip-inversion (tiny model, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cips3dpp_tpu.core import sample_cameras
from cips3dpp_tpu.models.generator import Generator
from cips3dpp_tpu.apps.sample import (
    yaw_trajectory,
    circle_trajectory,
    translate_rotate_trajectory,
    render_trajectory,
    style_mixing_grid,
    interpolate_decoder_params,
    slerp,
)

from test_models import tiny_config


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = tiny_config()  # 8^2 rays -> 32^2 output
    model = Generator(cfg)
    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=1, img_size=cfg.img_size)
    zs = (jnp.zeros((1, 256)), jnp.zeros((1, 256)))
    params = model.init(
        {"params": key, "perturb": key, "noise": key},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    return cfg, model, params


def test_trajectories_shapes():
    yaw = yaw_trajectory(12, 64)
    assert yaw.extrinsics.shape == (12, 3, 4)
    # sinusoidal sweep starts and ends at azim_range[0]
    np.testing.assert_allclose(float(yaw.viewpoint[0, 0]), -0.3, atol=1e-6)
    np.testing.assert_allclose(float(yaw.viewpoint[-1, 0]), -0.3, atol=1e-5)

    circ = circle_trajectory(10, 64, fov_range=(5, 7))
    assert circ.extrinsics.shape == (10, 3, 4)
    # fov sweep changes focal length over the trajectory
    assert float(circ.focal.max()) > float(circ.focal.min())

    tr = translate_rotate_trajectory(6, 64)
    assert tr.extrinsics.shape == (12, 3, 4)  # translate + rotate phases
    rot_only = translate_rotate_trajectory(6, 64, only_rotate=True)
    assert rot_only.extrinsics.shape == (6, 3, 4)
    # roll: in-plane rotation keeps camera position fixed at (0,0,1)
    np.testing.assert_allclose(
        np.asarray(rot_only.extrinsics[:, :, 3]),
        np.tile([0, 0, 1], (6, 1)), atol=1e-5,
    )


def test_render_trajectory(tiny_gen):
    cfg, model, params = tiny_gen
    cams = yaw_trajectory(3, cfg.img_size)
    zs = (
        jax.random.normal(jax.random.PRNGKey(2), (1, 256)),
        jax.random.normal(jax.random.PRNGKey(3), (1, 256)),
    )
    out = render_trajectory(model, params, zs, cams)
    assert out["rgb"].shape == (3, 32, 32, 3)
    assert out["thumb_rgb"].shape == (3, 8, 8, 3)
    assert out["depth"].shape == (3, 8, 8, 1)
    # different cameras give different frames
    assert not np.allclose(out["rgb"][0], out["rgb"][-1])
    # zero-noise determinism
    a = render_trajectory(model, params, zs, cams, zero_noise=True)
    b = render_trajectory(model, params, zs, cams, zero_noise=True)
    np.testing.assert_array_equal(a["rgb"], b["rgb"])


def test_style_mixing_grid(tiny_gen):
    cfg, model, params = tiny_gen
    cam = sample_cameras(jax.random.PRNGKey(5), 1, cfg.img_size)
    grid = style_mixing_grid(model, params, jax.random.PRNGKey(6), 2, 3, cam)
    assert grid.shape == (2 * 32, 3 * 32, 3)


def test_decoder_interpolation(tiny_gen):
    cfg, model, params = tiny_gen
    # "style" model: perturbed decoder weights
    params_b = jax.tree.map(lambda x: x + 0.05, params)
    mid = interpolate_decoder_params(params, params_b, 0.5)
    dec_a = jax.tree.leaves(params["params"]["decoder"])[0]
    dec_m = jax.tree.leaves(mid["params"]["decoder"])[0]
    np.testing.assert_allclose(np.asarray(dec_m - dec_a), 0.025, atol=1e-6)
    # non-decoder modules untouched
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(mid["params"]["renderer"])[0]),
        np.asarray(jax.tree.leaves(params["params"]["renderer"])[0]),
    )


def test_slerp_endpoints():
    z1 = jax.random.normal(jax.random.PRNGKey(0), (1, 8))
    z2 = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
    np.testing.assert_allclose(np.asarray(slerp(z1, z2, 0.0)), np.asarray(z1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(slerp(z1, z2, 1.0)), np.asarray(z2), atol=1e-5)


@pytest.mark.slow
def test_flip_inversion_tiny(tiny_gen):
    from cips3dpp_tpu.apps.inversion import Projector, InversionConfig
    from cips3dpp_tpu.models.vgg import init_vgg

    cfg, model, params = tiny_gen
    vgg = init_vgg(jax.random.PRNGKey(0), img_size=32)
    icfg = InversionConfig(
        n_steps_pose=4, n_steps_app=6, n_steps_multiview=0,
        flip_w_decoder_every=3, w_avg_samples=64,
    )
    proj = Projector(model, params, vgg, icfg)
    target = np.asarray(
        jnp.tanh(jax.random.normal(jax.random.PRNGKey(9), (32, 32, 3)))
    )
    logs = []
    state, proj_img, report = proj.project(
        target, key=jax.random.PRNGKey(1),
        logger=lambda s, m: logs.append((s, m)), log_every=2,
    )
    assert proj_img.shape == (2, 32, 32, 3)
    assert np.isfinite(report["psnr"]) and np.isfinite(report["loss"])
    assert len(report["azim"]) == 2
    assert logs  # logger fired

    # save/load round trip
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = proj.save_inversion(os.path.join(d, "w.pkl"), state)
        blob = Projector.load_inversion(p)
        np.testing.assert_array_equal(
            np.asarray(blob["w_render_opt"]), np.asarray(state.w_render)
        )


@pytest.mark.slow
def test_flip_inversion_axis_angle(tiny_gen):
    """Axis-angle camera parameterisation (projector_axis_angle.py:191-278,
    _flip_inversion_axis_angle_web)."""
    from cips3dpp_tpu.apps.inversion import Projector, InversionConfig
    from cips3dpp_tpu.models.vgg import init_vgg

    cfg, model, params = tiny_gen
    vgg = init_vgg(jax.random.PRNGKey(0), img_size=32)
    icfg = InversionConfig(
        n_steps_pose=3, n_steps_app=3, n_steps_multiview=0,
        flip_w_decoder_every=2, w_avg_samples=32, cam_param="axis_angle",
    )
    proj = Projector(model, params, vgg, icfg)
    target = np.asarray(
        jnp.tanh(jax.random.normal(jax.random.PRNGKey(9), (32, 32, 3)))
    )
    state, proj_img, report = proj.project(target, key=jax.random.PRNGKey(1))
    assert state.azim.shape == (2, 3)  # rot axis-angle
    assert state.elev.shape == (2, 3)  # trans on the sphere
    assert np.isfinite(report["psnr"]) and np.isfinite(report["lpips"])
    # camera params moved during the pose phase
    assert float(jnp.abs(state.elev - jnp.asarray([[0.0, 0.0, 1.0]])).max()) > 0


def test_web_mode_argv_matches_cli_surface():
    """The web UI delegates to apps/cli.py via argv; every mode's command
    must exist in the dispatch table and every arg it emits must be a
    declared option of that command's parser (checked against source)."""
    import inspect
    from cips3dpp_tpu.apps import web, cli

    for mode, (cmd, spec) in web.MODES.items():
        assert cmd in cli.COMMANDS, (mode, cmd)
        src = inspect.getsource(cli.COMMANDS[cmd])
        # _base_parser provides the shared options
        base_src = inspect.getsource(cli._base_parser)
        values = {}
        for name, kind, default in spec:
            if kind == "flag":
                values[name] = True
            elif kind is int or kind is float:
                values[name] = default
            elif kind in ("path", "paths"):
                values[name] = "/tmp/a.pkl /tmp/b.pkl" if kind == "paths" else "/tmp/a"
            else:
                values[name] = kind[0]
        argv = web.build_argv(mode, values, "cfg.yaml", "sec", "/tmp/o", 0)
        assert argv[0] == cmd
        for tok in argv[1:]:
            if tok.startswith("--"):
                assert f'"{tok}"' in src or f'"{tok}"' in base_src, (
                    mode, cmd, tok)


@pytest.mark.slow
def test_inversion_self_recovery(tiny_gen):
    """Functional gate (not just motion): invert a target RENDERED BY THE
    SAME MODEL at a known pose with mean latents. The pose phase must (a)
    drive the loss down and (b) move azim from its 0.02 init toward the
    true azim*=0.3 (projector_v10.py:915-1100's pose-phase objective) —
    this needs no pretrained VGG: random-VGG features preserve L2
    structure well enough for pose recovery."""
    from cips3dpp_tpu.apps.inversion import Projector, InversionConfig
    from cips3dpp_tpu.core.camera import camera_from_angles
    from cips3dpp_tpu.models.vgg import init_vgg

    cfg, model, params = tiny_gen
    azim_true = 0.3

    bound = model.bind(params)
    means = model.apply(params, jax.random.PRNGKey(5), 512,
                        method="mean_latents")
    wr, wd = means
    sr = jnp.repeat(wr[:, None, :], cfg.renderer.n_layers + 1, axis=1)
    sd = jnp.repeat(wd[:, None, :], bound.decoder.n_latent, axis=1)
    cam = camera_from_angles(
        jnp.asarray([azim_true]), jnp.asarray([0.0]), cfg.img_size,
        fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius,
    )
    noise = list(bound.decoder.make_noise(jax.random.PRNGKey(0), cfg.img_size))
    out = model.apply(
        params, style_render=sr, style_decoder=sd,
        cam_poses=cam.extrinsics, focals=cam.focal, near=cam.near,
        far=cam.far, noise_bufs=noise, perturb=True,
        rngs={"perturb": jax.random.PRNGKey(7)},
    )
    target = np.asarray(out["rgb"][0])

    vgg = init_vgg(jax.random.PRNGKey(0), img_size=target.shape[0])
    # noise-buf optimisation off: during the pose phase the decoder group is
    # lr-gated to zero, so the (huge, constant) noise-autocorrelation reg
    # would swamp the logged loss without ever moving. lr_cam raised for the
    # tiny model: perturb-jitter gradient noise shrinks Adam's normalised
    # update to ~0.05, so the reference lr crawls at this scale.
    icfg = InversionConfig(
        n_steps_pose=150, n_steps_app=0, n_steps_multiview=0,
        mask_background=False, w_avg_samples=512, optim_noise_bufs=False,
        lr_cam=0.1, lr_render_w=0.02,
    )
    proj = Projector(model, params, vgg, icfg)
    logs = []
    state, proj_img, report = proj.project(
        target, key=jax.random.PRNGKey(1), azim_init=(0.02, 0.02),
        logger=lambda s, m: logs.append((s, m)), log_every=10,
    )
    first_loss = logs[0][1]["loss"]
    last_loss = logs[-1][1]["loss"]
    assert np.isfinite(last_loss)
    assert last_loss < first_loss, (first_loss, last_loss)

    azim_rec = float(np.asarray(state.azim).ravel()[0])
    err0 = abs(0.02 - azim_true)
    err = abs(azim_rec - azim_true)
    assert err < err0, (azim_rec, azim_true)
    assert err < 0.15, (azim_rec, azim_true)  # measured 0.114 (0.414 rec)
