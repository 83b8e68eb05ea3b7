"""Golden-value tests for camera / ray / integration math.

Derived by hand from the documented formulas (exp/cips3d/nerf_utils.py), not
by running the reference.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cips3dpp_tpu.core import (
    camera_from_angles,
    sample_cameras,
    axis_angle_to_matrix,
    camera2world_from_axis_angle,
    get_rays_in_world,
    get_z_vals,
    get_points,
    normalize_points,
    prepare_nerf_inputs,
    volume_integration,
)


def test_camera_frontal():
    """azim=elev=0: camera at (0,0,1) looking down -z; R^T = identity-ish."""
    cam = camera_from_angles(jnp.zeros(1), jnp.zeros(1), img_size=64)
    ext = np.asarray(cam.extrinsics[0])
    # camera_dir = (0,0,1); x_axis = up x z = (1,0,0); y = z x x = (0,1,0)
    np.testing.assert_allclose(ext[:, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(ext[:, 3], [0, 0, 1], atol=1e-6)
    # fov 6deg -> focal = 0.5*64/tan(6*pi/180)
    want_focal = 0.5 * 64 / np.tan(np.deg2rad(6.0))
    np.testing.assert_allclose(float(cam.focal[0, 0, 0]), want_focal, rtol=1e-6)
    np.testing.assert_allclose(float(cam.near[0, 0, 0]), 0.88, rtol=1e-6)
    np.testing.assert_allclose(float(cam.far[0, 0, 0]), 1.12, rtol=1e-6)


def test_camera_azimuth_rotation():
    """azim=pi/2: camera at (1,0,0); z-axis points at +x."""
    cam = camera_from_angles(jnp.asarray([np.pi / 2]), jnp.zeros(1), img_size=64)
    ext = np.asarray(cam.extrinsics[0])
    np.testing.assert_allclose(ext[:, 3], [1, 0, 0], atol=1e-6)
    # columns of R^T are the camera axes: x_axis=(0,0,-1), y=(0,1,0), z=(1,0,0)
    np.testing.assert_allclose(ext[:, 0], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(ext[:, 1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(ext[:, 2], [1, 0, 0], atol=1e-6)


def test_camera_is_differentiable():
    """Inversion optimises (azim, elev) through this (projector_v10.py:211-277)."""

    def loss(a):
        cam = camera_from_angles(a, jnp.asarray([0.1]), img_size=64)
        return jnp.sum(cam.extrinsics)

    g = jax.grad(loss)(jnp.asarray([0.3]))
    assert np.isfinite(np.asarray(g)).all()


def test_axis_angle_identity_and_z90():
    r0 = axis_angle_to_matrix(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(r0[0]), np.eye(3), atol=1e-6)
    rz = axis_angle_to_matrix(jnp.asarray([[0.0, 0.0, np.pi / 2]]))
    want = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(rz[0]), want, atol=1e-6)


def test_camera2world_grad():
    g = jax.grad(
        lambda r: jnp.mean(
            camera2world_from_axis_angle(r, jnp.asarray([[0.0, 0.0, 1.0]]))
        )
    )(jnp.zeros((1, 3)))
    assert np.isfinite(np.asarray(g)).all()


def test_rays_frontal_center():
    cam = camera_from_angles(jnp.zeros(1), jnp.zeros(1), img_size=4)
    rays_o, rays_d, viewdirs = get_rays_in_world(cam.focal, 4, cam.extrinsics)
    assert rays_d.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(rays_o[0, 0, 0]), [0, 0, 1], atol=1e-6)
    # Frontal camera: all rays point in -z (center pixel offset by +-0.5/f, 1.5/f)
    f = float(cam.focal[0, 0, 0])
    np.testing.assert_allclose(
        np.asarray(rays_d[0, 1, 1]), [-0.5 / f, 0.5 / f, -1.0], atol=1e-6
    )
    n = np.linalg.norm(np.asarray(viewdirs), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_z_vals_offset_sampling_no_perturb():
    near = jnp.full((1, 1, 1), 0.88)
    far = jnp.full((1, 1, 1), 1.12)
    rays_d = jnp.ones((1, 2, 2, 3))
    z = get_z_vals(near, far, rays_d, n_samples=4, perturb=False)
    want = 0.88 + (1.12 - 0.88) * np.asarray([0.0, 0.25, 0.5, 0.75])
    np.testing.assert_allclose(np.asarray(z[0, 0, 0]), want, rtol=1e-6)


def test_z_vals_perturb_bounds():
    near = jnp.full((1, 1, 1), 0.88)
    far = jnp.full((1, 1, 1), 1.12)
    rays_d = jnp.ones((1, 4, 4, 3))
    z = get_z_vals(
        near, far, rays_d, n_samples=8, perturb=True, key=jax.random.PRNGKey(0)
    )
    z = np.asarray(z)
    assert (z >= 0.88 - 1e-6).all() and (z <= 1.12 + 1e-6).all()
    assert (np.diff(z, axis=-1) > 0).all()  # per-ray shared offset keeps order


def test_normalize_points():
    pts = jnp.ones((2, 2, 2, 3, 3))
    near = jnp.full((2, 1, 1), 0.88)
    far = jnp.full((2, 1, 1), 1.12)
    out = normalize_points(pts, near, far)
    np.testing.assert_allclose(np.asarray(out), 2.0 / 0.24, rtol=1e-5)


def test_volume_integration_single_opaque_sample():
    """One fully-opaque sample: rgb_map = 2*sigmoid(rgb)-1, weight~1."""
    b, r, n = 1, 2, 4
    rgb = jnp.zeros((b, r, n, 3))
    # massively negative sdf on sample 1 -> sigma huge -> alpha ~ 1 there
    sdf = jnp.full((b, r, n, 1), 10.0).at[:, :, 1, :].set(-10.0)
    feats = jnp.ones((b, r, n, 5))
    z_vals = jnp.broadcast_to(jnp.linspace(0.88, 1.12, n), (b, r, n))
    rays_d = jnp.concatenate(
        [jnp.zeros((b, r, 2)), -jnp.ones((b, r, 1))], axis=-1
    )  # |d| = 1
    pts = jnp.zeros((b, r, n, 3)).at[:, :, 1, 2].set(0.96)
    # beta=0.01 -> sigma saturates at 100 -> alpha = 1-exp(-100*0.08) ~ 1
    rgb_map, feat_map, xyz, mask_depth = volume_integration(
        rgb, sdf, feats, z_vals, rays_d, pts,
        with_sdf=True, sigmoid_beta=jnp.asarray([0.01]),
    )
    # sigmoid(0) = 0.5 -> rgb_map ~ 0
    np.testing.assert_allclose(np.asarray(rgb_map), 0.0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(feat_map), 1.0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(xyz[..., 2]), 0.96, atol=1e-2)
    # depth = -|xyz|
    np.testing.assert_allclose(np.asarray(mask_depth[..., 1]), -0.96, atol=1e-2)


def test_volume_integration_weights_sum_le_one():
    key = jax.random.PRNGKey(1)
    rgb = jax.random.normal(key, (2, 8, 6, 3))
    sdf = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 6, 1))
    feats = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 6, 4))
    z_vals = jnp.broadcast_to(jnp.linspace(0.88, 1.12, 6), (2, 8, 6))
    rays_d = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 3))
    pts = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 6, 3))
    rgb_map, _, _, _ = volume_integration(
        rgb, sdf, feats, z_vals, rays_d, pts,
        with_sdf=True, sigmoid_beta=jnp.asarray([0.1]),
    )
    assert np.asarray(jnp.abs(rgb_map)).max() <= 1.0 + 1e-5


def test_prepare_nerf_inputs_shapes():
    cam = sample_cameras(jax.random.PRNGKey(0), batch=2, img_size=8)
    pts, rays_d, viewdirs, z_vals = prepare_nerf_inputs(
        cam.focal, 8, cam.extrinsics, cam.near, cam.far,
        n_samples=6, perturb=True, key=jax.random.PRNGKey(1),
    )
    assert pts.shape == (2, 8, 8, 6, 3)
    assert rays_d.shape == (2, 8, 8, 3)
    assert viewdirs.shape == (2, 8, 8, 3)
    assert z_vals.shape == (2, 8, 8, 6)
    # Camera sits on the unit sphere looking at the origin with near/far
    # 1 -/+ 0.12 and ~6deg fov: all sample points cluster near the origin.
    d = np.linalg.norm(np.asarray(pts), axis=-1)
    assert d.max() < 0.5


def test_sweep_cameras():
    """8-view azimuth sweep with shared random elevation per batch item
    (nerf_utils.py:379-392)."""
    from cips3dpp_tpu.core.camera import sweep_cameras

    cam = sweep_cameras(jax.random.PRNGKey(0), batch=2, img_size=64)
    assert cam.extrinsics.shape == (16, 3, 4)
    az = np.asarray(cam.viewpoint[:, 0]).reshape(2, 8)
    np.testing.assert_allclose(az[0], az[1], atol=1e-6)  # same sweep per item
    np.testing.assert_allclose(az[0, 0], -0.3, atol=1e-6)
    np.testing.assert_allclose(az[0, -1], 0.3, atol=1e-6)
    el = np.asarray(cam.viewpoint[:, 1]).reshape(2, 8)
    assert np.allclose(el[0], el[0, 0])  # shared elev within an item
    assert not np.allclose(el[0, 0], el[1, 0])  # random across items
    # list-range variant
    cam2 = sweep_cameras(jax.random.PRNGKey(1), 1, 64,
                         azim_range=[0.0, 0.7], elev_range=[0.1, 0.2])
    az2 = np.asarray(cam2.viewpoint[:, 0])
    np.testing.assert_allclose(az2[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(az2[-1], 0.7, atol=1e-6)
