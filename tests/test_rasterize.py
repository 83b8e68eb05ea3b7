"""Software rasterizer tests (utils/rasterize.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from cips3dpp_tpu.core.camera import camera_from_angles
from cips3dpp_tpu.core.rays import get_rays_in_world
from cips3dpp_tpu.utils.rasterize import (
    project_vertices,
    rasterize_mesh,
    project_noise_map,
    shaded_mesh_image,
)


def _cam(img_size=32):
    cam = camera_from_angles(
        jnp.zeros((1,)), jnp.zeros((1,)), img_size, fov_ang=12.0
    )
    return cam


def test_projection_inverts_ray_generation():
    """A point t * rays_d + rays_o must project back to its own pixel."""
    s = 16
    cam = _cam(s)
    rays_o, rays_d, _ = get_rays_in_world(cam.focal, s, cam.extrinsics)
    i, j = 5, 11  # row, col
    p = rays_o[0, i, j] + 0.9 * rays_d[0, i, j]
    u, v, z = project_vertices(
        p[None], cam.extrinsics[0], cam.focal[0, 0, 0], s
    )
    np.testing.assert_allclose(float(u[0]), j + 0.5, atol=1e-3)
    np.testing.assert_allclose(float(v[0]), i + 0.5, atol=1e-3)
    assert float(z[0]) > 0


def test_rasterize_depth_ordering_and_coverage():
    s = 32
    cam = _cam(s)
    # two large quads perpendicular to the optical axis at depths 0.95, 1.05
    def quad(zdist, half):
        # camera at (0,0,1) looking at origin -> plane z = 1 - zdist
        zw = 1.0 - zdist
        v = np.array(
            [[-half, -half, zw], [half, -half, zw],
             [half, half, zw], [-half, half, zw]],
            np.float32,
        )
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        return v, f

    v1, f1 = quad(0.95, 0.05)   # near, small
    v2, f2 = quad(1.05, 0.5)    # far, covers the whole frustum
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    colors = np.concatenate(
        [np.ones((4, 1), np.float32), np.zeros((4, 1), np.float32)]
    )
    color, depth, hit = jax.tree.map(
        np.asarray,
        rasterize_mesh(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(colors),
            cam.extrinsics[0], cam.focal[0, 0, 0], s,
        ),
    )
    assert hit.all()  # far quad covers everything
    c = s // 2
    np.testing.assert_allclose(color[c, c, 0], 1.0, atol=1e-5)  # near quad wins
    np.testing.assert_allclose(color[1, 1, 0], 0.0, atol=1e-5)  # far quad only
    assert abs(depth[1, 1] - 1.05) < 1e-2
    assert abs(depth[c, c] - 0.95) < 1e-2


def test_project_noise_map_keeps_base_outside():
    s = 16
    cam = _cam(s)
    v = np.array(
        [[-0.02, -0.02, 0.0], [0.02, -0.02, 0.0], [0.0, 0.03, 0.0]], np.float32
    )
    f = np.array([[0, 1, 2]], np.int32)
    vert_noise = np.full((3, 1), 7.0, np.float32)
    base = jnp.full((s, s, 1), -3.0)
    out = np.asarray(
        project_noise_map(
            v, f, vert_noise, cam.extrinsics[0], cam.focal[0, 0, 0], s,
            base_noise=base,
        )
    )
    assert (np.abs(out - 7.0) < 1e-4).any() and (out == -3.0).any()
    assert ((np.abs(out - 7.0) < 1e-4) | (out == -3.0)).all()


def test_shaded_mesh_image_range():
    s = 16
    cam = _cam(s)
    rng = np.random.RandomState(0)
    # a little bumpy grid facing the camera
    xs, ys = np.meshgrid(
        np.linspace(-0.05, 0.05, 6), np.linspace(-0.05, 0.05, 6), indexing="ij"
    )
    zs = rng.rand(6, 6) * 0.01
    verts = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.float32)
    ii, jj = np.meshgrid(np.arange(5), np.arange(5), indexing="ij")
    tl = (ii * 6 + jj).ravel()
    faces = np.concatenate(
        [np.stack([tl, tl + 6, tl + 1], 1), np.stack([tl + 1, tl + 6, tl + 7], 1)]
    ).astype(np.int32)
    img, depth = shaded_mesh_image(
        verts, faces, cam.extrinsics[0], cam.focal[0, 0, 0], s
    )
    assert img.shape == (s, s, 3)
    assert img.min() >= -1.0 - 1e-6 and img.max() <= 1.0 + 1e-6
    assert (depth > 0).any()
