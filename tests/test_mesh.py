"""Shape extraction tests: marching tetrahedra on analytic SDFs."""

import numpy as np
import jax
import jax.numpy as jnp

from cips3dpp_tpu.utils.mesh import (
    marching_tetrahedra,
    xyz_to_mesh,
    save_obj,
    extract_shape,
    depth_to_normal_shading,
)


def test_marching_tetrahedra_sphere():
    res = 32
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    xs, ys, zs = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf = np.sqrt(xs**2 + ys**2 + zs**2) - 0.6
    verts, faces = marching_tetrahedra(sdf, 0.0, coords=[lin, lin, lin])
    assert len(verts) > 100 and len(faces) > 100
    # all vertices close to the 0.6-sphere
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 0.6) < 0.02
    assert r.std() < 0.05
    # faces index valid vertices
    assert faces.max() < len(verts)


def test_marching_tetrahedra_empty():
    sdf = np.ones((8, 8, 8), np.float32)  # no surface
    verts, faces = marching_tetrahedra(sdf, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_save_obj(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    p = save_obj(verts, faces, str(tmp_path / "tri.obj"))
    text = open(p).read()
    assert text.count("v ") == 3 and "f 1 2 3" in text


def test_xyz_to_mesh():
    h = w = 8
    xyz = np.random.RandomState(0).rand(h, w, 3).astype(np.float32)
    verts, faces = xyz_to_mesh(xyz)
    assert verts.shape == (64, 3)
    assert faces.shape == (2 * 7 * 7, 3)
    mask = np.zeros((h, w), np.float32)
    _, faces_masked = xyz_to_mesh(xyz, mask)
    assert len(faces_masked) == 0


def test_depth_shading_shape():
    xyz = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    img = depth_to_normal_shading(xyz)
    assert img.shape == (8, 8, 3)
    assert img.min() >= -1 and img.max() <= 1


def test_extract_shape_from_generator():
    """Shape export from the (untrained, sphere-init-able) generator."""
    from test_models import tiny_config
    from cips3dpp_tpu.core import sample_cameras
    from cips3dpp_tpu.models.generator import Generator

    cfg = tiny_config()
    model = Generator(cfg)
    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), 1, cfg.img_size)
    zs = (jnp.zeros((1, 256)), jnp.zeros((1, 256)))
    params = model.init(
        {"params": key, "perturb": key, "noise": key},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    sr, _ = model.apply(params, zs, method="map_zs")
    verts, faces = extract_shape(model, params, sr, resolution=16, bounds=0.24)
    # untrained SDF may or may not cross zero; just require valid structure
    assert verts.ndim == 2 and verts.shape[1] == 3
    assert faces.ndim == 2 and faces.shape[1] == 3


def test_align_volume():
    from cips3dpp_tpu.utils.mesh import align_volume

    vol = np.zeros((16, 16, 8), np.float32)
    vol[8, 8, :] = -1.0  # a line of negative sdf along depth
    out = align_volume(vol)
    assert out.shape == vol.shape
    # center is inside the frustum at every depth
    assert out[8, 8].max() < 0.5
    # corners at the near plane fall outside the frustum -> forced positive
    assert out[0, 0, 0] == 1.0
