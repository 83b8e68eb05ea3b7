"""Triplane renderer: torch grid_sample oracle + forward/eikonal gates.

Contract: exp/cips3d/models/volume_renderer_v8.py:728-1008 (TriplaneRenderer;
its grid_sample_cus matches F.grid_sample bilinear/zeros/align_corners=False
with double-backward support, which JAX autodiff provides natively).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cips3dpp_tpu.models.triplane import (
    TriplaneConfig,
    TriplaneRenderer,
    generate_planes,
    grid_sample_bilinear,
    project_onto_planes,
)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    feat = rng.normal(size=(2, 7, 9, 4)).astype(np.float32)  # NHWC
    # coords beyond [-1, 1] exercise the zeros padding
    coords = rng.uniform(-1.3, 1.3, (2, 50, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_bilinear(jnp.asarray(feat), jnp.asarray(coords)))

    with torch.no_grad():
        t = F.grid_sample(
            torch.from_numpy(np.transpose(feat, (0, 3, 1, 2))),  # NCHW
            torch.from_numpy(coords[:, None]),  # (B, 1, N, 2)
            mode="bilinear", padding_mode="zeros", align_corners=False,
        )  # (B, C, 1, N)
    theirs = np.transpose(t.numpy()[:, :, 0, :], (0, 2, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_plane_projection_modes():
    for mode in ("xy_xz_yz", "xy_xz_zx"):
        axes = generate_planes(mode)
        coords = jnp.asarray(
            np.random.RandomState(1).uniform(-1, 1, (1, 5, 3)), jnp.float32
        )
        proj = project_onto_planes(axes, coords)
        assert proj.shape == (1, 3, 5, 2)
        # first plane is xy in both modes: identity projection
        np.testing.assert_allclose(
            np.asarray(proj[:, 0]), np.asarray(coords[..., :2]), atol=1e-6
        )


def test_triplane_renderer_forward_and_eikonal():
    cfg = TriplaneConfig(plane_channels=8, hidden_dim=16, view_n_freqs=2)
    model = TriplaneRenderer(cfg)
    B, R, S = 2, 6, 5
    rng = np.random.RandomState(2)
    planes = jnp.asarray(rng.normal(size=(B, 3, 8, 16, 16)), jnp.float32)
    # keep normalised pts (x * 2/(far-near) = x * 8.33) inside [-1, 1]:
    # fully out-of-plane points get exactly-zero features -> zero eikonal
    # rows -> NaN grad of norm at 0 (true for the torch reference too)
    pts = jnp.asarray(rng.uniform(-0.1, 0.1, (B, R, S, 3)), jnp.float32)
    rays_d = jnp.asarray(rng.normal(size=(B, R, 3)), jnp.float32)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_vals = jnp.broadcast_to(jnp.linspace(0.88, 1.12, S), (B, R, S))
    near = jnp.full((B, 1, 1), 0.88)
    far = jnp.full((B, 1, 1), 1.12)

    variables = model.init(
        jax.random.PRNGKey(0), planes, pts, rays_d, viewdirs, z_vals, near, far
    )
    rgb, feat, sdf, maskd, xyz, eik = model.apply(
        variables, planes, pts, rays_d, viewdirs, z_vals, near, far
    )
    assert rgb.shape == (B, R, 3)
    assert feat.shape == (B, R, cfg.hidden_dim)
    assert sdf.shape == (B, R, S, 1)
    assert xyz.shape == (B, R, 3)
    assert eik is None
    for a in (rgb, feat, sdf, maskd, xyz):
        assert bool(jnp.isfinite(a).all())

    # eikonal term = d(sdf)/d(pts); differentiable again for the loss grad
    def eik_loss(p):
        *_, e = model.apply(
            variables, planes, p, rays_d, viewdirs, z_vals, near, far,
            return_eikonal=True,
        )
        return jnp.mean(jnp.square(jnp.linalg.norm(e, axis=-1) - 1.0))

    g = jax.grad(eik_loss)(pts)
    assert g.shape == pts.shape
    assert bool(jnp.isfinite(g).all())

    # planes receive gradients (they are the generator's output in v8)
    gp = jax.grad(
        lambda pl: model.apply(
            variables, pl, pts, rays_d, viewdirs, z_vals, near, far
        )[0].sum()
    )(planes)
    assert float(jnp.abs(gp).max()) > 0
