"""FID/KID machinery tests (feature nets with random weights on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cips3dpp_tpu.apps.eval_fid import (
    frechet_distance,
    kid,
    feature_stats,
    generate_images,
    eval_fid,
)


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, sig = feature_stats(f)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-3


def test_frechet_known_value():
    # Two isotropic Gaussians, same covariance I, means differing by d:
    # FID = |d|^2.
    d = 16
    mu1 = np.zeros(d)
    mu2 = np.full(d, 0.5)
    sig = np.eye(d)
    got = frechet_distance(mu1, sig, mu2, sig)
    np.testing.assert_allclose(got, 0.25 * d, atol=1e-3)


def test_frechet_separates_distributions():
    rng = np.random.RandomState(0)
    a = rng.randn(1000, 8)
    b = rng.randn(1000, 8) + 2.0
    mu_a, s_a = feature_stats(a)
    mu_b, s_b = feature_stats(b)
    near = frechet_distance(mu_a, s_a, *feature_stats(rng.randn(1000, 8)))
    far = frechet_distance(mu_a, s_a, mu_b, s_b)
    assert far > near * 10


def test_kid_same_distribution_near_zero():
    rng = np.random.RandomState(1)
    a = rng.randn(400, 8)
    b = rng.randn(400, 8)
    m_same, _ = kid(a, b, n_subsets=10, subset_size=100)
    m_diff, _ = kid(a, b + 1.5, n_subsets=10, subset_size=100)
    assert abs(m_same) < 0.1
    assert m_diff > m_same + 0.5


@pytest.mark.slow
def test_inception_forward_and_generate():
    from cips3dpp_tpu.models.inception import InceptionV3Features, init_inception

    v = init_inception(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    f = InceptionV3Features().apply(v, x)
    assert f.shape == (2, 2048)
    assert np.isfinite(np.asarray(f)).all()


@pytest.mark.slow
def test_eval_fid_tiny():
    """End-to-end FID with the tiny generator + random-weight Inception —
    structure-level check that the full pipeline runs."""
    from test_models import tiny_config
    from cips3dpp_tpu.core import sample_cameras
    from cips3dpp_tpu.models.generator import Generator
    from cips3dpp_tpu.models.inception import init_inception

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
    incep = init_inception(jax.random.PRNGKey(2))
    real = [np.tanh(np.random.RandomState(3).randn(4, 32, 32, 3)).astype(np.float32)
            for _ in range(2)]
    res = eval_fid(model, params, real, incep, n_fake=8, batch_size=4,
                   with_kid=False)
    assert np.isfinite(res.fid)
    assert res.n_fake == 8 and res.n_real == 8
