"""LPIPS metric tests (utils/lpips.py).

Reference reports PSNR/SSIM/LPIPS after inversion (projector_v10.py:1266-1275).
"""

import numpy as np
import jax
import jax.numpy as jnp

from cips3dpp_tpu.utils.lpips import (
    lpips,
    init_lpips,
    import_lpips_torch,
    LPIPS_TAPS,
    LPIPS_CHANNELS,
)


def test_lpips_zero_for_identical_and_positive_otherwise():
    v = init_lpips(jax.random.PRNGKey(0), img_size=32)
    a = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
    b = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 2 - 1
    assert float(lpips(v, a, a)) == 0.0
    assert float(lpips(v, a, b)) > 0.0
    # symmetric
    np.testing.assert_allclose(
        float(lpips(v, a, b)), float(lpips(v, b, a)), rtol=1e-6
    )


def test_lpips_import_shapes():
    # synthetic torch state dicts with the real key layout
    rng = np.random.RandomState(0)
    vgg_sd = {}
    plan = [
        (0, 64, 3), (2, 64, 64), (5, 128, 64), (7, 128, 128),
        (10, 256, 128), (12, 256, 256), (14, 256, 256),
        (17, 512, 256), (19, 512, 512), (21, 512, 512),
        (24, 512, 512), (26, 512, 512), (28, 512, 512),
    ]
    for idx, out_c, in_c in plan:
        vgg_sd[f"features.{idx}.weight"] = rng.randn(out_c, in_c, 3, 3).astype(
            np.float32
        )
        vgg_sd[f"features.{idx}.bias"] = rng.randn(out_c).astype(np.float32)
    lpips_sd = {
        f"lin{k}.model.1.weight": np.abs(
            rng.randn(1, LPIPS_CHANNELS[idx], 1, 1)
        ).astype(np.float32)
        for k, idx in enumerate(LPIPS_TAPS)
    }
    v = import_lpips_torch(vgg_sd, lpips_sd)
    a = jnp.zeros((1, 64, 64, 3))
    b = jnp.ones((1, 64, 64, 3)) * 0.5
    d = float(lpips(v, a, b))
    assert np.isfinite(d) and d > 0
