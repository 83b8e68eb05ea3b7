"""StyleSDF-baseline two-stage capability tests."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cips3dpp_tpu.core import sample_cameras
from cips3dpp_tpu.models.generator import Generator
from cips3dpp_tpu.models.discriminator import DStyleGANProgressive
from cips3dpp_tpu.models.discriminator_pose import DVolumeRenderProgressive
from cips3dpp_tpu.train.state import TrainConfig, create_train_state
from cips3dpp_tpu.train.steps import make_train_steps

from test_models import tiny_config


def test_stage1_no_decoder_forward():
    cfg = dataclasses.replace(tiny_config(), enable_decoder=False)
    model = Generator(cfg)
    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), 2, cfg.img_size)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    params = model.init(
        {"params": key, "perturb": key, "noise": key},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    out = model.apply(
        params, zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far, perturb=False,
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    # rgb IS the thumbnail in stage-1 mode
    np.testing.assert_array_equal(
        np.asarray(out["rgb"]), np.asarray(out["thumb_rgb"])
    )


def test_stage1_training_skips_decoder_d():
    gen_cfg = dataclasses.replace(
        tiny_config(img_size=8, upsample_list=(), n_samples=4),
        enable_decoder=False,
    )
    train_cfg = TrainConfig(batch=4, g_reg_every=-1)
    gen = Generator(gen_cfg)
    d_dec = DStyleGANProgressive(input_size=1024, channel_multiplier=1)
    d_ren = DVolumeRenderProgressive(input_size=64)

    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), 2, 8)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    state, txs = create_train_state(
        key, gen_cfg, train_cfg,
        lambda k: d_dec.init(k, jnp.zeros((2, 8, 8, 3))),
        lambda k: d_ren.init(k, jnp.zeros((2, 8, 8, 3))),
        lambda k: gen.init({"params": k, "perturb": k, "noise": k}, zs=zs,
                           cam_poses=cam.extrinsics, focals=cam.focal,
                           near=cam.near, far=cam.far),
    )
    d_step, g_step, _, _ = make_train_steps(gen, d_dec, d_ren, gen_cfg,
                                            train_cfg, txs)
    real = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 3)) * 0.1
    d_before = jax.tree.map(lambda x: x.copy(), state.params_d)
    state, dm = d_step(state, real, jax.random.PRNGKey(3), 1.0,
                       d_regularize=False)
    state, gm = g_step(state, jax.random.PRNGKey(4), 1.0)
    # pose-D losses live; decoder-D contributed nothing
    assert np.isfinite(float(dm["d_loss_gan_render"]))
    assert float(dm["d_loss_gan_decoder"]) == 0.0
    assert float(gm["g_loss_gan_decoder"]) == 0.0
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params_d, d_before
    )
    assert max(jax.tree.leaves(diff)) == 0.0  # decoder D untouched
    # renderer still trains
    assert np.isfinite(float(gm["g_loss_eikonal_render"]))


def test_stage1_to_stage2_renderer_graft(tmp_path):
    """The StyleSDF two-stage handoff (train_full_pipeline.py:484 loading
    the stage-1 volume-renderer checkpoint): a stage-1 (enable_decoder=False)
    checkpoint round-trips through orbax and grafts its renderer + render
    mapping into a fresh full-pipeline tree; decoder subtrees stay fresh,
    and the grafted model runs forward."""
    from cips3dpp_tpu.io.checkpoint import CheckpointManager, graft_renderer

    cfg1 = dataclasses.replace(
        tiny_config(img_size=8, upsample_list=(), n_samples=4),
        enable_decoder=False,
    )
    cfg2 = dataclasses.replace(
        tiny_config(img_size=8, upsample_list=(16,), n_samples=4)
    )
    cam = sample_cameras(jax.random.PRNGKey(1), 2, 8)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))

    def init(cfg, seed):
        k = jax.random.PRNGKey(seed)
        return Generator(cfg).init(
            {"params": k, "perturb": k, "noise": k}, zs=zs,
            cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
        )

    p1, p2 = init(cfg1, 7), init(cfg2, 8)

    # round-trip stage-1 params through a real checkpoint dir, template-free
    mngr = CheckpointManager(str(tmp_path / "stage1"))
    mngr.save(0, {"params_g_ema": p1})
    raw = mngr.restore_raw()
    mngr.close()

    grafted = graft_renderer(p2, raw["params_g_ema"])
    # renderer + render-mapping leaves == stage 1; decoder side untouched
    for k in grafted["params"]:
        src = (
            raw["params_g_ema"]["params"]
            if (k == "renderer"
                or (k.startswith("style_")
                    and not k.startswith("style_decoder")))
            else p2["params"]
        )
        same = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            grafted["params"][k], src[k],
        )
        assert all(jax.tree.leaves(same)), k

    out = Generator(cfg2).apply(
        grafted, zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far, perturb=False,
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()

    # a non-generator checkpoint fails loudly
    with pytest.raises(ValueError):
        graft_renderer(p2, {"params": {"not_a_renderer": {}}})


@pytest.mark.slow
def test_freeze_renderer_stage2():
    """Stage 2: frozen renderer — no gradient reaches renderer params."""
    gen_cfg = dataclasses.replace(
        tiny_config(img_size=8, upsample_list=(128,), n_samples=4),
        freeze_renderer=True, renderer_detach=True,
    )
    gen = Generator(gen_cfg)
    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), 2, 8)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    params = gen.init({"params": key, "perturb": key, "noise": key}, zs=zs,
                      cam_poses=cam.extrinsics, focals=cam.focal,
                      near=cam.near, far=cam.far)

    def loss(p):
        out = gen.apply(p, zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
                        near=cam.near, far=cam.far, perturb=False,
                        rngs={"noise": jax.random.PRNGKey(2)})
        return jnp.mean(jnp.square(out["rgb"]))

    grads = jax.grad(loss)(params)
    g_render = jax.tree.map(
        lambda x: float(jnp.abs(x).max()), grads["params"]["renderer"]
    )
    g_dec = jax.tree.map(
        lambda x: float(jnp.abs(x).max()), grads["params"]["decoder"]
    )
    assert max(jax.tree.leaves(g_render)) == 0.0
    assert max(jax.tree.leaves(g_dec)) > 0.0
