"""Train-step smoke + semantics tests on a tiny model (CPU).

The reference can only exercise its training paths by launching
torch.distributed on GPUs (SURVEY.md §4); these run anywhere, including
the data-parallel path on the virtual 8-device mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cips3dpp_tpu.core import sample_cameras
from cips3dpp_tpu.models.generator import Generator
from cips3dpp_tpu.models.discriminator import DStyleGANProgressive
from cips3dpp_tpu.models.discriminator_pose import DVolumeRenderProgressive
from cips3dpp_tpu.train.state import (
    TrainConfig,
    create_train_state,
    make_g_optimizer,
    make_d_optimizer,
    make_d_render_optimizer,
)
from cips3dpp_tpu.train.steps import make_train_steps, ema_update, fade_alpha
from cips3dpp_tpu.parallel import make_mesh

from test_models import tiny_config


@pytest.fixture(scope="module")
def tiny_setup():
    gen_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)  # out 16^2
    train_cfg = TrainConfig(batch=4, gen_img_size=16, cam_img_size=8, data_img_size=16)
    gen = Generator(gen_cfg)
    d_dec = DStyleGANProgressive(input_size=1024, channel_multiplier=1)
    d_ren = DVolumeRenderProgressive(input_size=64)

    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=gen_cfg.img_size)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    out_size = gen_cfg.img_size * 2 ** len(gen_cfg.decoder.upsample_list)

    def g_init(k):
        return gen.init(
            {"params": k, "perturb": k, "noise": k},
            zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
        )

    def d_init(k):
        return d_dec.init(k, jnp.zeros((2, out_size, out_size, 3)))

    def dr_init(k):
        return d_ren.init(k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3)))

    state, txs = create_train_state(key, gen_cfg, train_cfg, d_init, dr_init, g_init)
    steps = make_train_steps(gen, d_dec, d_ren, gen_cfg, train_cfg, txs)
    return gen_cfg, train_cfg, state, steps, out_size


def test_d_step_updates_discriminators(tiny_setup):
    gen_cfg, train_cfg, state, (d_step, g_step, path_step, sphere_step), out = tiny_setup
    real = jax.random.normal(jax.random.PRNGKey(2), (4, out, out, 3)) * 0.1
    d_before = jax.tree.leaves(state.params_d)[0].copy()
    g_before = jax.tree.leaves(state.params_g)[0].copy()
    state2, metrics = d_step(state, real, jax.random.PRNGKey(3), 1.0, d_regularize=True)
    assert np.isfinite(float(metrics["d_loss_total"]))
    assert float(metrics["d_loss_r1_render"]) > 0  # R1 on pose D every step
    assert float(metrics["d_loss_gp_decoder"]) > 0  # lazy R1 active
    # D moved (some on-path parameter), G untouched
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state2.params_d, state.params_d
    )
    assert max(jax.tree.leaves(diff)) > 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state2.params_g)[0]), g_before
    )
    # state donated: carry forward for other tests via re-creation in fixtures


@pytest.mark.slow
def test_g_and_path_and_sphere_steps(tiny_setup):
    gen_cfg, train_cfg, state, (d_step, g_step, path_step, sphere_step), out = tiny_setup
    params_g_before = jax.tree.map(lambda x: x.copy(), state.params_g)
    state, gm = g_step(state, jax.random.PRNGKey(4), 0.5)
    for k in (
        "g_loss_gan_render",
        "g_loss_pose_render",
        "g_loss_eikonal_render",
        "g_loss_minimal_surface_render",
        "g_loss_gan_decoder",
    ):
        assert np.isfinite(float(gm[k])), k
    assert float(gm["g_loss_eikonal_render"]) > 0
    assert int(state.step) == 1
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params_g, params_g_before
    )
    assert max(jax.tree.leaves(diff)) > 0

    state, pm = path_step(state, jax.random.PRNGKey(5))
    assert np.isfinite(float(pm["g_loss_weighted_path"]))
    assert float(pm["path_length_mean"]) > 0

    state, sm = sphere_step(state, jax.random.PRNGKey(6))
    assert np.isfinite(float(sm["sphere_init_l1"]))

    state = ema_update(state, 0.999)
    # EMA close to params but not equal after updates
    ema0 = np.asarray(jax.tree.leaves(state.params_g_ema)[0])
    p0 = np.asarray(jax.tree.leaves(state.params_g)[0])
    assert ema0.shape == p0.shape


def test_fade_alpha():
    assert fade_alpha(0, 10_000) == 0.0
    assert fade_alpha(5_000, 10_000) == 0.5
    assert fade_alpha(20_000, 10_000) == 1.0
    assert fade_alpha(0, 10_000, fade=False) == 1.0


def test_sphere_init_converges(tiny_setup):
    """A few sphere-init steps reduce the L1 to the sphere SDF target
    (reference runs 10k iters, train_v10.py:595-668)."""
    gen_cfg, train_cfg, state, (d_step, g_step, path_step, sphere_step), out = tiny_setup
    losses = []
    for i in range(30):
        state, m = sphere_step(state, jax.random.PRNGKey(100 + i))
        losses.append(float(m["sphere_init_l1"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_data_parallel_d_step_on_mesh():
    """Same d_step under an 8-device data mesh: batch sharded, params
    replicated; replaces DDP + sync_gradients (train_v10.py:381,1267-1281)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    gen_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)
    train_cfg = TrainConfig(batch=8, gen_img_size=16, cam_img_size=8)
    gen = Generator(gen_cfg)
    d_dec = DStyleGANProgressive(input_size=1024, channel_multiplier=1)
    d_ren = DVolumeRenderProgressive(input_size=64)

    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=8)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    g_init = lambda k: gen.init(
        {"params": k, "perturb": k, "noise": k},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    d_init = lambda k: d_dec.init(k, jnp.zeros((2, 16, 16, 3)))
    dr_init = lambda k: d_ren.init(k, jnp.zeros((2, 8, 8, 3)))
    state, txs = create_train_state(key, gen_cfg, train_cfg, d_init, dr_init, g_init)

    mesh = make_mesh(8)
    from cips3dpp_tpu.parallel import shard_pytree

    state = shard_pytree(mesh, state)
    steps = make_train_steps(gen, d_dec, d_ren, gen_cfg, train_cfg, txs, mesh=mesh)
    d_step = steps[0]

    real = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 16, 3)) * 0.1
    real = jax.device_put(real, NamedSharding(mesh, P("data", None, None, None)))
    state2, metrics = d_step(state, real, jax.random.PRNGKey(3), 1.0, d_regularize=False)
    assert np.isfinite(float(metrics["d_loss_total"]))
    # updated params remain replicated
    leaf = jax.tree.leaves(state2.params_d)[0]
    assert leaf.sharding.is_fully_replicated


def test_sample_pixel_idx_modes():
    from cips3dpp_tpu.train.steps import sample_pixel_idx

    idx_h, idx_w = sample_pixel_idx(jax.random.PRNGKey(0), 4, 16, 6, "patch")
    assert idx_h.shape == (4, 6) and idx_w.shape == (4, 6)
    # contiguous window
    np.testing.assert_array_equal(
        np.diff(np.asarray(idx_h), axis=1), np.ones((4, 5), np.int32)
    )
    assert int(idx_h.max()) <= 15 and int(idx_h.min()) >= 0

    idx_h, idx_w = sample_pixel_idx(jax.random.PRNGKey(1), 4, 16, 6, "default")
    a = np.asarray(idx_h)
    # sorted, unique (without replacement), in range
    assert (np.diff(a, axis=1) >= 1).all()
    assert a.min() >= 0 and a.max() <= 15


def test_gather_image_pixels_blocks():
    from cips3dpp_tpu.train.steps import gather_image_pixels

    # encode (h, w) into the pixel value; factor-2 blocks
    h = w = 8
    img = (
        jnp.arange(h)[None, :, None, None] * 100.0
        + jnp.arange(w)[None, None, :, None]
    ) * jnp.ones((1, 1, 1, 1))
    idx_h = jnp.array([[1, 3]])
    idx_w = jnp.array([[0, 2]])
    out = gather_image_pixels(img, idx_h, idx_w, factor=2)
    # ray (1,0) owns pixel rows 2-3, cols 0-1
    expect_rows = np.array([2, 3, 6, 7])
    expect_cols = np.array([0, 1, 4, 5])
    np.testing.assert_array_equal(
        np.asarray(out[0, :, :, 0]),
        expect_rows[:, None] * 100.0 + expect_cols[None, :],
    )


def test_generator_sample_idx_matches_full_gather():
    """Fake-side alignment: rendering a ray subset == gathering the full
    render at those indices (model_v3.py:1061-1097 semantics)."""
    gen_cfg = tiny_config(img_size=8, upsample_list=(), n_samples=4)
    gen = Generator(gen_cfg)
    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=8)
    zs = (
        jax.random.normal(jax.random.PRNGKey(2), (2, 256)),
        jax.random.normal(jax.random.PRNGKey(3), (2, 256)),
    )
    kwargs = dict(
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far, perturb=False,
    )
    params = gen.init({"params": key, "noise": key}, **kwargs)
    full = gen.apply(params, rngs={"noise": key}, **kwargs)
    idx_h = jnp.tile(jnp.array([[0, 2, 5, 7]]), (2, 1))
    idx_w = jnp.tile(jnp.array([[1, 3, 4, 6]]), (2, 1))
    sub = gen.apply(
        params, sample_idx=(idx_h, idx_w), rngs={"noise": key}, **kwargs
    )
    gathered = np.asarray(full["thumb_rgb"])[:, idx_h[0]][:, :, idx_w[0]]
    np.testing.assert_allclose(
        np.asarray(sub["thumb_rgb"]), gathered, rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_patch_training_steps_run():
    """d_step/g_step with gen_img_size < cam_img_size: the D sees
    gen_img_size*factor fakes and matched gathered real pixels
    (train_v10.py:177-199, 339-353)."""
    gen_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)
    train_cfg = TrainConfig(
        batch=4, cam_img_size=8, gen_img_size=4, data_img_size=16,
        sample_mode="patch",
    )
    gen = Generator(gen_cfg)
    d_dec = DStyleGANProgressive(input_size=1024, channel_multiplier=1)
    # 4^2 thumbs have no 2^2 fade block; a real patch config disables fade
    d_ren = DVolumeRenderProgressive(input_size=64, pretrained_size=-1)
    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=8)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    g_init = lambda k: gen.init(
        {"params": k, "perturb": k, "noise": k},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    # D params init at the PATCH resolution it will see (8 = 4 * factor 2)
    d_init = lambda k: d_dec.init(k, jnp.zeros((2, 8, 8, 3)))
    dr_init = lambda k: d_ren.init(k, jnp.zeros((2, 4, 4, 3)))
    state, txs = create_train_state(key, gen_cfg, train_cfg, d_init, dr_init, g_init)
    d_step, g_step, _, _ = make_train_steps(gen, d_dec, d_ren, gen_cfg, train_cfg, txs)

    real = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 16, 3)) * 0.1
    state, dm = d_step(state, real, jax.random.PRNGKey(3), 1.0, d_regularize=True)
    assert np.isfinite(float(dm["d_loss_total"]))
    state, gm = g_step(state, jax.random.PRNGKey(4), 1.0)
    assert np.isfinite(float(gm["g_loss_total"]))


def test_diffaug_d_and_g_steps_run():
    """diffaug=True requires the 'diffaug' rng through every D apply
    (discriminator.py:200-208); round-1 wiring crashed at trace time."""
    gen_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)
    train_cfg = TrainConfig(batch=4, gen_img_size=16, cam_img_size=8)
    gen = Generator(gen_cfg)
    d_dec = DStyleGANProgressive(input_size=1024, channel_multiplier=1, diffaug=True)
    d_ren = DVolumeRenderProgressive(input_size=64)
    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=8)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    g_init = lambda k: gen.init(
        {"params": k, "perturb": k, "noise": k},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    d_init = lambda k: d_dec.init(
        {"params": k, "diffaug": k}, jnp.zeros((2, 16, 16, 3))
    )
    dr_init = lambda k: d_ren.init(k, jnp.zeros((2, 8, 8, 3)))
    state, txs = create_train_state(key, gen_cfg, train_cfg, d_init, dr_init, g_init)
    d_step, g_step, _, _ = make_train_steps(gen, d_dec, d_ren, gen_cfg, train_cfg, txs)

    real = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 16, 3)) * 0.1
    state, dm = d_step(state, real, jax.random.PRNGKey(3), 1.0, d_regularize=True)
    assert np.isfinite(float(dm["d_loss_total"]))
    state, gm = g_step(state, jax.random.PRNGKey(4), 1.0)
    assert np.isfinite(float(gm["g_loss_total"]))


@pytest.mark.slow
def test_bf16_discriminator_steps_run():
    """d_dtype='bfloat16' (HBM-halving image D): steps run, losses finite,
    R1 still positive through the bf16 net."""
    gen_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)
    train_cfg = TrainConfig(
        batch=4, gen_img_size=16, cam_img_size=8, d_dtype="bfloat16"
    )
    gen = Generator(gen_cfg)
    d_dec = DStyleGANProgressive(input_size=1024, channel_multiplier=1)
    d_ren = DVolumeRenderProgressive(input_size=64)
    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=8)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    g_init = lambda k: gen.init(
        {"params": k, "perturb": k, "noise": k},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    d_init = lambda k: d_dec.init(k, jnp.zeros((2, 16, 16, 3)))
    dr_init = lambda k: d_ren.init(k, jnp.zeros((2, 8, 8, 3)))
    state, txs = create_train_state(key, gen_cfg, train_cfg, d_init, dr_init, g_init)
    d_step, g_step, _, _ = make_train_steps(gen, d_dec, d_ren, gen_cfg, train_cfg, txs)

    real = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 16, 3)) * 0.1
    state, dm = d_step(state, real, jax.random.PRNGKey(3), 1.0, d_regularize=True)
    assert np.isfinite(float(dm["d_loss_total"]))
    assert float(dm["d_loss_gp_decoder"]) > 0
    state, gm = g_step(state, jax.random.PRNGKey(4), 1.0)
    assert np.isfinite(float(gm["g_loss_total"]))


@pytest.mark.slow
def test_chunked_r1_matches_full_batch():
    """d_r1_chunk accumulates grad(R1) over real-batch chunks; the update
    must match the fused single-pass R1 (mean of equal-chunk means ==
    batch mean; grad(gan)+grad(r1) == grad(gan+r1))."""
    gen_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)
    gen = Generator(gen_cfg)
    d_dec = DStyleGANProgressive(input_size=1024, channel_multiplier=1)
    d_ren = DVolumeRenderProgressive(input_size=64)

    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=gen_cfg.img_size)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    out = gen_cfg.img_size * 2 ** len(gen_cfg.decoder.upsample_list)

    def g_init(k):
        return gen.init(
            {"params": k, "perturb": k, "noise": k},
            zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
        )

    def d_init(k):
        return d_dec.init(k, jnp.zeros((2, out, out, 3)))

    def dr_init(k):
        return d_ren.init(k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3)))

    real = jax.random.normal(jax.random.PRNGKey(2), (4, out, out, 3)) * 0.1
    results = []
    for chunk in (None, 2):
        cfg_i = TrainConfig(
            batch=4, gen_img_size=out, cam_img_size=gen_cfg.img_size,
            data_img_size=out, d_r1_chunk=chunk,
        )
        state, txs = create_train_state(key, gen_cfg, cfg_i, d_init, dr_init, g_init)
        d_step = make_train_steps(gen, d_dec, d_ren, gen_cfg, cfg_i, txs)[0]
        s2, m = d_step(state, real, jax.random.PRNGKey(3), 1.0, d_regularize=True)
        results.append((s2, m))
    (s_full, m_full), (s_chunk, m_chunk) = results
    np.testing.assert_allclose(
        float(m_full["d_loss_gp_decoder"]),
        float(m_chunk["d_loss_gp_decoder"]), rtol=1e-3,
    )
    # Post-Adam params: with b1=0 the first-step update is ~sign(g)*lr, so
    # fp-level grad differences flip signs exactly where g ~ 0. Bound the
    # worst case by one update magnitude and require near-exactness for the
    # overwhelming majority of parameters.
    lr_bound = 3.0 * 2e-3  # ~update magnitude at lr_decoder
    total = mismatched = 0
    for a, b in zip(jax.tree.leaves(s_full.params_d),
                    jax.tree.leaves(s_chunk.params_d)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < lr_bound
        mismatched += int((d > 1e-5).sum())
        total += d.size
    assert mismatched / total < 0.02, (mismatched, total)


@pytest.mark.parametrize("d_regularize", [False, True])
def test_d_seq_matches_fused(d_regularize):
    """d_seq accumulates decoder-D grads sequentially over (fake, real);
    the logistic loss is separable so the update must match the fused
    two-pass form exactly (minibatch stddev still sees the full batch)."""
    gen_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)
    gen = Generator(gen_cfg)
    d_dec = DStyleGANProgressive(input_size=1024, channel_multiplier=1)
    d_ren = DVolumeRenderProgressive(input_size=64)

    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=gen_cfg.img_size)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    out = gen_cfg.img_size * 2 ** len(gen_cfg.decoder.upsample_list)

    def g_init(k):
        return gen.init(
            {"params": k, "perturb": k, "noise": k},
            zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
        )

    def d_init(k):
        return d_dec.init(k, jnp.zeros((2, out, out, 3)))

    def dr_init(k):
        return d_ren.init(k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3)))

    real = jax.random.normal(jax.random.PRNGKey(2), (4, out, out, 3)) * 0.1
    results = []
    for d_seq in (False, True):
        cfg_i = TrainConfig(
            batch=4, gen_img_size=out, cam_img_size=gen_cfg.img_size,
            data_img_size=out, d_seq=d_seq, d_r1_chunk=2,
        )
        state, txs = create_train_state(key, gen_cfg, cfg_i, d_init, dr_init, g_init)
        d_step = make_train_steps(gen, d_dec, d_ren, gen_cfg, cfg_i, txs)[0]
        s2, m = d_step(
            state, real, jax.random.PRNGKey(3), 1.0, d_regularize=d_regularize
        )
        results.append((s2, m))
    (s_fused, m_fused), (s_seq, m_seq) = results
    for k in ("d_loss_gan_decoder", "d_logits_real_decoder",
              "d_logits_fake_decoder", "d_loss_total"):
        np.testing.assert_allclose(
            float(m_fused[k]), float(m_seq[k]), rtol=1e-4, atol=1e-6
        )
    # same sign-flip caveat as the chunked-R1 test (Adam b1=0 first step)
    lr_bound = 3.0 * 2e-3
    total = mismatched = 0
    for a, b in zip(jax.tree.leaves(s_fused.params_d),
                    jax.tree.leaves(s_seq.params_d)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < lr_bound
        mismatched += int((d > 1e-5).sum())
        total += d.size
    assert mismatched / total < 0.02, (mismatched, total)


@pytest.mark.parametrize("d_regularize", [False, True])
def test_d_cat_matches_fused(d_regularize):
    """d_cat runs ONE concatenated batch-(2n) decoder-D pass with a
    per-sample sign split of the separable logistic loss and per-half
    minibatch-stddev; it must match the fused two-pass form exactly
    (diffaug off — with aug on only the RNG stream differs)."""
    gen_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)
    gen = Generator(gen_cfg)
    d_dec = DStyleGANProgressive(input_size=1024, channel_multiplier=1)
    d_ren = DVolumeRenderProgressive(input_size=64)

    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=gen_cfg.img_size)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    out = gen_cfg.img_size * 2 ** len(gen_cfg.decoder.upsample_list)

    def g_init(k):
        return gen.init(
            {"params": k, "perturb": k, "noise": k},
            zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
        )

    def d_init(k):
        return d_dec.init(k, jnp.zeros((2, out, out, 3)))

    def dr_init(k):
        return d_ren.init(k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3)))

    real = jax.random.normal(jax.random.PRNGKey(2), (4, out, out, 3)) * 0.1
    results = []
    for d_cat in (False, True):
        cfg_i = TrainConfig(
            batch=4, gen_img_size=out, cam_img_size=gen_cfg.img_size,
            data_img_size=out, d_cat=d_cat, d_r1_chunk=2,
        )
        state, txs = create_train_state(key, gen_cfg, cfg_i, d_init, dr_init, g_init)
        d_step = make_train_steps(gen, d_dec, d_ren, gen_cfg, cfg_i, txs)[0]
        s2, m = d_step(
            state, real, jax.random.PRNGKey(3), 1.0, d_regularize=d_regularize
        )
        results.append((s2, m))
    (s_fused, m_fused), (s_cat, m_cat) = results
    for k in ("d_loss_gan_decoder", "d_logits_real_decoder",
              "d_logits_fake_decoder", "d_loss_total"):
        np.testing.assert_allclose(
            float(m_fused[k]), float(m_cat[k]), rtol=1e-4, atol=1e-6
        )
    # same sign-flip caveat as the chunked-R1 test (Adam b1=0 first step)
    lr_bound = 3.0 * 2e-3
    total = mismatched = 0
    for a, b in zip(jax.tree.leaves(s_fused.params_d),
                    jax.tree.leaves(s_cat.params_d)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < lr_bound
        mismatched += int((d > 1e-5).sum())
        total += d.size
    assert mismatched / total < 0.02, (mismatched, total)


def test_d_cat_diffaug_runs_with_independent_halves():
    """With diffaug ON, d_cat pre-augments each half with its own key; the
    step must run and produce finite losses (exact RNG-stream parity with
    the two-pass form is not claimed — see steps.py d_cat note)."""
    gen_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)
    gen = Generator(gen_cfg)
    d_dec = DStyleGANProgressive(
        input_size=1024, channel_multiplier=1, diffaug=True
    )
    d_ren = DVolumeRenderProgressive(input_size=64)

    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=gen_cfg.img_size)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    out = gen_cfg.img_size * 2 ** len(gen_cfg.decoder.upsample_list)

    def g_init(k):
        return gen.init(
            {"params": k, "perturb": k, "noise": k},
            zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
        )

    def d_init(k):
        return d_dec.init(
            {"params": k, "diffaug": k}, jnp.zeros((2, out, out, 3))
        )

    def dr_init(k):
        return d_ren.init(k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3)))

    real = jax.random.normal(jax.random.PRNGKey(2), (4, out, out, 3)) * 0.1
    cfg_i = TrainConfig(
        batch=4, gen_img_size=out, cam_img_size=gen_cfg.img_size,
        data_img_size=out, d_cat=True, d_r1_chunk=2,
    )
    state, txs = create_train_state(key, gen_cfg, cfg_i, d_init, dr_init, g_init)
    d_step = make_train_steps(gen, d_dec, d_ren, gen_cfg, cfg_i, txs)[0]
    s2, m = d_step(state, real, jax.random.PRNGKey(3), 1.0, d_regularize=False)
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, v)


def test_renderer_remat_g_step_matches():
    """renderer.remat recomputes the SIREN trunk in backward — the g_step
    update (incl. the eikonal pts-vjp, a grad-of-grad through the remat)
    must match the non-remat form to fp tolerance."""
    import dataclasses as dc

    base_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)
    out = base_cfg.img_size * 2 ** len(base_cfg.decoder.upsample_list)
    results = []
    for remat in (False, True):
        gen_cfg = dc.replace(
            base_cfg, renderer=dc.replace(base_cfg.renderer, remat=remat)
        )
        gen = Generator(gen_cfg)
        d_dec = DStyleGANProgressive(input_size=1024, channel_multiplier=1)
        d_ren = DVolumeRenderProgressive(input_size=64)
        key = jax.random.PRNGKey(0)
        cam = sample_cameras(jax.random.PRNGKey(1), batch=2,
                             img_size=gen_cfg.img_size)
        zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
        cfg_i = TrainConfig(
            batch=2, gen_img_size=out, cam_img_size=gen_cfg.img_size,
            data_img_size=out, eikonal_reg=True, lambda_eikonal=0.1,
        )
        state, txs = create_train_state(
            key, gen_cfg, cfg_i,
            lambda k: d_dec.init(k, jnp.zeros((2, out, out, 3))),
            lambda k: d_ren.init(
                k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3))
            ),
            lambda k: gen.init(
                {"params": k, "perturb": k, "noise": k},
                zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
                near=cam.near, far=cam.far,
            ),
        )
        g_step = make_train_steps(gen, d_dec, d_ren, gen_cfg, cfg_i, txs)[1]
        s2, m = g_step(state, jax.random.PRNGKey(7), 1.0)
        results.append((s2, m))
    (s_base, m_base), (s_remat, m_remat) = results
    for k in m_base:
        np.testing.assert_allclose(
            float(m_base[k]), float(m_remat[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )
    for a, b in zip(jax.tree.leaves(s_base.params_g),
                    jax.tree.leaves(s_remat.params_g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_minibatch_stddev_split_matches_per_half():
    """minibatch_stddev(split=k) == concat of per-half statistics."""
    from cips3dpp_tpu.models.discriminator import minibatch_stddev

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 16))
    got = minibatch_stddev(x, split=4)
    want = jnp.concatenate(
        [minibatch_stddev(x[:4]), minibatch_stddev(x[4:])], axis=0
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_prefetch_to_device_order_and_sharding():
    """prefetch_to_device preserves stream order/values, tolerates short
    streams, and lands batches on the data-sharded mesh layout the step
    fns expect (VERDICT r2 weak #8: per-iter synchronous device_put)."""
    from cips3dpp_tpu.parallel import (
        make_mesh, data_sharding, prefetch_to_device,
    )

    batches = [np.full((8, 4), i, np.float32) for i in range(5)]
    out = list(prefetch_to_device(iter(batches)))
    assert len(out) == 5
    for i, o in enumerate(out):
        np.testing.assert_array_equal(np.asarray(o), batches[i])

    mesh = make_mesh(8)
    sh = data_sharding(mesh)
    out = list(prefetch_to_device(iter(batches), sh, size=3))
    assert len(out) == 5
    for i, o in enumerate(out):
        assert o.sharding.is_equivalent_to(sh, o.ndim)
        np.testing.assert_array_equal(np.asarray(o), batches[i])

    # empty + shorter-than-queue streams
    assert list(prefetch_to_device(iter([]))) == []
    assert len(list(prefetch_to_device(iter(batches[:1]), size=4))) == 1
