"""Numerical 1-device vs 8-device data-parallel equivalence.

The reference could only prove DDP correctness by launching N GPUs
(exp/tests/test_cips3dpp.py:817-818) and never asserted numerical
equivalence. Here the same jitted step runs with mesh=None and on the
8-device CPU mesh with the SAME rng keys and global batch; GSPMD's
psum-via-global-mean must reproduce the single-device result (the
semantics of ddp_utils.sync_gradients' all-reduce/world,
exp/stylesdf/models/distributed.py:57-66) to reduction-order tolerance.

Covers every step variant the dryrun exercises: d_step (incl. lazy R1
grad-of-grad), g_step (eikonal vjp), path_step (double backward), and
ema_update.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cips3dpp_tpu.core import sample_cameras
from cips3dpp_tpu.models.generator import (
    Generator,
    GeneratorConfig,
    RendererConfig,
    DecoderConfig,
)
from cips3dpp_tpu.models.discriminator import DStyleGANProgressive
from cips3dpp_tpu.models.discriminator_pose import DVolumeRenderProgressive
from cips3dpp_tpu.train.state import TrainConfig, create_train_state
from cips3dpp_tpu.train.steps import make_train_steps, ema_update
from cips3dpp_tpu.parallel import make_mesh, shard_pytree


def _max_abs_diff(a, b):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b)
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(leaves_a, leaves_b)
    )


@pytest.fixture(scope="module")
def equiv_setup():
    # dryrun-sized graph: 3 decoder blocks, right-sized Ds (keeps the four
    # XLA-CPU compiles in the low minutes on a 1-core host)
    gen_cfg = GeneratorConfig(
        renderer=RendererConfig(n_layers=2, hidden_dim=32),
        decoder=DecoderConfig(
            size_end=32, upsample_list=(16,), style_dim=64, mapping_n_layers=2
        ),
        img_size=8,
        n_samples=4,
    )
    train_cfg = TrainConfig(batch=8)
    gen = Generator(gen_cfg)
    out_size = gen_cfg.out_size
    d_dec = DStyleGANProgressive(input_size=out_size, channel_multiplier=1)
    d_ren = DVolumeRenderProgressive(input_size=gen_cfg.img_size)

    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=gen_cfg.img_size)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    state, _ = create_train_state(
        jax.random.PRNGKey(0),
        gen_cfg,
        train_cfg,
        lambda k: d_dec.init(k, jnp.zeros((2, out_size, out_size, 3))),
        lambda k: d_ren.init(
            k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3))
        ),
        lambda k: gen.init(
            {"params": k, "perturb": k, "noise": k},
            zs=zs,
            cam_poses=cam.extrinsics,
            focals=cam.focal,
            near=cam.near,
            far=cam.far,
        ),
    )
    # Plain SGD(lr=1): params' - params == -grad, so the param comparison
    # IS the gradient comparison (DDP gather_grad/world semantics). Adam
    # with b1=0 would amplify reduction-order noise on near-zero grads to
    # +-lr (first update ~ lr*sign(g)), making tolerances meaningless.
    import optax

    txs = (optax.sgd(1.0), optax.sgd(1.0), optax.sgd(1.0))
    state = state.replace(
        opt_g=txs[0].init(state.params_g),
        opt_d=txs[1].init(state.params_d),
        opt_d_render=txs[2].init(state.params_d_render),
    )

    steps_1 = make_train_steps(gen, d_dec, d_ren, gen_cfg, train_cfg, txs)
    mesh = make_mesh(8)
    steps_8 = make_train_steps(
        gen, d_dec, d_ren, gen_cfg, train_cfg, txs, mesh=mesh
    )
    real = jax.random.normal(
        jax.random.PRNGKey(2), (train_cfg.batch, out_size, out_size, 3)
    )
    return state, steps_1, steps_8, mesh, real


@pytest.mark.slow
def test_d_step_mesh_equivalence(equiv_setup):
    from jax.sharding import NamedSharding, PartitionSpec as P

    state, steps_1, steps_8, mesh, real = equiv_setup
    s1, m1 = steps_1[0](state, real, jax.random.PRNGKey(3), 0.5, d_regularize=True)

    state_m = shard_pytree(mesh, state)
    real_m = jax.device_put(real, NamedSharding(mesh, P("data", None, None, None)))
    s8, m8 = steps_8[0](state_m, real_m, jax.random.PRNGKey(3), 0.5, d_regularize=True)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )
    assert _max_abs_diff(s1.params_d, s8.params_d) < 1e-4
    assert _max_abs_diff(s1.params_d_render, s8.params_d_render) < 1e-4


@pytest.mark.slow
def test_g_step_mesh_equivalence(equiv_setup):
    state, steps_1, steps_8, mesh, _ = equiv_setup
    s1, m1 = steps_1[1](state, jax.random.PRNGKey(4), 0.5)
    s8, m8 = steps_8[1](shard_pytree(mesh, state), jax.random.PRNGKey(4), 0.5)
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )
    assert _max_abs_diff(s1.params_g, s8.params_g) < 1e-4


@pytest.mark.slow
def test_path_step_mesh_equivalence(equiv_setup):
    state, steps_1, steps_8, mesh, _ = equiv_setup
    s1, m1 = steps_1[2](state, jax.random.PRNGKey(5))
    s8, m8 = steps_8[2](shard_pytree(mesh, state), jax.random.PRNGKey(5))
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )
    assert _max_abs_diff(s1.params_g, s8.params_g) < 1e-4
    np.testing.assert_allclose(
        float(s1.mean_path_length), float(s8.mean_path_length), rtol=1e-5
    )


def test_ray_sharded_render_equivalence(equiv_setup):
    """Ray-axis sharding (this model's sequence-parallel analog, SURVEY.md
    §2c): the volume render with rays sharded over a 2-axis (data, ray)
    mesh must equal the unsharded render — the per-ray computation is
    independent, so GSPMD needs no collectives, only a layout."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cips3dpp_tpu.core.rays import prepare_nerf_inputs
    from cips3dpp_tpu.kernels.siren_render import siren_render_reference

    state, _, _, _, _ = equiv_setup
    gen_cfg = GeneratorConfig(
        renderer=RendererConfig(n_layers=2, hidden_dim=32),
        decoder=DecoderConfig(
            size_end=32, upsample_list=(16,), style_dim=64, mapping_n_layers=2
        ),
        img_size=8,
        n_samples=4,
    )
    mesh2 = make_mesh(8, ray=2)
    assert mesh2.shape == {"data": 4, "ray": 2}
    b = 4
    cam = sample_cameras(jax.random.PRNGKey(7), b, gen_cfg.img_size)
    pts, rays_d, viewdirs, z_vals = prepare_nerf_inputs(
        cam.focal, gen_cfg.img_size, cam.extrinsics, cam.near, cam.far,
        gen_cfg.n_samples, perturb=False,
    )
    r = gen_cfg.img_size**2
    flat = lambda a: a.reshape(b, r, *a.shape[3:])
    rp = state.params_g["params"]["renderer"]
    gen = Generator(gen_cfg)
    zs = (
        jax.random.normal(jax.random.PRNGKey(8), (1, 256)),
        jax.random.normal(jax.random.PRNGKey(9), (1, 256)),
    )
    style = gen.apply(state.params_g, zs, method="map_zs")[0][0]
    near = cam.near.reshape(-1)[0]
    far = cam.far.reshape(-1)[0]

    @jax.jit
    def render(rp, style, pts, vd, zv, rd):
        f = jax.vmap(
            lambda p, v, z, d: siren_render_reference(
                rp, style, p, v, z, d, near, far
            )
        )
        return f(pts, vd, zv, rd)[0]

    args = (flat(pts), flat(viewdirs), flat(z_vals), flat(rays_d))
    ref = render(rp, style, *args)

    spec = lambda nd: NamedSharding(
        mesh2, P("data", "ray", *([None] * (nd - 2)))
    )
    rep = NamedSharding(mesh2, P())
    args_s = tuple(jax.device_put(a, spec(a.ndim)) for a in args)
    out = render(
        jax.device_put(rp, rep), jax.device_put(style, rep), *args_s
    )
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


@pytest.fixture(scope="module", params=["float32", "bfloat16"])
def prod_equiv_setup(request):
    """The RECORDED-BENCHMARK d_step configuration (BENCH_TRAIN_r03: bf16
    Ds, chunked lazy R1, DiffAugment) — the exact variant the quick
    equivalence fixture above leaves out. If a sharding bug hides anywhere,
    it's in the chunked-R1 scan / diffaug rng / bf16 interplay.

    Parametrized over D compute dtype: the fp32 run proves the chunked-R1 /
    diffaug sharding machinery at tight tolerance; the bf16 run (the
    recorded config) documents the looser bound — minibatch-stddev couples
    every example to the batch statistics, so bf16 rounding of those
    statistics reaches all activations, not just the final loss reduction."""
    gen_cfg = GeneratorConfig(
        renderer=RendererConfig(n_layers=2, hidden_dim=32),
        decoder=DecoderConfig(
            size_end=32, upsample_list=(16,), style_dim=64, mapping_n_layers=2
        ),
        img_size=8,
        n_samples=4,
    )
    train_cfg = TrainConfig(batch=8, d_r1_chunk=2, d_dtype=request.param)
    gen = Generator(gen_cfg)
    out_size = gen_cfg.out_size
    d_dec = DStyleGANProgressive(
        input_size=out_size, channel_multiplier=1, diffaug=True
    )
    d_ren = DVolumeRenderProgressive(input_size=gen_cfg.img_size)

    cam = sample_cameras(jax.random.PRNGKey(1), batch=2, img_size=gen_cfg.img_size)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    state, _ = create_train_state(
        jax.random.PRNGKey(0),
        gen_cfg,
        train_cfg,
        lambda k: d_dec.init(
            {"params": k, "diffaug": k},
            jnp.zeros((2, out_size, out_size, 3)),
        ),
        lambda k: d_ren.init(
            k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3))
        ),
        lambda k: gen.init(
            {"params": k, "perturb": k, "noise": k},
            zs=zs,
            cam_poses=cam.extrinsics,
            focals=cam.focal,
            near=cam.near,
            far=cam.far,
        ),
    )
    import optax

    txs = (optax.sgd(1.0), optax.sgd(1.0), optax.sgd(1.0))
    state = state.replace(
        opt_g=txs[0].init(state.params_g),
        opt_d=txs[1].init(state.params_d),
        opt_d_render=txs[2].init(state.params_d_render),
    )
    steps_1 = make_train_steps(gen, d_dec, d_ren, gen_cfg, train_cfg, txs)
    mesh = make_mesh(8)
    steps_8 = make_train_steps(
        gen, d_dec, d_ren, gen_cfg, train_cfg, txs, mesh=mesh
    )
    real = jax.random.normal(
        jax.random.PRNGKey(2), (train_cfg.batch, out_size, out_size, 3)
    )
    # measured bf16 noise floor on this graph: params ~7.4e-3 (see fixture
    # docstring for the mb-stddev mechanism); fp32 sits at the reduction
    # floor like the plain fixture above
    tols = (
        {"metrics_rtol": 1e-4, "params": 1e-4}
        if request.param == "float32"
        else {"metrics_rtol": 2e-3, "params": 2e-2}
    )
    return state, steps_1, steps_8, mesh, real, train_cfg, (gen, d_dec, d_ren, gen_cfg, txs), tols


@pytest.mark.slow
def test_d_step_production_variant_mesh_equivalence(prod_equiv_setup):
    """1-dev vs 8-dev for d_step with d_r1_chunk=2 + diffaug, fp32 AND bf16
    (the recorded-benchmark configuration)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    state, steps_1, steps_8, mesh, real, _, _, tols = prod_equiv_setup
    s1, m1 = steps_1[0](state, real, jax.random.PRNGKey(3), 0.5, d_regularize=True)

    state_m = shard_pytree(mesh, state)
    real_m = jax.device_put(real, NamedSharding(mesh, P("data", None, None, None)))
    s8, m8 = steps_8[0](state_m, real_m, jax.random.PRNGKey(3), 0.5, d_regularize=True)

    assert "d_loss_gp_decoder" in m1  # the chunked-R1 scan actually ran
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=tols["metrics_rtol"], atol=1e-4,
            err_msg=k,
        )
    assert _max_abs_diff(s1.params_d, s8.params_d) < tols["params"]
    assert _max_abs_diff(s1.params_d_render, s8.params_d_render) < tols["params"]


@pytest.mark.slow
def test_d_step_d_seq_mesh_equivalence(prod_equiv_setup):
    """1-dev vs 8-dev for the d_seq variant (sequential fake/real decoder-D
    grad accumulation): the scan body's full-batch D pass must shard over
    'data' exactly like the fused two-pass form."""
    import dataclasses
    from jax.sharding import NamedSharding, PartitionSpec as P

    state, _, _, mesh, real, train_cfg, parts, tols = prod_equiv_setup
    gen, d_dec, d_ren, gen_cfg, txs = parts
    cfg_seq = dataclasses.replace(train_cfg, d_seq=True)
    steps_1 = make_train_steps(gen, d_dec, d_ren, gen_cfg, cfg_seq, txs)
    steps_8 = make_train_steps(gen, d_dec, d_ren, gen_cfg, cfg_seq, txs, mesh=mesh)

    s1, m1 = steps_1[0](state, real, jax.random.PRNGKey(3), 0.5, d_regularize=True)
    state_m = shard_pytree(mesh, state)
    real_m = jax.device_put(real, NamedSharding(mesh, P("data", None, None, None)))
    s8, m8 = steps_8[0](state_m, real_m, jax.random.PRNGKey(3), 0.5, d_regularize=True)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=tols["metrics_rtol"], atol=1e-4,
            err_msg=k,
        )
    assert _max_abs_diff(s1.params_d, s8.params_d) < tols["params"]
    assert _max_abs_diff(s1.params_d_render, s8.params_d_render) < tols["params"]


@pytest.mark.slow
def test_d_step_d_cat_mesh_equivalence(prod_equiv_setup):
    """1-dev vs 8-dev for the d_cat variant (concatenated fake/real
    decoder-D pass): the batch-(2n) concat axis must shard over 'data' and
    the per-half minibatch-stddev slices must stay shard-consistent."""
    import dataclasses
    from jax.sharding import NamedSharding, PartitionSpec as P

    state, _, _, mesh, real, train_cfg, parts, tols = prod_equiv_setup
    gen, d_dec, d_ren, gen_cfg, txs = parts
    cfg_cat = dataclasses.replace(train_cfg, d_cat=True)
    steps_1 = make_train_steps(gen, d_dec, d_ren, gen_cfg, cfg_cat, txs)
    steps_8 = make_train_steps(gen, d_dec, d_ren, gen_cfg, cfg_cat, txs, mesh=mesh)

    s1, m1 = steps_1[0](state, real, jax.random.PRNGKey(3), 0.5, d_regularize=True)
    state_m = shard_pytree(mesh, state)
    real_m = jax.device_put(real, NamedSharding(mesh, P("data", None, None, None)))
    s8, m8 = steps_8[0](state_m, real_m, jax.random.PRNGKey(3), 0.5, d_regularize=True)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=tols["metrics_rtol"], atol=1e-4,
            err_msg=k,
        )
    assert _max_abs_diff(s1.params_d, s8.params_d) < tols["params"]
    assert _max_abs_diff(s1.params_d_render, s8.params_d_render) < tols["params"]


@pytest.mark.slow
def test_g_step_2axis_mesh_equivalence(prod_equiv_setup):
    """g_step on the 2-axis (data x ray) mesh == single device: the batch
    shards over data=4 and the ray axis adds a second mesh dimension the
    sharding constraints must stay compatible with. Run once, on the fp32
    variant (tight tolerance; the bf16 delta is covered by the d_step
    test)."""
    state, steps_1, _, _, _, train_cfg, modules, tols = prod_equiv_setup
    if train_cfg.d_dtype != "float32":
        pytest.skip("2-axis layout correctness is proven on the fp32 variant")
    gen, d_dec, d_ren, gen_cfg, txs = modules

    mesh2 = make_mesh(8, ray=2)
    assert mesh2.shape == {"data": 4, "ray": 2}
    steps_2ax = make_train_steps(
        gen, d_dec, d_ren, gen_cfg, train_cfg, txs, mesh=mesh2
    )

    s1, m1 = steps_1[1](state, jax.random.PRNGKey(4), 0.5)
    s2, m2 = steps_2ax[1](shard_pytree(mesh2, state), jax.random.PRNGKey(4), 0.5)
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=tols["metrics_rtol"], atol=1e-4,
            err_msg=k,
        )
    assert _max_abs_diff(s1.params_g, s2.params_g) < tols["params"]


def test_ema_update_mesh_equivalence(equiv_setup):
    state, _, _, mesh, _ = equiv_setup
    # perturb params so ema actually moves
    bumped = state.replace(
        params_g=jax.tree.map(lambda x: x + 0.01, state.params_g)
    )
    s1 = ema_update(bumped, 0.99)
    s8 = ema_update(shard_pytree(mesh, bumped), 0.99)
    assert _max_abs_diff(s1.params_g_ema, s8.params_g_ema) < 1e-6
    leaf = jax.tree.leaves(s8.params_g_ema)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_g_step_dec_bf16_mesh_equivalence():
    """1-dev vs 8-dev g_step with a bfloat16-compute decoder — the round-5
    record-candidate config (tools/ab_gstep_dec.py measured g_step 229 vs
    350 ms on chip). Same pattern as the bf16-D production variant: bf16
    rounding of decoder activations reaches the loss, so the bound is the
    documented bf16 floor, not the fp32 reduction floor."""
    import dataclasses
    import optax
    from jax.sharding import NamedSharding  # noqa: F401 (parity w/ siblings)

    gen_cfg = GeneratorConfig(
        renderer=RendererConfig(n_layers=2, hidden_dim=32),
        decoder=DecoderConfig(
            size_end=32, upsample_list=(16,), style_dim=64,
            mapping_n_layers=2, dtype="bfloat16",
        ),
        img_size=8,
        n_samples=4,
    )
    train_cfg = TrainConfig(batch=8)
    gen = Generator(gen_cfg)
    out_size = gen_cfg.out_size
    d_dec = DStyleGANProgressive(input_size=out_size, channel_multiplier=1)
    d_ren = DVolumeRenderProgressive(input_size=gen_cfg.img_size)

    cam = sample_cameras(jax.random.PRNGKey(1), batch=2,
                         img_size=gen_cfg.img_size)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    state, _ = create_train_state(
        jax.random.PRNGKey(0),
        gen_cfg,
        train_cfg,
        lambda k: d_dec.init(k, jnp.zeros((2, out_size, out_size, 3))),
        lambda k: d_ren.init(
            k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3))
        ),
        lambda k: gen.init(
            {"params": k, "perturb": k, "noise": k},
            zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
        ),
    )
    txs = (optax.sgd(1.0), optax.sgd(1.0), optax.sgd(1.0))
    state = state.replace(
        opt_g=txs[0].init(state.params_g),
        opt_d=txs[1].init(state.params_d),
        opt_d_render=txs[2].init(state.params_d_render),
    )
    steps_1 = make_train_steps(gen, d_dec, d_ren, gen_cfg, train_cfg, txs)
    mesh = make_mesh(8)
    steps_8 = make_train_steps(
        gen, d_dec, d_ren, gen_cfg, train_cfg, txs, mesh=mesh
    )

    s1, m1 = steps_1[1](state, jax.random.PRNGKey(4), 0.5)
    s8, m8 = steps_8[1](shard_pytree(mesh, state), jax.random.PRNGKey(4), 0.5)
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=2e-3, atol=1e-4, err_msg=k
        )
    # measured bf16 floor on this graph: 0.028 (lr=1.0 SGD turns the grad
    # delta into the param delta verbatim); a sharding bug would be O(grad)
    assert _max_abs_diff(s1.params_g, s8.params_g) < 5e-2


def test_g_step_renderer_bf16_mesh_equivalence():
    """1-dev vs 8-dev g_step with bf16 SIREN storage on top of the bf16
    decoder — the round-5 rd_bf16 A/B candidate (tools/ab_gstep_dec.py).
    FiLMSiren keeps the phase math fp32 (models/siren.py); only matmul
    inputs/activation storage round to bf16, so the bound is the same
    documented bf16 floor as the decoder variant."""
    import dataclasses
    import optax

    gen_cfg = GeneratorConfig(
        renderer=RendererConfig(n_layers=2, hidden_dim=32, dtype="bfloat16"),
        decoder=DecoderConfig(
            size_end=32, upsample_list=(16,), style_dim=64,
            mapping_n_layers=2, dtype="bfloat16",
        ),
        img_size=8,
        n_samples=4,
    )
    train_cfg = TrainConfig(batch=8)
    gen = Generator(gen_cfg)
    out_size = gen_cfg.out_size
    d_dec = DStyleGANProgressive(input_size=out_size, channel_multiplier=1)
    d_ren = DVolumeRenderProgressive(input_size=gen_cfg.img_size)

    cam = sample_cameras(jax.random.PRNGKey(1), batch=2,
                         img_size=gen_cfg.img_size)
    zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
    state, _ = create_train_state(
        jax.random.PRNGKey(0),
        gen_cfg,
        train_cfg,
        lambda k: d_dec.init(k, jnp.zeros((2, out_size, out_size, 3))),
        lambda k: d_ren.init(
            k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3))
        ),
        lambda k: gen.init(
            {"params": k, "perturb": k, "noise": k},
            zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far,
        ),
    )
    txs = (optax.sgd(1.0), optax.sgd(1.0), optax.sgd(1.0))
    state = state.replace(
        opt_g=txs[0].init(state.params_g),
        opt_d=txs[1].init(state.params_d),
        opt_d_render=txs[2].init(state.params_d_render),
    )
    steps_1 = make_train_steps(gen, d_dec, d_ren, gen_cfg, train_cfg, txs)
    mesh = make_mesh(8)
    steps_8 = make_train_steps(
        gen, d_dec, d_ren, gen_cfg, train_cfg, txs, mesh=mesh
    )

    s1, m1 = steps_1[1](state, jax.random.PRNGKey(4), 0.5)
    s8, m8 = steps_8[1](shard_pytree(mesh, state), jax.random.PRNGKey(4), 0.5)
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=2e-3, atol=1e-4, err_msg=k
        )
    assert _max_abs_diff(s1.params_g, s8.params_g) < 5e-2
