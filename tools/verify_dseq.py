import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from cips3dpp_tpu.io.config import load_command_config, train_config_from_dict
from cips3dpp_tpu.core import sample_cameras
from cips3dpp_tpu.models.generator import (
    Generator, GeneratorConfig, RendererConfig, DecoderConfig)
from cips3dpp_tpu.models import DStyleGANProgressive, DVolumeRenderProgressive
from cips3dpp_tpu.train import (
    TrainConfig, create_train_state, make_train_steps)

# 1. the shipped recipe parses and carries the new flag
cfg = load_command_config("/root/repo/configs/ffhq.yaml", "train_r1024_fast")
print("recipe d_seq =", cfg["d_seq"], "| d_dtype =", cfg["d_dtype"],
      "| remat_d =", cfg["remat_d"], "| d_r1_chunk =", cfg["d_r1_chunk"])
assert cfg["d_seq"] is True

# 2. drive ONE d_step through the public train API with the recipe's train
# flags at a reduced geometry (public knobs; same module graph)
gen_cfg = GeneratorConfig(
    renderer=RendererConfig(n_layers=2, hidden_dim=32),
    decoder=DecoderConfig(size_end=32, upsample_list=(16,), style_dim=64,
                          mapping_n_layers=2, dtype="bfloat16"),
    img_size=8, n_samples=4)
train_cfg = TrainConfig(batch=2, d_seq=cfg["d_seq"], d_dtype=cfg["d_dtype"],
                        remat_d=cfg["remat_d"], d_r1_chunk=cfg["d_r1_chunk"])
gen = Generator(gen_cfg)
out_size = gen_cfg.out_size
d_dec = DStyleGANProgressive(input_size=out_size, channel_multiplier=1)
d_ren = DVolumeRenderProgressive(input_size=gen_cfg.img_size)
key = jax.random.PRNGKey(0)
cam = sample_cameras(jax.random.PRNGKey(1), 2, gen_cfg.img_size)
zs = (jnp.zeros((2, 256)), jnp.zeros((2, 256)))
state, txs = create_train_state(
    key, gen_cfg, train_cfg,
    lambda k: d_dec.init(k, jnp.zeros((2, out_size, out_size, 3))),
    lambda k: d_ren.init(k, jnp.zeros((2, gen_cfg.img_size, gen_cfg.img_size, 3))),
    lambda k: gen.init({"params": k, "perturb": k, "noise": k}, zs=zs,
                       cam_poses=cam.extrinsics, focals=cam.focal,
                       near=cam.near, far=cam.far))
d_step, g_step, path_step, _ = make_train_steps(
    gen, d_dec, d_ren, gen_cfg, train_cfg, txs)
real = jax.random.normal(jax.random.PRNGKey(2), (2, out_size, out_size, 3))

s1, m1 = d_step(state, real, jax.random.PRNGKey(3), 0.5, d_regularize=False)
print("d_step (d_seq, plain): d_total=%.4f d_gan_dec=%.4f d_gan_ren=%.4f" %
      (float(m1["d_loss_total"]), float(m1["d_loss_gan_decoder"]),
       float(m1["d_loss_gan_render"])))
s2, m2 = d_step(s1, real, jax.random.PRNGKey(4), 0.5, d_regularize=True)
print("d_step (d_seq, lazy-R1): d_total=%.4f r1=%.4f" %
      (float(m2["d_loss_total"]), float(m2["d_loss_gp_decoder"])))
for k_, v in {**m1, **m2}.items():
    assert np.isfinite(float(v)), f"non-finite metric {k_}"

# 3. exactness on the driven surface: d_seq grads == fused grads
fused_cfg = TrainConfig(batch=2, d_seq=False, d_dtype=cfg["d_dtype"],
                        remat_d=cfg["remat_d"], d_r1_chunk=cfg["d_r1_chunk"])
d_step_f = make_train_steps(gen, d_dec, d_ren, gen_cfg, fused_cfg, txs)[0]
sa, ma = d_step(state, real, jax.random.PRNGKey(3), 0.5, d_regularize=False)
sb, mb = d_step_f(state, real, jax.random.PRNGKey(3), 0.5, d_regularize=False)
for k_ in ("d_loss_gan_decoder", "d_loss_total"):
    a_, b_ = float(ma[k_]), float(mb[k_])
    assert abs(a_ - b_) <= 1e-4 * abs(b_) + 1e-6, (k_, a_, b_)
    print("metric %s: d_seq %.6f vs fused %.6f (match)" % (k_, a_, b_))
# post-Adam param contract (same as CI): |diff| < 3*lr, <2% params affected
# (b1=0 first step turns rounding-order sign flips on tiny grads into +-lr)
total = mismatched = 0; mx = 0.0
for a_, b_ in zip(jax.tree.leaves(sa.params_d), jax.tree.leaves(sb.params_d)):
    d_ = np.abs(np.asarray(a_) - np.asarray(b_))
    mx = max(mx, float(d_.max())); mismatched += int((d_ > 1e-5).sum()); total += d_.size
print("params_d after one Adam step: max diff %.2e, mismatch frac %.4f" % (mx, mismatched/total))
assert mx < 3.0 * 2e-3 and mismatched / total < 0.02
# g/path steps still run under the same recipe flags
s3, mg = g_step(s2, jax.random.PRNGKey(5), 0.5)
s4, mp = path_step(s3, jax.random.PRNGKey(6))
print("g_step g_total=%.4f | path=%.4f" %
      (float(mg["g_loss_total"]), float(mp["g_loss_weighted_path"])))
print("VERIFY OK: train_r1024_fast recipe with d_seq drives end-to-end")
