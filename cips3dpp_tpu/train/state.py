"""Train state + per-module optimizers.

Behavioural contract: exp/cips3d/scripts/train_v10.py:1091-1132
(create_optims) — Adam with per-module groups:

  G renderer+style mapping : lr G_lr_render (2e-5), betas (0, 0.9)
  G decoder+style_decoder  : lr G_lr_decoder (2e-3), betas (0, 0.99)
  D decoder                : lr D_lr_decoder * r, betas (0^r, 0.99^r),
                             r = d_reg_every/(d_reg_every+1)  (lazy-R1 comp)
  D renderer (pose D)      : lr D_lr_render (2e-4), betas (0, 0.9)

plus the per-module-chain gradient clipping (train_v10.py:395-405,
grad_clip=20) expressed as optax.clip_by_global_norm per label group, and
EMA of the generator (accumulate, cips3d/utils.py:63-79; decay
0.5**(32/10000), train_v10.py:835).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
import flax
from flax import struct

from ..models.generator import Generator, GeneratorConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # optim (train_cips3d_ffhq_v10.yaml:169-176)
    g_lr_render: float = 2e-5
    g_lr_decoder: float = 2e-3
    d_lr_render: float = 2e-4
    d_lr_decoder: float = 2e-3
    grad_clip: float = 20.0
    # schedule
    batch: int = 4
    total_iters: int = 800_000
    ema_start: int = 1000
    ema_decay: float = 0.5 ** (32 / (10 * 1000))
    d_reg_every: int = 15
    g_reg_every: int = 5
    fade_steps: int = 10_000
    warmup_iters: int = 10_000
    # loss weights (train_cips3d_ffhq_v10.yaml:205-210)
    lambda_gp: float = 10.0
    lambda_pose: float = 15.0
    lambda_eikonal: float = 0.1
    lambda_min_surf: float = 0.05
    min_surf_beta: float = 100.0
    path_regularize: float = 2.0
    path_batch_shrink: int = 2
    # sizes. Pixel sub-sampling / patch training activates when
    # gen_img_size < cam_img_size (train_v10.py:177-199): the generator
    # renders a gen_img_size ray subset of the cam_img_size grid and the Ds
    # see matched gathered real pixels. sample_mode: 'default' = sorted
    # random subset, 'patch' = contiguous window (yaml sample_mode key).
    cam_img_size: int = 64
    gen_img_size: int = 1024
    data_img_size: int = 1024
    sample_mode: str = "default"
    # toggles
    eikonal_reg: bool = True
    sdf_reg: bool = True
    init_renderer: bool = True
    init_iters: int = 10_000
    # rematerialise discriminator activations (memory for FLOPs): needed to
    # fit the fused r1024 step (G fwd + both Ds + R1 grad-of-grad) in one
    # chip's HBM at batch >= 4 — the reference splits into chunk loops
    # instead (train_v10.py:173)
    remat_d: bool = False
    # Pallas fused SIREN renderer for the D step's G forward (stop-gradient,
    # no eikonal -> kernel-eligible); auto-inert off-TPU / non-flagship
    # geometry (models/renderer.py gating)
    fused_renderer_d: bool = True
    # Pallas fused SIREN in the G update itself (VERDICT r4 item 6): the
    # custom_vjp backward recomputes its residuals (free remat) and the
    # eikonal term is a standalone trunk vjp (models/renderer.py fused
    # branch) — numerics match the XLA path, costs one extra trunk forward.
    fused_renderer_g: bool = False
    # compute dtype for both discriminators ("bfloat16" halves D HBM traffic;
    # logits/losses stay fp32 at the heads)
    d_dtype: str = "float32"
    # Lazy-R1 gradient accumulation over real-batch chunks of this size
    # (None = whole batch at once). The R1 grad-of-grad at 1024^2 is the
    # d_step memory peak; mean-of-chunk-means is algebraically identical and
    # bounds the peak at one chunk — the TPU form of the reference's `chunk`
    # splitting (train_cips3d_ffhq_v10.yaml:182, train_v10.py:173).
    d_r1_chunk: int | None = None
    # Sequential fake/real decoder-D gradient accumulation (lax.scan):
    # numerically exact split of the separable logistic loss that halves the
    # d_step residual peak — the fused form keeps both 1024^2 passes alive
    # into the backward, which pushes XLA into compression-remat copies at
    # the flagship config (docs/r5_logs/trace_dstep.log).
    d_seq: bool = False
    # Concatenated fake/real decoder-D pass: ONE batch-(2n) forward with a
    # per-sample sign-split of the separable logistic loss, per-half
    # minibatch-stddev (discriminator stddev_split) and per-half diffaug
    # keys. Fills the v5e 8-sublane tile that two batch-n passes each pad
    # (measured: batch-4 d_step is SLOWER absolute than batch-8,
    # docs/r5_logs/ab_dstep2.log). Takes precedence over d_seq.
    d_cat: bool = False


def _g_label_tree(params):
    """renderer|decoder label per G parameter (module-name prefixes match
    the reference split at train_v10.py:1104-1113)."""
    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        # paths look like ("params", "<module>", ...) for flax variable dicts
        top = path[1] if path[0] == "params" and len(path) > 1 else path[0]
        if top.startswith(("decoder", "style_decoder")):
            labels[path] = "decoder"
        else:  # renderer, style_* (mapping), sigmoid_beta
            labels[path] = "renderer"
    return flax.traverse_util.unflatten_dict(labels)


def make_g_optimizer(cfg: TrainConfig, params):
    tx = optax.multi_transform(
        {
            "renderer": optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.adam(cfg.g_lr_render, b1=0.0, b2=0.9),
            ),
            "decoder": optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.adam(cfg.g_lr_decoder, b1=0.0, b2=0.99),
            ),
        },
        _g_label_tree(params),
    )
    return tx


def make_d_optimizer(cfg: TrainConfig):
    # lazy-R1 lr ratio (train_v10.py d_reg_ratio); d_reg_every <= 0 disables
    # lazy regularisation entirely, so no ratio correction applies
    if cfg.d_reg_every <= 0:
        r = 1.0
    else:
        r = cfg.d_reg_every / (cfg.d_reg_every + 1)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(cfg.d_lr_decoder * r, b1=0.0, b2=0.99**r),
    )


def make_d_render_optimizer(cfg: TrainConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(cfg.d_lr_render, b1=0.0, b2=0.9),
    )


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    params_d_render: Any
    params_g_ema: Any
    opt_g: Any
    opt_d: Any
    opt_d_render: Any
    mean_path_length: jnp.ndarray


def create_train_state(
    key,
    gen_cfg: GeneratorConfig,
    train_cfg: TrainConfig,
    d_decoder_init_fn,
    d_render_init_fn,
    g_init_fn,
):
    """Build params + optimizer states. The *_init_fn callables run module
    .init with example inputs (kept outside so callers control shapes)."""
    kg, kd, kdr = jax.random.split(key, 3)
    params_g = g_init_fn(kg)
    params_d = d_decoder_init_fn(kd)
    params_d_render = d_render_init_fn(kdr)

    tx_g = make_g_optimizer(train_cfg, params_g)
    tx_d = make_d_optimizer(train_cfg)
    tx_dr = make_d_render_optimizer(train_cfg)

    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params_g=params_g,
            params_d=params_d,
            params_d_render=params_d_render,
            # fresh buffers: g_ema must not alias params_g (donation safety)
            params_g_ema=jax.tree.map(lambda x: x.copy(), params_g),
            opt_g=tx_g.init(params_g),
            opt_d=tx_d.init(params_d),
            opt_d_render=tx_dr.init(params_d_render),
            mean_path_length=jnp.zeros(()),
        ),
        (tx_g, tx_d, tx_dr),
    )
