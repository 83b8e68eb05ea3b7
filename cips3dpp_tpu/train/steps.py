"""Jitted train steps: D update, G update, path regulariser, sphere init.

Behavioural contract: exp/cips3d/scripts/train_v10.py:58-494 (update_D,
update_D_render, update_D_decoder, update_G, update_G_render,
update_G_decoder, path-reg branch) and :595-668 (sphere_init_func).

TPU-first re-design: each update is ONE pure jitted function
(params, batch, rng) -> (params', metrics); interval-triggered work
(lazy R1 every d_reg_every, path reg every g_reg_every) is a separate
compiled variant selected host-side by step index — no data-dependent
control flow inside jit, no Python chunk loops. Under a data-parallel
mesh the batch axis is sharded and every `.mean()` becomes a global mean,
which reproduces DDP's gradient averaging without any explicit collectives
(XLA inserts the psum).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..core.camera import sample_cameras
from ..models.diffaug import diff_augment
from .losses import (
    d_logistic_loss,
    g_nonsaturating_loss,
    r1_penalty,
    eikonal_loss,
    minimal_surface_loss,
    viewpoint_loss,
    path_length_penalty,
    path_noise,
)
from .state import TrainConfig, TrainState


def downsample_to(imgs, size: int):
    """Real 1024^2 -> 64^2 thumbnails for the pose D; the reference uses a
    PIL-Lanczos conv layer (train_v10.py:65-74), here lanczos3 resize."""
    b, h, w, c = imgs.shape
    if h == size:
        return imgs
    return jax.image.resize(imgs, (b, size, size, c), method="lanczos3")


def sample_pixel_idx(key, batch, cam_size: int, gen_size: int, mode: str):
    """Per-sample ray-subset indices for pixel sub-sampling / patch training
    (train_v10.py:177-199; tl2 get_gather_sample_idx[_patch] semantics).

    mode='patch'  -> contiguous window: random offset + arange(gen_size)
    mode='default'-> sorted random subset without replacement

    Returns (idx_h, idx_w), each (batch, gen_size) int32.
    """
    kh, kw = jax.random.split(key)

    def one_axis(k):
        if mode == "patch":
            off = jax.random.randint(k, (batch, 1), 0, cam_size - gen_size + 1)
            return off + jnp.arange(gen_size, dtype=jnp.int32)[None]
        # sorted subset w/o replacement: first gen_size of a random argsort
        r = jax.random.uniform(k, (batch, cam_size))
        return jnp.sort(jnp.argsort(r, axis=1)[:, :gen_size], axis=1).astype(
            jnp.int32
        )

    return one_axis(kh), one_axis(kw)


def gather_image_pixels(imgs, idx_h, idx_w, factor: int = 1):
    """Gather real pixels matching a generator ray subset (tl2
    sample_image_sub_pixels / sample_image_patch semantics): ray index i on the
    cam grid owns the `factor`-pixel block [i*factor, (i+1)*factor) of the
    full-resolution image, so fake rgb (gen*factor)^2 and gathered real align
    pixel-for-pixel. imgs: (B, cam*f, cam*f, C) -> (B, gen*f, gen*f, C)."""
    b = imgs.shape[0]

    def expand(idx):
        # (B, gen) -> (B, gen*f) pixel indices
        px = idx[..., None] * factor + jnp.arange(factor, dtype=idx.dtype)
        return px.reshape(b, -1)

    ph, pw = expand(idx_h), expand(idx_w)
    out = jnp.take_along_axis(imgs, ph[:, :, None, None], axis=1)
    out = jnp.take_along_axis(out, pw[:, None, :, None], axis=2)
    return out


def _sample_inputs(key, batch, gen_cfg, mesh=None):
    """Random z pair + camera batch (train_v10.py:160-171). Under a mesh the
    batch axis is sharding-constrained so the generator runs data-parallel
    even though z/cams are derived from a replicated key."""
    from ..parallel.mesh import constrain_batch

    kz0, kz1, kc = jax.random.split(key, 3)
    zs = tuple(
        constrain_batch(jax.random.normal(k, (batch, gen_cfg.mapping.z_dim)), mesh)
        for k in (kz0, kz1)
    )
    cam = sample_cameras(
        kc,
        batch=batch,
        img_size=gen_cfg.img_size,
        azim_range=gen_cfg.azim_range,
        elev_range=gen_cfg.elev_range,
        fov_ang=gen_cfg.fov_ang,
        dist_radius=gen_cfg.dist_radius,
        uniform=gen_cfg.uniform_camera,
    )
    cam = type(cam)(*(constrain_batch(x, mesh) for x in cam))
    return zs, cam


def make_train_steps(
    generator, d_decoder, d_render, gen_cfg, cfg: TrainConfig, txs, mesh=None,
    donate: bool = False,
):
    """Build the jitted step functions. `generator`/`d_*` are flax modules,
    `txs` = (tx_g, tx_d, tx_d_render) from state.py. With `mesh`, steps run
    data-parallel (batch sharded over the 'data' axis, params replicated)."""
    tx_g, tx_d, tx_dr = txs

    # Pixel sub-sampling / patch training (train_v10.py:156-199, 339-353):
    # active when gen_img_size < cam_img_size. The up-factor ties a cam-grid
    # ray to its block of output pixels.
    sub_pixels = gen_cfg.enable_decoder and cfg.gen_img_size < cfg.cam_img_size
    if sub_pixels:
        assert cfg.cam_img_size == gen_cfg.img_size, (
            "patch training expects the camera grid (cam_img_size) to be the "
            "generator's NeRF resolution"
        )
    up_factor = 2 ** len(gen_cfg.decoder.upsample_list)

    # DiffAugment (discriminator.py:200-208) draws randomness inside the D
    # forward; flax surfaces that as a 'diffaug' rng that every apply of an
    # augmenting D must receive.
    dd_diffaug = bool(getattr(d_decoder, "diffaug", False))

    # Optional bf16 image-D compute: every layer follows its input dtype, so
    # one cast at entry halves the D's HBM traffic at 1024^2; the logit is
    # cast back so losses/R1 accumulate fp32.
    d_dt = jnp.dtype(cfg.d_dtype)

    def dd_apply(params_d, x, alpha, key):
        rngs = {"diffaug": key} if dd_diffaug else None
        out = d_decoder.apply(params_d, x.astype(d_dt), alpha=alpha, rngs=rngs)
        return out.astype(jnp.float32)

    def g_forward(
        params_g, zs, cam, rng, eikonal_reg, renderer_detach,
        path_reg=False, sample_idx=None, fused=False,
    ):
        k1, k2 = jax.random.split(rng)
        return generator.apply(
            params_g,
            zs=zs,
            cam_poses=cam.extrinsics,
            focals=cam.focal,
            near=cam.near,
            far=cam.far,
            eikonal_reg=eikonal_reg,
            renderer_detach=renderer_detach,
            path_reg=path_reg,
            sample_idx=sample_idx,
            fused_renderer=fused,
            rngs={"perturb": k1, "noise": k2},
        )

    def _maybe_sample_idx(key, batch):
        if not sub_pixels:
            return None
        return sample_pixel_idx(
            key, batch, cfg.cam_img_size, cfg.gen_img_size, cfg.sample_mode
        )

    # ------------------------------------------------------------------ D --
    donate_kw = dict(donate_argnums=0) if donate else {}

    @functools.partial(jax.jit, static_argnames=("d_regularize",), **donate_kw)
    def d_step(state: TrainState, real_imgs, rng, alpha, d_regularize: bool):
        """update_D (train_v10.py:136-241): one fused D-render + D-decoder
        update on fakes from the current G."""
        # Chunked lazy-R1 (memory): compute the R1 gradient separately by
        # accumulating over real-batch chunks; grad(gan) + grad(r1) equals
        # the fused gradient, and the mean over the batch equals the mean of
        # equal-chunk means. Peak HBM for the grad-of-grad drops to one
        # chunk's working set (reference analog: `chunk`, train_v10.py:173).
        r1_chunked = (
            cfg.d_r1_chunk
            if (
                cfg.d_r1_chunk is not None
                and gen_cfg.enable_decoder
                and d_regularize
                and cfg.d_r1_chunk < real_imgs.shape[0]
            )
            else None
        )
        # Sequential fake/real decoder-D grads (memory): the logistic loss is
        # separable — mean(softplus(-real)) + mean(softplus(fake)) — so the
        # two D passes can run one after the other via lax.scan, halving the
        # peak residual footprint (the fused form keeps BOTH passes' 1024^2
        # activations alive into the backward, which at the flagship config
        # pushes XLA into compression-remat copies; see docs/r5_logs/
        # trace_dstep.log). Numerically exact, minibatch-stddev untouched
        # (each pass still sees the full batch).
        # Concatenated fake/real pass (d_cat): one batch-(2n) D forward with
        # sign-split logistic loss + per-half stddev/diffaug — exact vs the
        # two-pass form (tests/test_train.py::test_d_cat_matches_fused) and
        # fills the 8-sublane tile two batch-n passes each pad. Takes
        # precedence over d_seq (both reroute R1 through the chunk scan).
        d_cat = cfg.d_cat and gen_cfg.enable_decoder
        d_seq = cfg.d_seq and gen_cfg.enable_decoder and not d_cat
        d_split = d_cat or d_seq
        if d_split and d_regularize and r1_chunked is None:
            # route R1 through the separate scan below (nc=1 == full batch)
            # so no decoder-D pass remains inside the fused loss_fn
            r1_chunked = real_imgs.shape[0]
        k_in, k_g, k_idx, k_a1, k_a2, k_a3 = jax.random.split(rng, 6)
        zs, cam = _sample_inputs(k_in, real_imgs.shape[0], gen_cfg, mesh)
        sample_idx = _maybe_sample_idx(k_idx, real_imgs.shape[0])

        ret = g_forward(
            state.params_g, zs, cam, k_g, eikonal_reg=False,
            renderer_detach=None, sample_idx=sample_idx,
            fused=cfg.fused_renderer_d,
        )
        fake_rgb = jax.lax.stop_gradient(ret["rgb"])
        fake_thumb = jax.lax.stop_gradient(ret["thumb_rgb"])
        if sample_idx is not None:
            # gathered real pixels matched to the fake's ray subset
            # (train_v10.py:177-199)
            real_imgs = gather_image_pixels(real_imgs, *sample_idx, up_factor)
        real_thumb = downsample_to(real_imgs, fake_thumb.shape[1])

        def loss_fn(params_d, params_dr):
            dd = (
                jax.checkpoint(lambda p, x, k: dd_apply(p, x, alpha, k))
                if cfg.remat_d
                else (lambda p, x, k: dd_apply(p, x, alpha, k))
            )
            # pose D (update_D_render :58-102): R1 every step
            fake_pred_r, fake_view = d_render.apply(params_dr, fake_thumb, alpha=alpha)
            real_pred_r, _ = d_render.apply(params_dr, real_thumb, alpha=alpha)
            d_gan_r = d_logistic_loss(real_pred_r, fake_pred_r)
            r1_r = cfg.lambda_gp * 0.5 * r1_penalty(
                lambda x: d_render.apply(params_dr, x, alpha=alpha)[0], real_thumb
            )
            pose = (
                cfg.lambda_pose * viewpoint_loss(fake_view, cam.viewpoint)
                if cfg.lambda_pose > 0
                else 0.0
            )

            # image D (update_D_decoder :104-134): lazy R1. Skipped entirely
            # in decoder-less (StyleSDF stage-1) mode (train_v10.py:226).
            if gen_cfg.enable_decoder and not d_split:
                fake_pred = dd(params_d, fake_rgb, k_a1)
                real_pred = dd(params_d, real_imgs, k_a2)
                d_gan = d_logistic_loss(real_pred, fake_pred)
                if d_regularize and r1_chunked is None:
                    r1_d = (
                        cfg.lambda_gp
                        * 0.5
                        * cfg.d_reg_every
                        * r1_penalty(
                            lambda x: dd(params_d, x, k_a3), real_imgs
                        )
                    )
                else:
                    r1_d = 0.0
            else:
                zero = 0.0 * jax.tree.leaves(params_d)[0].sum()
                fake_pred = real_pred = jnp.zeros((1, 1))
                d_gan, r1_d = zero, 0.0

            total = d_gan_r + r1_r + pose + d_gan + r1_d
            metrics = {
                "d_loss_gan_render": d_gan_r,
                "d_loss_r1_render": r1_r,
                "d_loss_pose_render": pose,
                "d_loss_gan_decoder": d_gan,
                "d_loss_gp_decoder": r1_d,
                "d_logits_real_decoder": real_pred.mean(),
                "d_logits_fake_decoder": fake_pred.mean(),
                "d_logits_real_render": real_pred_r.mean(),
                "d_logits_fake_render": fake_pred_r.mean(),
            }
            return total, metrics

        (loss, metrics), (gd, gdr) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params_d, state.params_d_render)

        if d_cat:

            def cat_forward(p, fake, real, k_f, k_r):
                xf = fake.astype(d_dt)
                xr = real.astype(d_dt)
                if dd_diffaug:
                    # Per-half keys: same per-pass key layout as the fused
                    # two-pass form (fake<-k_a1, real<-k_a2). The draw is the
                    # raw-key diff_augment stream rather than flax's
                    # path-folded make_rng stream, so with diffaug ON the
                    # augmentations differ from the two-pass form sample-wise
                    # (same distribution) — like the chunked-R1 key note.
                    xf = diff_augment(xf, k_f)
                    xr = diff_augment(xr, k_r)
                x = jnp.concatenate([xf, xr], axis=0)
                out = d_decoder.apply(
                    p, x, alpha=alpha,
                    stddev_split=fake.shape[0], skip_augment=True,
                )
                return out.astype(jnp.float32)

            ddc = jax.checkpoint(cat_forward) if cfg.remat_d else cat_forward
            bf = fake_rgb.shape[0]

            def cat_gan_loss(p):
                pred = ddc(p, fake_rgb, real_imgs, k_a1, k_a2)
                l = (
                    jax.nn.softplus(pred[:bf]).mean()
                    + jax.nn.softplus(-pred[bf:]).mean()
                )
                return l, (pred[:bf].mean(), pred[bf:].mean())

            (d_gan, (fake_mean, real_mean)), gan_g = jax.value_and_grad(
                cat_gan_loss, has_aux=True
            )(state.params_d)
            gd = jax.tree.map(jnp.add, gd, gan_g)
            loss = loss + d_gan
            metrics["d_loss_gan_decoder"] = d_gan
            metrics["d_logits_fake_decoder"] = fake_mean
            metrics["d_logits_real_decoder"] = real_mean

        if d_seq:
            dds = (
                jax.checkpoint(lambda p, x, k: dd_apply(p, x, alpha, k))
                if cfg.remat_d
                else (lambda p, x, k: dd_apply(p, x, alpha, k))
            )

            def gan_loss(p, img, sign, k_aug):
                pred = dds(p, img, k_aug)
                # sign=+1 -> softplus(fake), sign=-1 -> softplus(-real)
                return jax.nn.softplus(sign * pred).mean(), pred.mean()

            stack = jnp.stack([fake_rgb, real_imgs.astype(fake_rgb.dtype)])
            signs = jnp.array([1.0, -1.0], dtype=jnp.float32)
            aug_keys = jnp.stack([k_a1, k_a2])

            def gan_body(acc, xs):
                img, sign, k_aug = xs
                (v, pm), g = jax.value_and_grad(gan_loss, has_aux=True)(
                    state.params_d, img, sign, k_aug
                )
                return jax.tree.map(jnp.add, acc, g), (v, pm)

            zero_gd = jax.tree.map(jnp.zeros_like, gd)
            gan_g, (gan_vals, pred_means) = jax.lax.scan(
                gan_body, zero_gd, (stack, signs, aug_keys)
            )
            gd = jax.tree.map(jnp.add, gd, gan_g)
            d_gan = gan_vals.sum()
            loss = loss + d_gan
            metrics["d_loss_gan_decoder"] = d_gan
            metrics["d_logits_fake_decoder"] = pred_means[0]
            metrics["d_logits_real_decoder"] = pred_means[1]

        if r1_chunked is not None:
            b = real_imgs.shape[0]
            assert b % r1_chunked == 0, (b, r1_chunked)
            nc = b // r1_chunked
            chunks = real_imgs.reshape(nc, r1_chunked, *real_imgs.shape[1:])
            coef = cfg.lambda_gp * 0.5 * cfg.d_reg_every
            ddr1 = (
                jax.checkpoint(lambda p, x, k: dd_apply(p, x, alpha, k))
                if cfg.remat_d
                else (lambda p, x, k: dd_apply(p, x, alpha, k))
            )

            def r1_loss(p, imgs, k_aug):
                return coef * r1_penalty(lambda x: ddr1(p, x, k_aug), imgs)

            def body(acc, chunk_and_key):
                chunk, k_aug = chunk_and_key
                acc_g, acc_v = acc
                val, g = jax.value_and_grad(r1_loss)(
                    state.params_d, chunk, k_aug
                )
                acc_g = jax.tree.map(lambda a, gi: a + gi / nc, acc_g, g)
                return (acc_g, acc_v + val / nc), None

            zero_g = jax.tree.map(jnp.zeros_like, gd)
            # Per-chunk diffaug keys: reusing k_a3 across chunks would draw
            # identical augmentation parameters for every chunk, silently
            # collapsing the penalty's augmentation diversity vs the fused
            # single-pass R1 (which draws one per-sample set over the batch).
            chunk_keys = jax.random.split(k_a3, nc)
            (r1_g, r1_val), _ = jax.lax.scan(
                body, (zero_g, jnp.zeros(())), (chunks, chunk_keys)
            )
            gd = jax.tree.map(jnp.add, gd, r1_g)
            loss = loss + r1_val
            metrics["d_loss_gp_decoder"] = r1_val

        upd_d, opt_d = tx_d.update(gd, state.opt_d, state.params_d)
        upd_dr, opt_dr = tx_dr.update(gdr, state.opt_d_render, state.params_d_render)
        state = state.replace(
            params_d=optax.apply_updates(state.params_d, upd_d),
            params_d_render=optax.apply_updates(state.params_d_render, upd_dr),
            opt_d=opt_d,
            opt_d_render=opt_dr,
        )
        metrics["d_loss_total"] = loss
        return state, metrics

    # ------------------------------------------------------------------ G --
    @functools.partial(
        jax.jit, static_argnames=("renderer_detach",), **donate_kw
    )
    def g_step(state: TrainState, rng, alpha, renderer_detach: bool | None = None):
        """update_G main pass (train_v10.py:303-405): GAN + pose + eikonal +
        minimal-surface on the thumbnail path, GAN on the decoder path."""
        k_in, k_g, k_idx, k_a = jax.random.split(rng, 4)
        zs, cam = _sample_inputs(k_in, cfg.batch, gen_cfg, mesh)
        sample_idx = _maybe_sample_idx(k_idx, cfg.batch)

        def loss_fn(params_g):
            ret = g_forward(
                params_g,
                zs,
                cam,
                k_g,
                eikonal_reg=cfg.eikonal_reg,
                renderer_detach=renderer_detach,
                sample_idx=sample_idx,
                fused=cfg.fused_renderer_g,
            )
            fake_pred_r, fake_view = d_render.apply(
                state.params_d_render, ret["thumb_rgb"], alpha=alpha
            )
            g_gan_r = g_nonsaturating_loss(fake_pred_r)
            pose = (
                cfg.lambda_pose * viewpoint_loss(fake_view, cam.viewpoint)
                if cfg.lambda_pose > 0
                else 0.0
            )
            eik = (
                cfg.lambda_eikonal * eikonal_loss(ret["eikonal_term"])
                if (cfg.lambda_eikonal > 0 and ret["eikonal_term"] is not None)
                else 0.0
            )
            min_surf = (
                cfg.lambda_min_surf
                * minimal_surface_loss(ret["sdf"], cfg.min_surf_beta)
                if (cfg.lambda_min_surf > 0 and cfg.sdf_reg)
                else 0.0
            )
            if gen_cfg.enable_decoder:
                dd = (
                    jax.checkpoint(lambda p, x, k: dd_apply(p, x, alpha, k))
                    if cfg.remat_d
                    else (lambda p, x, k: dd_apply(p, x, alpha, k))
                )
                fake_pred = dd(state.params_d, ret["rgb"], k_a)
                g_gan = g_nonsaturating_loss(fake_pred)
            else:
                g_gan = 0.0

            total = g_gan_r + pose + eik + min_surf + g_gan
            metrics = {
                "g_loss_gan_render": g_gan_r,
                "g_loss_pose_render": pose,
                "g_loss_eikonal_render": eik,
                "g_loss_minimal_surface_render": min_surf,
                "g_loss_gan_decoder": g_gan,
            }
            return total, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_g
        )
        upd, opt_g = tx_g.update(grads, state.opt_g, state.params_g)
        state = state.replace(
            params_g=optax.apply_updates(state.params_g, upd),
            opt_g=opt_g,
            step=state.step + 1,
        )
        metrics["g_loss_total"] = loss
        return state, metrics

    # ----------------------------------------------------------- path reg --
    @functools.partial(jax.jit, **donate_kw)
    def path_reg_step(state: TrainState, rng):
        """Path-length regularisation every g_reg_every iters
        (train_v10.py:408-480). Differentiates wrt the decoder styles
        (style_decoder detached from the mapping, model_v3.py:1334-1341);
        renderer-side grads are zeroed (the reference clips them to norm 0,
        train_v10.py:470-471)."""
        batch = max(1, cfg.batch // cfg.path_batch_shrink)
        k_in, k_g, k_n = jax.random.split(rng, 3)
        zs, cam = _sample_inputs(k_in, batch, gen_cfg, mesh)

        def loss_fn(params_g):
            # styles from the mapping nets (stop-grad on decoder styles)
            sr, sd = generator.apply(
                params_g, zs, method="map_zs"
            )
            sd = jax.lax.stop_gradient(sd)

            def img_fn(style_decoder):
                k1, k2 = jax.random.split(k_g)
                ret = generator.apply(
                    params_g,
                    style_render=sr,
                    style_decoder=style_decoder,
                    cam_poses=cam.extrinsics,
                    focals=cam.focal,
                    near=cam.near,
                    far=cam.far,
                    rngs={"perturb": k1, "noise": k2},
                )
                return ret["rgb"]

            rgb, pullback = jax.vjp(img_fn, sd)
            noise = path_noise(k_n, rgb)
            (latents_grad,) = pullback(noise)
            penalty, new_mean, path_lengths = path_length_penalty(
                rgb, latents_grad, state.mean_path_length
            )
            weighted = cfg.path_regularize * cfg.g_reg_every * penalty
            return weighted, (new_mean, path_lengths.mean())

        (weighted, (new_mean, plen)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params_g)

        # zero the renderer-side grads (reference: clip to max_norm 0)
        from .state import _g_label_tree

        labels = _g_label_tree(grads)
        grads = jax.tree.map(
            lambda g, l: jnp.zeros_like(g) if l == "renderer" else g,
            grads,
            labels,
        )

        upd, opt_g = tx_g.update(grads, state.opt_g, state.params_g)
        state = state.replace(
            params_g=optax.apply_updates(state.params_g, upd),
            opt_g=opt_g,
            mean_path_length=new_mean,
        )
        return state, {"g_loss_weighted_path": weighted, "path_length_mean": plen}

    # --------------------------------------------------------- sphere init --
    @functools.partial(jax.jit, **donate_kw)
    def sphere_init_step(state: TrainState, rng):
        """SDF sphere initialisation (train_v10.py:595-668): L1 between the
        renderer's sdf and |pts| - (far-near)/4 on stratified samples."""
        zs, cam = _sample_inputs(rng, 4, gen_cfg, mesh)

        def loss_fn(params_g):
            sdf, target = generator.apply(
                params_g,
                zs=zs,
                cam_poses=cam.extrinsics,
                focals=cam.focal,
                near=cam.near,
                far=cam.far,
                method="init_forward",
            )
            return jnp.abs(sdf - target).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params_g)
        upd, opt_g = tx_g.update(grads, state.opt_g, state.params_g)
        state = state.replace(
            params_g=optax.apply_updates(state.params_g, upd), opt_g=opt_g
        )
        return state, {"sphere_init_l1": loss}

    return d_step, g_step, path_reg_step, sphere_init_step


@jax.jit
def ema_update(state: TrainState, decay):
    """g_ema = decay*g_ema + (1-decay)*g (cips3d/utils.py:63-79); decay is 0
    before ema_start (train_v10.py:933-936)."""
    new_ema = jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p,
        state.params_g_ema,
        state.params_g,
    )
    return state.replace(params_g_ema=new_ema)


def fade_alpha(step: int, fade_steps: int, fade: bool = True) -> float:
    """Progressive fade-in schedule (train_v10.py:895-898)."""
    if not fade:
        return 1.0
    return min(1.0, step / fade_steps)
