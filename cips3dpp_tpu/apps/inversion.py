"""Flip-inversion: joint (w, camera-pose) GAN inversion.

Behavioural contract: exp/cips3d/models/projector_v10.py
(StyleGAN2Projector_Flip.project_wplus :915-1280 and the base class).
Pipeline: target = [img, hflip(img)]; optimise (azim, elev), w_render-plus,
w_decoder-plus, decoder params and per-layer noise buffers against a
VGG-feature loss at full res (rgb_weight) + 64^2 thumb (thumb_weight), plus
optional MSE, a noise-regularisation pyramid, and background masking from the
NeRF mask. Three phases — pose, appearance, multiview — gate the per-group
learning rates; a cosine ramp scales them (:174-186); every
`flip_w_decoder_every` appearance steps the decoder styles are detached and
batch-flipped so only decoder *params* fit the mirrored view (:1086-1091,
:245-247).

TPU-first: the whole optimisation step (forward + VGG + losses + Adam for
every group) is ONE jitted function over an InversionState pytree; per-group
learning rates enter as traced scalars so one compilation serves all phases.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core.camera import camera_from_angles
from ..models.vgg import perceptual_features, LOSS_W_1024
from ..utils.metrics import psnr, ssim


@dataclasses.dataclass(frozen=True)
class InversionConfig:
    # schedule (config defaults: train_cips3d_ffhq_v10.yaml:485-500)
    n_steps_pose: int = 200
    n_steps_app: int = 1000
    n_steps_multiview: int = 0
    lr_cam: float = 0.01
    lr_render_w: float = 0.05
    lr_decoder_w: float = 0.05
    lr_decoder_params: float = 1e-4
    lr_noise: float = 0.05
    rgb_weight: float = 1.0
    thumb_weight: float = 50.0
    truncation_psi: float = 0.7
    mse_weight: float = 0.0
    regularize_noise_weight: float = 1e5
    mask_background: bool = True
    flip_w_decoder_every: int = 5
    optim_noise_bufs: bool = True
    optim_decoder_params: bool = True
    w_avg_samples: int = 10_000
    # camera parameterisation: "angles" = (azim, elev) look-at
    # (projector_v10.py:211-277); "axis_angle" = free (rot (B,3) axis-angle,
    # trans (B,3) projected to the unit sphere) like projector_axis_angle.py
    # :191-278 — more DoF for profile/extreme poses.
    cam_param: str = "angles"


class InversionState(struct.PyTreeNode):
    # camera parameters; with cam_param="angles": azim/elev (2, 1);
    # with "axis_angle": azim holds rot (2, 3), elev holds trans (2, 3)
    azim: jnp.ndarray
    elev: jnp.ndarray
    w_render: jnp.ndarray  # (1, n_render_layers+1, 256)
    w_decoder: jnp.ndarray  # (1, n_latent, 512)
    decoder_params: Any  # decoder submodule params
    noise_bufs: Any  # list of (1, h, w, 1)
    opt: Any


def cosine_lr_mul(step, num_steps, rampdown=0.25, rampup=0.05):
    """StyleGAN2 projector ramp (projector_v10.py:174-186)."""
    t = step / num_steps
    ramp = min(1.0, (1.0 - t) / rampdown)
    ramp = 0.5 - 0.5 * np.cos(ramp * np.pi)
    return ramp * min(1.0, t / rampup)


def phase_lr_muls(step: int, cfg: InversionConfig):
    """Per-group lr multipliers for this step (projector_v10.py:1061-1099).

    Returns dict(cam, render, decoder, mul) where `mul` is the cosine ramp."""
    p, a, m = cfg.n_steps_pose, cfg.n_steps_app, cfg.n_steps_multiview
    if step < p:
        mul = cosine_lr_mul(step, p)
        gates = dict(cam=1.0, render=1.0, decoder=0.0)
    elif step < p + a:
        mul = cosine_lr_mul(step - p, a, rampup=0.25)
        gates = dict(cam=1.0, render=1.0, decoder=1.0)
    else:
        mul = cosine_lr_mul(step - p - a, max(m, 1), rampup=0.25)
        gates = dict(cam=0.0, render=0.0, decoder=1.0)
    return {k: v * mul for k, v in gates.items()}


def noise_regularization(noise_bufs):
    """Multi-scale autocorrelation penalty (projector_v10.py:1184-1195),
    NHWC buffers (1|B, h, w, 1)."""
    reg = 0.0
    for v in noise_bufs:
        noise = v
        while True:
            reg += jnp.square(jnp.mean(noise * jnp.roll(noise, 1, axis=2)))
            reg += jnp.square(jnp.mean(noise * jnp.roll(noise, 1, axis=1)))
            if noise.shape[1] <= 8:
                break
            b, h, w, c = noise.shape
            noise = noise.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
    return reg


class Projector:
    """Flip-inversion driver. Non-flip inversion = the same machinery with
    an un-flipped single target (base StyleGAN2Projector:79-821)."""

    def __init__(self, model, params, vgg_variables, cfg: InversionConfig,
                 cam_cfg=None, lpips_variables=None, fused: bool | None = None):
        self.model = model
        self.params = params
        self.vgg = vgg_variables
        self.lpips_variables = lpips_variables  # None -> random-weight LPIPS
        self.cfg = cfg
        self.gcfg = model.cfg
        # Pallas fused SIREN forward (exact-XLA backward via custom_vjp);
        # auto-on for the flagship depth-2 geometry on TPU.
        if fused is None:
            # device platform, not backend name: the remote-TPU plugin
            # backend is named differently ("axon") but its devices report
            # platform "tpu" (same pitfall as models/layers.py had)
            fused = (
                model.cfg.renderer.n_layers == 2
                and jax.devices()[0].platform == "tpu"
            )
        self.fused = fused
        self._step_fns = {}

    # ----- state ---------------------------------------------------------

    def init_state(self, key, azim_init=(0.0, 0.0)) -> InversionState:
        cfg, gcfg = self.cfg, self.gcfg
        k1, k2 = jax.random.split(key)
        means = self.model.apply(
            self.params, k1, cfg.w_avg_samples, method="mean_latents"
        )
        wr_mean, wd_mean = means
        n_render = gcfg.renderer.n_layers + 1
        bound = self.model.bind(self.params)
        n_latent = bound.decoder.n_latent

        if cfg.cam_param == "axis_angle":
            # identity rotation, camera on the unit sphere at +z
            # (projector_axis_angle.py:259-262)
            azim = jnp.zeros((2, 3))
            elev = jnp.zeros((2, 3)).at[:, 2].set(1.0)
        else:
            azim = -np.pi + jax.random.uniform(k2, (2, 1)) * 2 * np.pi
            if any(azim_init):
                azim = jnp.asarray(azim_init, jnp.float32).reshape(2, 1)
            elev = jnp.zeros((2, 1))

        w_render = jnp.repeat(wr_mean[:, None, :], n_render, axis=1)
        w_decoder = jnp.repeat(wd_mean[:, None, :], n_latent, axis=1)

        noise_bufs = bound.decoder.make_noise(jax.random.PRNGKey(0), gcfg.img_size)
        decoder_params = self.params["params"]["decoder"]

        opt = self._tx().init(self._opt_tree(
            azim, elev, w_render, w_decoder, decoder_params, list(noise_bufs)))
        self._means = means
        return InversionState(
            azim=azim, elev=elev, w_render=w_render, w_decoder=w_decoder,
            decoder_params=decoder_params, noise_bufs=list(noise_bufs), opt=opt,
        )

    def _opt_tree(self, azim, elev, w_render, w_decoder, decoder_params, noise):
        return {
            "cam": {"azim": azim, "elev": elev},
            "render": {"w_render": w_render},
            "decoder": {
                "w_decoder": w_decoder,
                "params": decoder_params,
                "noise": list(noise),
            },
        }

    def _tx(self):
        # Adam(0.9, 0.999) normalisation per group; base lr x phase gate x
        # cosine ramp multiply in at apply time (traced), so one compilation
        # serves every phase. Labels mirror the top-level group keys.
        def labels(tree):
            return {
                name: jax.tree.map(lambda _: name, sub)
                for name, sub in tree.items()
            }

        return optax.multi_transform(
            {
                "cam": optax.scale_by_adam(0.9, 0.999),
                "render": optax.scale_by_adam(0.9, 0.999),
                "decoder": optax.scale_by_adam(0.9, 0.999),
            },
            labels,
        )

    # ----- forward -------------------------------------------------------

    def _forward(self, tree, key, flip_w_decoder: bool):
        """G forward from the optimisation tree (projector _G_forward
        :211-277): camera from (azim, elev); styles repeated to batch 2."""
        azim, elev = tree["cam"]["azim"], tree["cam"]["elev"]
        if self.cfg.cam_param == "axis_angle":
            # free camera: rot axis-angle + sphere-projected translation
            # (projector_axis_angle.py:201-203)
            from ..core.camera import camera2world_from_axis_angle

            trans = elev / jnp.maximum(
                jnp.linalg.norm(elev, axis=-1, keepdims=True), 1e-8
            )
            ext = camera2world_from_axis_angle(azim, trans)
            s = self.gcfg.img_size
            fov = jnp.full((2, 1, 1), self.gcfg.fov_ang * np.pi / 180.0)
            focal = 0.5 * s / jnp.tan(fov)
            near = jnp.full((2, 1, 1), 1.0 - self.gcfg.dist_radius)
            far = jnp.full((2, 1, 1), 1.0 + self.gcfg.dist_radius)
            from ..core.camera import CameraParams

            cam = CameraParams(ext, focal, near, far, jnp.zeros((2, 2)))
        else:
            cam = camera_from_angles(
                azim[:, 0], elev[:, 0], self.gcfg.img_size,
                fov_ang=self.gcfg.fov_ang, dist_radius=self.gcfg.dist_radius,
            )
        style_render = jnp.repeat(tree["render"]["w_render"], 2, axis=0)
        style_decoder = jnp.repeat(tree["decoder"]["w_decoder"], 2, axis=0)
        if flip_w_decoder:
            style_decoder = jax.lax.stop_gradient(style_decoder)[::-1]

        params = {
            **self.params,
            "params": {**self.params["params"], "decoder": tree["decoder"]["params"]},
        }
        noise_bufs = [
            jnp.repeat(b, 2, axis=0) if b.shape[0] == 1 else b
            for b in tree["decoder"]["noise"]
        ]
        out = self.model.apply(
            params,
            style_render=style_render,
            style_decoder=style_decoder,
            cam_poses=cam.extrinsics,
            focals=cam.focal,
            near=cam.near,
            far=cam.far,
            noise_bufs=noise_bufs,
            perturb=True,
            renderer_detach=False,
            fused_renderer=self.fused,
            rngs={"perturb": key},
        )
        return out

    def _loss(self, tree, target, target_thumb, target_feats, target_feats_thumb,
              key, flip_w_decoder, mask_bg):
        cfg = self.cfg
        out = self._forward(tree, key, flip_w_decoder)
        synth, synth_thumb = out["rgb"], out["thumb_rgb"]

        if mask_bg:
            # foreground = 1 - background-probability (projector :268-276);
            # grads only flow through the foreground.
            mask_thumb = 1.0 - jax.lax.stop_gradient(out["mask"])
            mask = jax.image.resize(
                mask_thumb,
                (mask_thumb.shape[0],) + synth.shape[1:3] + (1,),
                method="cubic",
            )
            synth = synth * mask + jax.lax.stop_gradient(synth) * (1 - mask)

        sf = perceptual_features(self.vgg, synth)
        sft = perceptual_features(self.vgg, synth_thumb, LOSS_W_1024)
        percep = (
            jnp.sum(jnp.square(target_feats - sf)) * cfg.rgb_weight
            + jnp.sum(jnp.square(target_feats_thumb - sft)) * cfg.thumb_weight
        )
        mse = (
            cfg.mse_weight * jnp.mean(jnp.square(synth - target))
            if cfg.mse_weight > 0
            else 0.0
        )
        reg = (
            cfg.regularize_noise_weight
            * noise_regularization(tree["decoder"]["noise"])
            if cfg.optim_noise_bufs and cfg.regularize_noise_weight > 0
            else 0.0
        )
        loss = percep + mse + reg
        return loss, {"percep": percep, "mse": mse, "noise_reg": reg,
                      "loss": loss}

    # ----- step ----------------------------------------------------------

    def _make_step(self, flip_w_decoder: bool, mask_bg: bool):
        tx = self._tx()
        cfg = self.cfg

        @jax.jit
        def step(state: InversionState, target, target_thumb, tf, tft, key, lrs):
            tree = self._opt_tree(
                state.azim, state.elev, state.w_render, state.w_decoder,
                state.decoder_params, state.noise_bufs,
            )
            (loss, metrics), grads = jax.value_and_grad(
                self._loss, has_aux=True
            )(tree, target, target_thumb, tf, tft, key, flip_w_decoder, mask_bg)
            updates, opt = tx.update(grads, state.opt, tree)
            # per-group lr: base lr x phase gate x cosine ramp (traced)
            scale = {
                "cam": -lrs["cam"] * cfg.lr_cam,
                "render": -lrs["render"] * cfg.lr_render_w,
                "decoder": None,  # handled per-leaf below
            }
            def apply_group(g, upd):
                if g == "decoder":
                    return upd
                return jax.tree.map(lambda u: scale[g] * u, upd)

            scaled = {
                "cam": apply_group("cam", updates["cam"]),
                "render": apply_group("render", updates["render"]),
                "decoder": {
                    "w_decoder": -lrs["decoder"] * cfg.lr_decoder_w
                    * updates["decoder"]["w_decoder"],
                    "params": jax.tree.map(
                        lambda u: -lrs["decoder"] * cfg.lr_decoder_params * u,
                        updates["decoder"]["params"],
                    ),
                    "noise": [
                        -lrs["decoder"] * cfg.lr_noise * u
                        for u in updates["decoder"]["noise"]
                    ],
                },
            }
            new_tree = jax.tree.map(lambda p, u: p + u, tree, scaled)
            state = state.replace(
                azim=new_tree["cam"]["azim"],
                elev=new_tree["cam"]["elev"],
                w_render=new_tree["render"]["w_render"],
                w_decoder=new_tree["decoder"]["w_decoder"],
                decoder_params=new_tree["decoder"]["params"],
                noise_bufs=new_tree["decoder"]["noise"],
                opt=opt,
            )
            return state, metrics

        return step

    def step_fn(self, flip_w_decoder: bool, mask_bg: bool):
        key = (flip_w_decoder, mask_bg)
        if key not in self._step_fns:
            self._step_fns[key] = self._make_step(*key)
        return self._step_fns[key]

    # ----- driver --------------------------------------------------------

    def project(self, target_img: np.ndarray, key=None, azim_init=(0.0, 0.0),
                log_every: int = 100, logger=None):
        """target_img: (H, W, 3) in [-1, 1]. Returns (state, report)."""
        cfg = self.cfg
        key = jax.random.PRNGKey(123) if key is None else key
        state = self.init_state(key, azim_init)

        target = jnp.stack([jnp.asarray(target_img), jnp.asarray(target_img[:, ::-1])])
        thumb = jax.image.resize(
            target, (2, self.gcfg.img_size, self.gcfg.img_size, 3), method="lanczos3"
        )
        tf = perceptual_features(self.vgg, target)
        tft = perceptual_features(self.vgg, thumb, LOSS_W_1024)

        n_steps = cfg.n_steps_pose + cfg.n_steps_app + cfg.n_steps_multiview
        metrics = {}
        for step_i in range(n_steps):
            lrs = phase_lr_muls(step_i, cfg)
            in_app = cfg.n_steps_pose <= step_i < cfg.n_steps_pose + cfg.n_steps_app
            flip = (
                in_app
                and (step_i + cfg.flip_w_decoder_every - 1) % cfg.flip_w_decoder_every == 0
                and step_i != n_steps - 1
            )
            if step_i == cfg.n_steps_pose:
                # truncate w_render toward the mean (projector :1081-1084)
                wr_mean, _ = self._means
                state = state.replace(
                    w_render=wr_mean[:, None, :]
                    + cfg.truncation_psi * (state.w_render - wr_mean[:, None, :])
                )
            mask_bg = cfg.mask_background and step_i >= cfg.n_steps_pose
            key, sub = jax.random.split(key)
            fn = self.step_fn(flip, mask_bg)
            state, metrics = fn(state, target, thumb, tf, tft, sub, lrs)
            if logger is not None and step_i % log_every == 0:
                logger(step_i, {k: float(v) for k, v in metrics.items()})

        # final render + quality report
        tree = self._opt_tree(state.azim, state.elev, state.w_render,
                              state.w_decoder, state.decoder_params,
                              state.noise_bufs)
        out = self._forward(tree, jax.random.PRNGKey(0), False)
        proj = np.asarray(out["rgb"])
        # PSNR/SSIM/LPIPS report (projector_v10.py:1266-1275)
        from ..utils.lpips import lpips as lpips_fn
        from ..io.weights import load_lpips

        lpips_vars = self.lpips_variables
        if lpips_vars is None:
            # consults $CIPS3DPP_WEIGHTS_DIR; tagged random fallback otherwise
            lpips_vars, lpips_prov = load_lpips(jax.random.PRNGKey(0))
        else:
            lpips_prov = "imported"
        report = {
            "psnr": float(psnr(jnp.asarray(proj[0]), target[0])),
            "ssim": float(ssim(jnp.asarray(proj[0]), target[0])),
            "lpips": float(
                lpips_fn(lpips_vars, jnp.asarray(proj[:1]), target[:1])
            ),
            "lpips_weights": lpips_prov,
            "loss": float(metrics.get("loss", np.nan)),
            "azim": np.asarray(state.azim).ravel().tolist(),
            "elev": np.asarray(state.elev).ravel().tolist(),
        }
        return state, proj, report

    def save_inversion(self, path: str, state: InversionState):
        """Inversion artifact = its own checkpoint (projector :1046-1055).
        Like the reference, BOTH renderer and decoder states are saved so
        inverted multi-view restores the exact graph regardless of which base
        checkpoint is loaded later (render_video_web_v10.py:1039-1048)."""
        import pickle

        blob = jax.tree.map(np.asarray, {
            "azim": state.azim, "elev": state.elev,
            "w_render_opt": state.w_render, "w_decoder_opt": state.w_decoder,
            "decoder_params": state.decoder_params,
            "renderer_params": self.params["params"]["renderer"],
            "noise_bufs": list(state.noise_bufs),
        })
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        return path

    @staticmethod
    def load_inversion(path: str):
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
        return jax.tree.map(jnp.asarray, blob)
