"""CIPS-3D++ generator: mapping nets + SIREN volume renderer + CIPS decoder.

Behavioural contract: exp/cips3d/models/model_v3.py:808-1490 (Generator).
Pipeline (model_v3.py:875-1042): two z's -> two mapping networks -> w's
broadcast per layer; camera -> rays -> z-vals -> points; SIREN renderer +
SDF-sigma integration at 64^2 -> thumbnail RGB + 256-ch feature map; CIPS
decoder super-resolves features to the output RGB.

TPU-first design choices:
- Everything is one jittable function of (params, inputs, rngs); no Python
  chunk loops — optional `lax.scan` ray tiling lives in the renderer.
- The truncation mean-latent cache (model_v3.py:1316-1328) is explicit state:
  compute `mean_latents` once, pass it in.
- Noise buffers are explicit lists (reference: model_v3.py:1044-1046).
- `renderer_detach` (model_v3.py:1016-1017) is stop_gradient on the features.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.rays import prepare_nerf_inputs
from .layers import EqualLinear, MappingLinear, pixel_norm
from .renderer import VolumeFeatureRenderer
from .decoder import Decoder


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    n_layers: int = 2  # v10 r1024 flagship (train_cips3d_ffhq_v10.yaml:285)
    hidden_dim: int = 256
    input_dim: int = 3
    view_dim: int = 3
    with_sdf: bool = True
    dtype: str = "float32"  # SIREN storage dtype; "bfloat16" for serving
    remat: bool = False  # remat the SIREN trunk in backward (renderer.py)


@dataclasses.dataclass(frozen=True)
class MappingConfig:
    z_dim: int = 256
    style_dim: int = 256
    n_layers: int = 3
    lr_mul: float = 1.0


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    size_start: int = 4
    size_end: int = 1024
    channel_multiplier: int = 2
    kernel_size: int = 1
    upsample_list: tuple = (128, 256, 512, 1024)
    style_dim: int = 512
    mapping_n_layers: int = 5
    mapping_lr_mul: float = 0.01
    dtype: str = "float32"  # conv compute dtype; "bfloat16" for serving
    skip_dtype: str = "float32"  # RGB skip-chain dtype (see layers.ToRGB)
    remat: bool = False  # per-layer remat (training memory; decoder.py)


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    renderer: RendererConfig = RendererConfig()
    mapping: MappingConfig = MappingConfig()
    decoder: DecoderConfig = DecoderConfig()
    renderer_detach: bool = False
    freeze_renderer: bool = False
    # StyleSDF stage-1 mode (train_volume_renderer): no SR decoder, the
    # thumbnail IS the output (reference G_cfg.enable_decoder).
    enable_decoder: bool = True
    # camera / nerf defaults (train_cips3d_ffhq_v10.yaml:128-141)
    img_size: int = 64
    n_samples: int = 24
    static_viewdirs: bool = False
    fov_ang: float = 6.0
    dist_radius: float = 0.12
    azim_range: float = 0.3
    elev_range: float = 0.15
    uniform_camera: bool = False

    @property
    def out_size(self) -> int:
        """Spatial output = img_size * 2^len(upsample_list)."""
        return self.img_size * (2 ** len(self.decoder.upsample_list))


def preset_r1024():
    """Flagship FFHQ r1024 (config section train_r1024_r64_ks1)."""
    return GeneratorConfig()


def preset_r512():
    return dataclasses.replace(
        GeneratorConfig(),
        decoder=dataclasses.replace(
            DecoderConfig(), size_end=512, upsample_list=(128, 256, 512)
        ),
    )


def preset_r64():
    """Thumbnail-only model (train_r64): deep renderer, no spatial upsample."""
    return dataclasses.replace(
        GeneratorConfig(),
        renderer=dataclasses.replace(RendererConfig(), n_layers=8),
        decoder=dataclasses.replace(DecoderConfig(), upsample_list=()),
    )


def preset_serving():
    """Flagship r1024 in bf16 serving mode: SIREN storage + decoder compute
    in bfloat16 (phase math, integration and the RGB skip stay fp32)."""
    return dataclasses.replace(
        GeneratorConfig(),
        renderer=dataclasses.replace(RendererConfig(), dtype="bfloat16"),
        # skip chain stays fp32: measured no speedup from bf16 skips
        decoder=dataclasses.replace(DecoderConfig(), dtype="bfloat16"),
    )


def preset_compcars():
    """CompCars: 360deg azimuth, wider fov (train_cips3d_compcars_v10.yaml:97-107)."""
    import math

    return dataclasses.replace(
        GeneratorConfig(),
        azim_range=math.pi,
        elev_range=0.15,
        fov_ang=15.0,
        dist_radius=0.3,
        uniform_camera=True,
    )


class Generator(nn.Module):
    cfg: GeneratorConfig = GeneratorConfig()

    def setup(self):
        c = self.cfg
        # NeRF mapping: N stacked lrelu MappingLinears (model_v3.py:1420-1433).
        self.style = [
            MappingLinear(
                c.mapping.style_dim if i > 0 else c.mapping.style_dim,
                activation="fused_lrelu",
                name=f"style_{i}",
            )
            for i in range(c.mapping.n_layers)
        ]
        # Decoder mapping: PixelNorm + N EqualLinears, lr_mul 0.01
        # (model_v3.py:1380-1399); input dim = renderer style_dim.
        self.style_decoder = [
            EqualLinear(
                c.decoder.style_dim,
                lr_mul=c.decoder.mapping_lr_mul,
                activation="fused_lrelu",
                name=f"style_decoder_{i}",
            )
            for i in range(c.decoder.mapping_n_layers)
        ]
        self.renderer = VolumeFeatureRenderer(
            depth=c.renderer.n_layers,
            hidden_dim=c.renderer.hidden_dim,
            input_dim=c.renderer.input_dim,
            view_dim=c.renderer.view_dim,
            with_sdf=c.renderer.with_sdf,
            dtype=c.renderer.dtype,
            remat=c.renderer.remat,
        )
        self.decoder = Decoder(
            size_start=c.decoder.size_start,
            size_end=c.decoder.size_end,
            in_channel=c.renderer.hidden_dim,
            channel_multiplier=c.decoder.channel_multiplier,
            kernel_size=c.decoder.kernel_size,
            upsample_list=tuple(c.decoder.upsample_list),
            dtype=c.decoder.dtype,
            skip_dtype=c.decoder.skip_dtype,
            remat=c.decoder.remat,
        )

    # ----- mapping networks ------------------------------------------------

    def mapping_renderer_w(self, z):
        """z -> w_render (B, style_dim) (model_v3.py:1402-1418)."""
        h = z
        for layer in self.style:
            h = layer(h)
        return h

    def mapping_decoder_w(self, z):
        """z -> w_decoder (B, decoder_style_dim) (model_v3.py:1350-1378)."""
        h = pixel_norm(z)
        for layer in self.style_decoder:
            h = layer(h)
        return h

    def mean_latents(self, key, n: int = 10_000):
        """Mean w's over n random z's (model_v3.py:1285-1297). Run once and
        cache on the host — explicit state, not module memoisation."""
        k1, k2 = jax.random.split(key)
        z1 = jax.random.normal(k1, (n, self.cfg.mapping.z_dim))
        z2 = jax.random.normal(k2, (n, self.cfg.mapping.z_dim))
        w_render = self.mapping_renderer_w(z1).mean(0, keepdims=True)
        w_decoder = self.mapping_decoder_w(z2).mean(0, keepdims=True)
        return w_render, w_decoder

    def _broadcast_styles(self, w_render, w_decoder):
        n_render = self.cfg.renderer.n_layers + 1
        style_render = jnp.repeat(w_render[:, None, :], n_render, axis=1)
        style_decoder = jnp.repeat(
            w_decoder[:, None, :], self.decoder.n_latent, axis=1
        )
        return style_render, style_decoder

    def map_zs(self, zs, truncation=1.0, mean_latents=None, inject_index=None):
        """zs -> per-layer styles with optional truncation
        (model_v3.py:1299-1378). mean_latents: (w_render_mean, w_decoder_mean).

        zs = (z_render, z_decoder[, z_decoder_2]). With a third z, the decoder
        w+ is a mid-layer crossover: layers [0, inject_index) take w(z_decoder),
        the rest take w(z_decoder_2) (mapping_decoder, model_v3.py:1350-1378;
        reference default inject_index = n_latent, i.e. all-first)."""
        w_render = self.mapping_renderer_w(zs[0])
        w_decs = [self.mapping_decoder_w(z) for z in zs[1:]]
        if mean_latents is not None:
            wr_mean, wd_mean = mean_latents
            w_render = wr_mean + truncation * (w_render - wr_mean)
            w_decs = [wd_mean + truncation * (w - wd_mean) for w in w_decs]
        if len(w_decs) == 1:
            return self._broadcast_styles(w_render, w_decs[0])
        n_render = self.cfg.renderer.n_layers + 1
        style_render = jnp.repeat(w_render[:, None, :], n_render, axis=1)
        n_latent = self.decoder.n_latent
        if inject_index is None:
            inject_index = n_latent  # model_v3.py:1369-1371
        assert 0 < inject_index <= n_latent, inject_index
        s1 = jnp.repeat(w_decs[0][:, None, :], inject_index, axis=1)
        if inject_index == n_latent:
            style_decoder = s1
        else:
            s2 = jnp.repeat(
                w_decs[1][:, None, :], n_latent - inject_index, axis=1
            )
            style_decoder = jnp.concatenate([s1, s2], axis=1)
        return style_render, style_decoder

    def get_ws(self, zs, truncation, mean_latents, inject_index=None):
        """w-plus latents for inversion/style-mixing (model_v3.py:1472-1490)."""
        return self.map_zs(zs, truncation, mean_latents, inject_index)

    # ----- forward ---------------------------------------------------------

    def __call__(
        self,
        zs=None,  # (z0 (B,zd), z1 (B,zd))
        cam_poses=None,  # (B, 3, 4)
        focals=None,  # (B, 1, 1)
        near=None,  # (B, 1, 1)
        far=None,  # (B, 1, 1)
        img_size: int | None = None,
        truncation: float = 1.0,
        mean_latents=None,
        style_render=None,  # (B, n_layers+1, style_dim): overrides zs
        style_decoder=None,  # (B, n_latent, decoder_style_dim)
        noise_bufs=None,  # list[num_layers] or None -> random
        perturb: bool = True,
        eikonal_reg: bool = False,
        ray_chunk: int | None = None,
        renderer_detach: bool | None = None,
        path_reg: bool = False,
        sample_idx: tuple | None = None,  # (idx_h (B,hs), idx_w (B,ws))
        fused_renderer: bool = False,  # Pallas fast path (inference)
        fused_decoder: bool = False,  # Pallas packed decoder (B=1 serving)
        inject_index: int | None = None,  # decoder-style crossover layer
        # when zs carries a third (second decoder) z; see map_zs
        noise_seed=None,  # uint32: procedural hash noise for the fused
        # decoder (fixed deterministic realization per seed, zero HBM
        # noise traffic; kernels/decoder_block.hash_noise_map). Serving
        # convenience — explicit noise_bufs take priority.
    ):
        c = self.cfg
        img_size = img_size or c.img_size
        if renderer_detach is None:
            renderer_detach = c.renderer_detach

        # mapping (skipped when explicit styles are given, as in inversion)
        if style_render is None or style_decoder is None:
            assert zs is not None and len(zs) in (2, 3)
            zs = list(zs)
            if c.freeze_renderer:
                # frozen renderer branch (model_v3.py:917-919)
                sr, sd = self.map_zs(zs, truncation, mean_latents, inject_index)
                style_render = jax.lax.stop_gradient(sr)
                style_decoder = sd if style_decoder is None else style_decoder
            else:
                style_render, style_decoder = self.map_zs(
                    zs, truncation, mean_latents, inject_index
                )
        if path_reg:
            # Path-length reg differentiates wrt the decoder styles only
            # (model_v3.py:1334-1341); grads must not flow into the mapping.
            style_decoder = jax.lax.stop_gradient(style_decoder)

        perturb_key = self.make_rng("perturb") if perturb else None
        pts, rays_d, viewdirs, z_vals = prepare_nerf_inputs(
            focal=focals,
            img_size=img_size,
            cam_poses=cam_poses,
            near=near,
            far=far,
            n_samples=c.n_samples,
            perturb=perturb,
            static_viewdirs=c.static_viewdirs,
            key=perturb_key,
        )

        if sample_idx is not None:
            # Pixel sub-sampling / patch training (model_v3.py:1061-1097):
            # gather a gen_img_size subset of the cam_img_size ray grid.
            idx_h, idx_w = sample_idx
            take_h = lambda a: jnp.take_along_axis(
                a, idx_h.reshape(idx_h.shape[0], -1, *(1,) * (a.ndim - 2)), axis=1
            )
            take_w = lambda a: jnp.take_along_axis(
                a, idx_w.reshape(idx_w.shape[0], 1, -1, *(1,) * (a.ndim - 3)), axis=2
            )
            pts = take_w(take_h(pts))
            rays_d = take_w(take_h(rays_d))
            viewdirs = take_w(take_h(viewdirs))
            z_vals = take_w(take_h(z_vals))

        b, h, w, n, _ = pts.shape
        flat = lambda a: a.reshape(b, h * w, *a.shape[3:])
        thumb_rgb, features, sdf, mask_depth, xyz, eikonal = self.renderer(
            pts=flat(pts),
            rays_d=flat(rays_d),
            viewdirs=flat(viewdirs),
            z_vals=flat(z_vals),
            near=near,
            far=far,
            styles=style_render,
            return_eikonal=eikonal_reg,
            ray_chunk=ray_chunk,
            fused=fused_renderer,
        )

        thumb_rgb = thumb_rgb.reshape(b, h, w, 3)
        features = features.reshape(b, h, w, -1)
        mask = mask_depth[..., 0].reshape(b, h, w, 1)
        depth = mask_depth[..., 1].reshape(b, h, w, 1)
        xyz = xyz.reshape(b, h, w, 3)
        sdf = sdf.reshape(b, h, w, n, 1)

        if renderer_detach:
            features = jax.lax.stop_gradient(features)

        if self.cfg.enable_decoder:
            use_fused_dec = (
                fused_decoder
                and b == 1
                and c.decoder.kernel_size == 1
                and jax.default_backend() == "tpu"
                and not self.is_initializing()
            )
            if use_fused_dec:
                # Pallas packed serving decoder (kernels/decoder_fused.py):
                # one kernel pass per upsample block instead of XLA's ~11
                # fusions over the 1024^2 activation maps. Weight-parity
                # with the flax Decoder; bf16-matmul numerics.
                from ..kernels.decoder_fused import decoder_fused_apply

                if noise_bufs is None and noise_seed is None:
                    noise_bufs = self.decoder.make_noise(
                        self.make_rng("noise"), features.shape[1]
                    )
                rgb = decoder_fused_apply(
                    self.variables["params"]["decoder"],
                    features,
                    style_decoder,
                    noise_bufs,
                    upsample_list=tuple(c.decoder.upsample_list),
                    size_start=c.decoder.size_start,
                    size_end=c.decoder.size_end,
                    channel_multiplier=c.decoder.channel_multiplier,
                    dtype=jnp.dtype(c.decoder.dtype),
                    noise_seed=None if noise_bufs is not None else noise_seed,
                    # ToRGB folded into the kernels via the dense-lane RGBx
                    # store (kernels/decoder_block._build_rgbx_maps) —
                    # measured faster than the XLA ToRGB chain on v5e
                    fold_rgb=True,
                )
            else:
                rgb = self.decoder(features, style_decoder, noise=noise_bufs)
        else:
            rgb = thumb_rgb

        return {
            "rgb": rgb,
            "thumb_rgb": thumb_rgb,
            "sdf": sdf,
            "mask": mask,
            "depth": depth,
            "xyz": xyz,
            "eikonal_term": eikonal,
            "style_decoder": style_decoder if path_reg else None,
        }

    def init_forward(self, zs, cam_poses, focals, near, far, img_size=None):
        """Sphere-init pass (model_v3.py:1449-1470): stratified (non-offset)
        z-vals, no perturb, returns (sdf, target)."""
        from ..core.rays import get_rays_in_world, get_z_vals, get_points

        c = self.cfg
        img_size = img_size or c.img_size
        w_render = self.mapping_renderer_w(zs[0])
        style_render, _ = self._broadcast_styles(
            w_render, jnp.zeros((w_render.shape[0], c.decoder.style_dim))
        )
        rays_o, rays_d, viewdirs = get_rays_in_world(
            focal=focals, img_size=img_size, c2w=cam_poses
        )
        z_vals = get_z_vals(
            near, far, rays_d, c.n_samples, perturb=False, offset_sampling=False
        )
        pts = get_points(rays_o, rays_d, z_vals)
        return self.renderer.mlp_init_pass(pts, viewdirs, near, far, style_render)
