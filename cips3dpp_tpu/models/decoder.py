"""CIPS super-resolution decoder (StyleGAN2 synthesis with k=1 convs).

Behavioural contract: exp/cips3d/models/model_v3.py:522-729 (Decoder). The
input is the renderer's 64^2 x 256 feature map; conv1 + (log2(end)-log2(start))
pairs of StyledConv with a skip ToRGB per pair; spatial upsampling happens
only at resolutions listed in `upsample_list` (v10: [128, 256, 512, 1024],
so 64^2 features are upsampled 4x to 1024^2). kernel_size=1 makes every conv
a per-pixel modulated matmul — the "CIPS" design — which on TPU is a single
MXU-shaped batched GEMM per layer.

Layer naming: conv1/to_rgb1, convs_{i}, to_rgbs_{i} — mirrors the reference
state-dict topology for the checkpoint importer.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import StyledConv, ToRGB, channel_table


class Decoder(nn.Module):
    size_start: int = 4  # channel-schedule start (not spatial size)
    size_end: int = 1024
    in_channel: int = 256
    channel_multiplier: int = 2
    kernel_size: int = 1
    upsample_list: Sequence[int] = ()
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    # Compute dtype for conv activations. bfloat16 halves the HBM traffic of
    # the 1024^2 activation maps (the decoder is bandwidth-bound) and doubles
    # MXU rate; accumulation stays fp32 (preferred_element_type) and the RGB
    # skip path stays fp32 (see ToRGB), so output quality is preserved.
    dtype: str = "float32"
    # dtype of the RGB skip accumulation; fp32 default (see ToRGB)
    skip_dtype: str = "float32"
    # Per-layer rematerialisation: backward recomputes each StyledConv's
    # internals (upsample buffer, noise add, pre-activation) instead of
    # keeping them live — the 1024^2 maps dominate G-step training memory.
    # Replaces the reference's N_rays_grad chunking (model_v3.py:1099-1199)
    # with a compiler-level memory/FLOPs trade.
    remat: bool = False

    @property
    def log_in_size(self):
        return int(math.log2(self.size_start))

    @property
    def log_size(self):
        return int(math.log2(self.size_end))

    @property
    def num_layers(self):
        """Number of noise-consuming conv layers (model_v3.py:726)."""
        return (self.log_size - self.log_in_size) * 2 + 1

    @property
    def n_latent(self):
        """Number of per-layer styles (model_v3.py:728)."""
        return (self.log_size - self.log_in_size) * 2 + 2

    def channels_for(self, res):
        return channel_table(self.channel_multiplier)[res]

    def noise_shapes(self, start_size: int):
        """Spatial sizes of the per-layer noise buffers (model_v3.py:639-666):
        one at start_size, then a pair per block, doubling at upsample blocks."""
        shapes = [(1, start_size, start_size, 1)]
        cur = start_size
        for i in range(self.log_in_size + 1, self.log_size + 1):
            if 2**i in self.upsample_list:
                cur *= 2
            shapes.append((1, cur, cur, 1))
            shapes.append((1, cur, cur, 1))
        return shapes

    def make_noise(self, key, start_size: int, batch: int = 1):
        keys = jax.random.split(key, self.num_layers)
        return [
            jax.random.normal(k, (batch,) + s[1:])
            for k, s in zip(keys, self.noise_shapes(start_size))
        ]

    @nn.compact
    def __call__(self, features, styles, noise=None, rgbd_in=None):
        """features: (B, H, W, in_channel); styles: (B, n_latent, style_dim);
        noise: list of num_layers arrays (B|1, h, w, 1) or None (random).

        Returns rgb (B, H*up, W*up, 3)."""
        assert styles.shape[1] == self.n_latent, styles.shape
        if noise is None:
            noise = [None] * self.num_layers
        assert len(noise) == self.num_layers

        dtype = jnp.dtype(self.dtype)
        features = features.astype(dtype)
        noise = [None if n is None else n.astype(dtype) for n in noise]

        SC = nn.remat(StyledConv) if self.remat else StyledConv
        out = SC(
            self.channels_for(self.size_start),
            self.kernel_size,
            blur_kernel=self.blur_kernel,
            name="conv1",
        )(features, styles[:, 0], noise[0])
        skip = ToRGB(upsample=False, skip_dtype=self.skip_dtype,
                     name="to_rgb1")(out, styles[:, 1], rgbd_in)

        layer_i = 1  # style index (model_v3.py:612-632)
        noise_i = 1
        block = 0
        for i in range(self.log_in_size + 1, self.log_size + 1):
            res = 2**i
            up = res in self.upsample_list
            out_ch = self.channels_for(res)
            out = SC(
                out_ch,
                self.kernel_size,
                upsample=up,
                blur_kernel=self.blur_kernel,
                name=f"convs_{2 * block}",
            )(out, styles[:, layer_i], noise[noise_i])
            out = SC(
                out_ch,
                self.kernel_size,
                blur_kernel=self.blur_kernel,
                name=f"convs_{2 * block + 1}",
            )(out, styles[:, layer_i + 1], noise[noise_i + 1])
            skip = ToRGB(
                upsample=up, skip_dtype=self.skip_dtype,
                name=f"to_rgbs_{block}",
            )(out, styles[:, layer_i + 2], skip)
            layer_i += 2
            noise_i += 2
            block += 1

        return skip.astype(jnp.float32)
