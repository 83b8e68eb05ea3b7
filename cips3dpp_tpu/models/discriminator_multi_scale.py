"""Multi-scale discriminator (NHWC) — accepts any power-of-two input size.

Behavioural contract: exp/cips3d/models/discriminator_multi_scale.py:405-577
(Discriminator_MultiScale; unused by the shipped v10 pipeline but part of the
reference's model family). Per-resolution 1x1 input convs + a shared ResBlock
chain; at alpha<1 blends with a half-resolution input branch; optional
minibatch-stddev; space_linear -> out_linear head. The `_Aux` variant's extra
head predicts (latent, position) — returned as None placeholders here exactly
as the base class does.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    ConvLayer,
    EqualLinear,
    channel_table,
    torch_bilinear_downsample,
)
from .discriminator import ResBlock, minibatch_stddev
from .diffaug import diff_augment


class DiscriminatorMultiScale(nn.Module):
    max_size: int = 1024
    channel_multiplier: int = 2
    diffaug: bool = False
    stddev_group: int = 4
    first_downsample: bool = False

    @nn.compact
    def __call__(self, x, alpha=1.0):
        if self.diffaug:
            x = diff_augment(x, self.make_rng("diffaug"))

        channels = channel_table(self.channel_multiplier)
        size = x.shape[1]
        log_size = int(math.log2(size))
        log_max = int(math.log2(self.max_size))

        conv_ins = {
            res: ConvLayer(channels[res], 1, name=f"conv_in_{res}")
            for res in channels
        }
        blocks = {
            2**i: ResBlock(
                channels[2**i], channels[2 ** (i - 1)], name=f"block_{2**i}"
            )
            for i in range(log_max, 2, -1)
        }

        # instantiate every resolution's params regardless of input size
        for res, m in conv_ins.items():
            _ = m(jnp.zeros((1, 4, 4, 3), x.dtype))
        for res, m in blocks.items():
            _ = m(jnp.zeros((1, 8, 8, channels[res]), x.dtype))

        out = conv_ins[size](x)
        out = blocks[size](out)

        # fade-in: blend with the half-res input branch (ref :516-524)
        if size // 2 in conv_ins:
            # torch-semantics bilinear (= 2x2 average at factor 2), matching
            # the reference's F.interpolate (discriminator_multi_scale.py:515)
            down = torch_bilinear_downsample(x, size // 2)
            down_out = conv_ins[size // 2](down)
            out = alpha * out + (1.0 - alpha) * down_out

        for i in range(log_size - 1, 2, -1):
            out = blocks[2**i](out)

        b = out.shape[0]
        if self.stddev_group > 0:
            out = minibatch_stddev(out, self.stddev_group)
        out = ConvLayer(channels[4], 3, name="final_conv")(out)
        out = out.reshape(b, -1)
        out = EqualLinear(
            channels[4], activation="fused_lrelu", name="space_linear"
        )(out)
        out = EqualLinear(1, name="out_linear")(out)
        latent = position = None
        return out, latent, position
