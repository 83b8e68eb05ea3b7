"""StyleGAN2 discriminator, flat and progressive variants (NHWC).

Behavioural contract: exp/cips3d/models/discriminator.py. The progressive
variant keeps a per-resolution input conv + ResBlock dict and alpha-blends a
downsampled input branch during fade-in (discriminator.py:204-261);
minibatch-stddev before the final conv.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    ConvLayer,
    EqualLinear,
    channel_table,
    torch_bilinear_downsample,
)
from .diffaug import diff_augment

SQRT2 = math.sqrt(2.0)


class ResBlock(nn.Module):
    """conv3 -> conv3(down) + 1x1 skip(down), /sqrt(2) (discriminator.py:14-34)."""

    in_channel: int
    out_channel: int

    @nn.compact
    def __call__(self, x):
        out = ConvLayer(self.in_channel, 3, name="conv1")(x)
        out = ConvLayer(self.out_channel, 3, downsample=True, name="conv2")(out)
        skip = ConvLayer(
            self.out_channel,
            1,
            downsample=True,
            activate=False,
            use_bias=False,
            name="skip",
        )(x)
        return (out + skip) / SQRT2


def minibatch_stddev(
    x, group_size: int = 4, num_features: int = 1, split: int | None = None
):
    """Append per-group feature stddev as an extra channel
    (discriminator.py:106-118). x: (B, H, W, C).

    With `split=k`, the statistic is computed independently over x[:k] and
    x[k:] — used by the concatenated fake/real training pass (d_cat) so a
    single batch-(2n) forward reproduces the per-pass batch-n statistics of
    the reference's two separate D calls exactly.
    """
    if split is not None:
        return jnp.concatenate(
            [
                minibatch_stddev(x[:split], group_size, num_features),
                minibatch_stddev(x[split:], group_size, num_features),
            ],
            axis=0,
        )
    b, h, w, c = x.shape
    group = min(b, group_size)
    if b % group != 0:
        group = 3 if b % 3 == 0 else 2
    y = x.reshape(group, b // group, h, w, num_features, c // num_features)
    var = jnp.var(y, axis=0)
    std = jnp.sqrt(var + 1e-8)
    std = jnp.mean(std, axis=(1, 2, 4), keepdims=True)  # (b/g, 1, 1, 1, 1)...
    std = std.reshape(b // group, 1, 1, 1)
    std = jnp.tile(std, (group, h, w, 1))
    return jnp.concatenate([x, std], axis=-1)


class _DFinal(nn.Module):
    """minibatch-stddev -> conv3 -> flatten -> 2 EqualLinears -> logit."""

    channel: int  # channels[4]

    @nn.compact
    def __call__(self, out, stddev_split: int | None = None):
        b = out.shape[0]
        final = minibatch_stddev(out, split=stddev_split)
        final = ConvLayer(self.channel, 3, name="final_conv")(final)
        final = final.reshape(b, -1)
        final = EqualLinear(
            self.channel, activation="fused_lrelu", name="final_linear_0"
        )(final)
        final = EqualLinear(1, name="final_linear_1")(final)
        return final[:, :1]


class DStyleGAN(nn.Module):
    """Flat discriminator (discriminator.py:37-126)."""

    input_size: int = 1024
    channel_multiplier: int = 2

    @nn.compact
    def __call__(self, x):
        channels = channel_table(self.channel_multiplier)
        log_size = int(math.log2(self.input_size))
        out = ConvLayer(channels[self.input_size], 1, name="conv_in")(x)
        in_ch = channels[self.input_size]
        for i in range(log_size, 2, -1):
            out_ch = channels[2 ** (i - 1)]
            out = ResBlock(in_ch, out_ch, name=f"block_{2**i}")(out)
            in_ch = out_ch
        return _DFinal(channels[4], name="final")(out)


class DStyleGANProgressive(nn.Module):
    """Progressive discriminator (discriminator.py:129-261).

    `input` may be any power-of-two resolution <= input_size; per-resolution
    input convs exist for all of them. pretrained_size semantics
    (discriminator.py:213-221): None -> fade across the top block;
    -1 -> no fade; >0 -> fade from that resolution.

    The fade path is jit-friendly: alpha is a traced scalar; the blended
    branch is always computed when structurally present (alpha==1 gives the
    same value), matching lazy-fade numerics without dynamic control flow.
    """

    input_size: int = 1024
    channel_multiplier: int = 2
    pretrained_size: int | None = None
    diffaug: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        alpha=1.0,
        stddev_split: int | None = None,
        skip_augment: bool = False,
    ):
        """`stddev_split`/`skip_augment` support the concatenated fake/real
        training pass (train.steps d_cat): the caller pre-augments each half
        with its own key and the minibatch-stddev statistic is computed
        per-half, so one batch-(2n) forward matches two batch-n passes."""
        if self.diffaug and not skip_augment:
            x = diff_augment(x, self.make_rng("diffaug"))

        channels = channel_table(self.channel_multiplier)
        h = x.shape[1]
        log_input_size = int(math.log2(h))

        if self.pretrained_size is None:
            log_pretrained = log_input_size - 1
        elif self.pretrained_size > 0:
            log_pretrained = int(math.log2(self.pretrained_size))
            if log_pretrained == log_input_size:
                log_pretrained = log_input_size - 1
        else:
            alpha = 1.0
            log_pretrained = log_input_size

        # Build every per-resolution module up to input_size (params must not
        # depend on the input's resolution, but an r512 model should not carry
        # dead 1024^2 blocks), and only apply the ones on this input's path.
        log_max = int(math.log2(self.input_size))
        blocks = {}
        conv_ins = {}
        for ls in range(log_max, 2, -1):
            res = 2**ls
            conv_ins[ls] = ConvLayer(channels[res], 1, name=f"conv_in_{res}")
            blocks[ls] = ResBlock(
                channels[res], channels[res // 2], name=f"block_{res}"
            )

        # Instantiate every module's params regardless of this trace's path
        # (flax creates params lazily on call; the reference state dict always
        # holds all resolutions). XLA DCEs the dummy applications.
        for ls in range(log_max, 2, -1):
            res = 2**ls
            _ = conv_ins[ls](jnp.zeros((1, 4, 4, 3), x.dtype))
            _ = blocks[ls](jnp.zeros((1, 8, 8, channels[res]), x.dtype))

        out = conv_ins[log_input_size](x)
        for ls in range(log_input_size, log_pretrained, -1):
            out = blocks[ls](out)

        if log_pretrained < log_input_size and log_pretrained in conv_ins:
            factor = 2 ** (log_input_size - log_pretrained)
            # torch-semantics (non-antialiased) bilinear, NOT
            # jax.image.resize — see layers.torch_bilinear_downsample
            x_down = torch_bilinear_downsample(x, h // factor)
            x_down = conv_ins[log_pretrained](x_down)
            out = (1.0 - alpha) * x_down + alpha * out

        for ls in range(log_pretrained, 2, -1):
            out = blocks[ls](out)

        return _DFinal(channels[4], name="final")(out, stddev_split)
