"""Pose-aware volume-render discriminator (thumbnail resolution, NHWC).

Behavioural contract: exp/cips3d/models/discriminator_pose.py. CoordConv
blocks with avg-pool downsampling and a dual head: GAN logit + (azim, elev)
viewpoint regression that supervises the generator's pose distribution
(train_v10.py lambda_pose).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .layers import torch_bilinear_downsample
import flax.linen as nn

from ..ops import fused_leaky_relu

SQRT2 = math.sqrt(2.0)

# channel table (discriminator_pose.py:245-256)
POSE_CHANNELS = {2: 400, 4: 400, 8: 400, 16: 400, 32: 256, 64: 128, 128: 64,
                 256: 64, 512: 64, 1024: 32}


def _torch_conv_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))."""
    kh, kw, cin, _ = shape
    bound = 1.0 / math.sqrt(cin * kh * kw)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class PlainConv(nn.Module):
    """nn.Conv2d + optional scale-1 fused lrelu with fan-in-uniform bias
    (discriminator_pose.py VolumeRenderDiscConv2d, model_v3.py:1494-1518)."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    activate: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param("weight", _torch_conv_init, (k, k, cin, self.out_channel))
        out = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        bound = 1.0 / math.sqrt(cin * k * k)
        b = self.param(
            "bias",
            lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
            (self.out_channel,),
        )
        if self.activate:
            out = fused_leaky_relu(out, b, scale=1.0)
        else:
            out = out + b
        return out


def add_coords(x):
    """Append normalised (y, x) coordinate channels (model_v3.py:1521-1545)."""
    b, h, w, _ = x.shape
    yy = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
    xx = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)
    yy = jnp.broadcast_to(yy[None, :, None, None], (b, h, w, 1))
    xx = jnp.broadcast_to(xx[None, None, :, None], (b, h, w, 1))
    return jnp.concatenate([x, yy, xx], axis=-1)


class CoordConvLayer(nn.Module):
    """AddCoords -> conv3 -> scale-1 fused lrelu (model_v3.py:1548-1592)."""

    out_channel: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        pad = k // 2 if k > 2 else 0
        out = PlainConv(
            self.out_channel, k, padding=pad, activate=True, name="conv"
        )(add_coords(x))
        return out


def avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class PoseResBlock(nn.Module):
    """2x CoordConv -> avgpool, + avgpool(1x1-skip) / sqrt(2)
    (model_v3.py:1595-1621)."""

    out_channel: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = CoordConvLayer(self.out_channel, name="conv1")(x)
        out = CoordConvLayer(self.out_channel, name="conv2")(out)
        out = avg_pool2(out)
        skip = avg_pool2(x)
        if in_ch != self.out_channel:
            skip = PlainConv(self.out_channel, 1, name="skip")(skip)
        return (out + skip) / SQRT2


class DVolumeRender(nn.Module):
    """Flat pose discriminator (discriminator_pose.py:152-217)."""

    input_size: int = 64
    viewpoint_loss: bool = True

    @nn.compact
    def __call__(self, x):
        final_out = 3 if self.viewpoint_loss else 1
        out = PlainConv(
            POSE_CHANNELS[self.input_size], 1, activate=True, name="conv_in"
        )(x)
        log_size = int(math.log2(self.input_size))
        for i in range(log_size - 1, 0, -1):
            out = PoseResBlock(POSE_CHANNELS[2**i], name=f"block_{2**(i+1)}")(out)
        out = PlainConv(final_out, 2, name="final_conv")(out)
        gan = out[:, :, :, 0].reshape(-1, 1)
        view = out[:, :, :, 1:].reshape(-1, 2) if self.viewpoint_loss else None
        return gan, view


class DVolumeRenderProgressive(nn.Module):
    """Progressive pose discriminator (discriminator_pose.py:220-325)."""

    input_size: int = 1024
    viewpoint_loss: bool = True
    pretrained_size: int | None = None

    @nn.compact
    def __call__(self, x, alpha=1.0):
        final_out = 3 if self.viewpoint_loss else 1
        h = x.shape[1]
        log_input = int(math.log2(h))
        log_top = int(math.log2(self.input_size))

        if self.pretrained_size is None:
            log_pretrained = log_input - 1
        elif self.pretrained_size > 0:
            log_pretrained = int(math.log2(self.pretrained_size))
            if log_pretrained == log_input:
                log_pretrained = log_input - 1
        else:
            alpha = 1.0
            log_pretrained = log_input

        conv_ins, blocks = {}, {}
        for ls in range(log_top, 1, -1):
            res = 2**ls
            conv_ins[ls] = PlainConv(
                POSE_CHANNELS[res], 1, activate=True, name=f"conv_in_{res}"
            )
            blocks[ls] = PoseResBlock(POSE_CHANNELS[res // 2], name=f"block_{res}")

        for ls in range(log_top, 1, -1):
            res = 2**ls
            _ = conv_ins[ls](jnp.zeros((1, 4, 4, 3), x.dtype))
            _ = blocks[ls](jnp.zeros((1, 8, 8, POSE_CHANNELS[res]), x.dtype))

        out = conv_ins[log_input](x)
        for ls in range(log_input, log_pretrained, -1):
            out = blocks[ls](out)

        if log_pretrained < log_input:
            factor = 2 ** (log_input - log_pretrained)
            # torch-semantics (non-antialiased) bilinear downsample
            x_down = torch_bilinear_downsample(x, h // factor)
            x_down = conv_ins[log_pretrained](x_down)
            out = (1.0 - alpha) * x_down + alpha * out

        for ls in range(log_pretrained, 1, -1):
            out = blocks[ls](out)

        out = PlainConv(final_out, 2, name="final_conv")(out)
        gan = out[:, :, :, 0].reshape(-1, 1)
        view = out[:, :, :, 1:].reshape(-1, 2) if self.viewpoint_loss else None
        return gan, view
