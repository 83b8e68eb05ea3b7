"""StyleGAN2-style primitive layers (flax.linen, NHWC, channel-last).

Behavioural contract: exp/cips3d/models/model_v3.py:32-519 (the same layers
are duplicated in models/layers.py of the reference). Initialisation
distributions are matched exactly so training-from-scratch dynamics carry
over; runtime weight scaling (the "equalised lr" trick) is kept because the
released checkpoints depend on it.

Kernels are stored channel-last: Dense kernels (in, out), conv kernels
(kh, kw, in, out). The torch-checkpoint importer transposes accordingly.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import fused_leaky_relu, upfirdn2d, make_blur_kernel, upsample2x
from ..ops.upfirdn2d import _blur_kernel_np as _blur_kernel_np_outer
from ..ops.modulated import modulated_matmul, modulated_conv2d, _modulate_weights_kxk


# ---------------------------------------------------------------------------
# initialisers (torch-distribution equivalents, fan_in = shape[0] for (in,out))
# ---------------------------------------------------------------------------


def kaiming_normal_leaky(a: float = 0.2, mul: float = 1.0):
    """torch kaiming_normal_(a, fan_in, leaky_relu) on an (in, out) kernel."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) == 2 else int(np.prod(shape[:-1]))
        gain = np.sqrt(2.0 / (1.0 + a * a))
        std = gain / np.sqrt(fan_in) * mul
        return std * jax.random.normal(key, shape, dtype)

    return init


def uniform_bound(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_div(lr_mul: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) / lr_mul

    return init


# ---------------------------------------------------------------------------
# basic layers
# ---------------------------------------------------------------------------


def pixel_norm(x: jnp.ndarray) -> jnp.ndarray:
    """x * rsqrt(mean(x^2) + 1e-8) over channels (model_v3.py:32-37)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)


class EqualLinear(nn.Module):
    """Equalised-lr linear (model_v3.py:183-215).

    weight ~ N(0,1)/lr_mul; runtime scale (1/sqrt(in))*lr_mul; bias stored
    unscaled, multiplied by lr_mul at use. activation='fused_lrelu' applies
    bias inside fused_leaky_relu (scale sqrt(2))."""

    out_dim: int
    bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: str | None = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("weight", normal_div(self.lr_mul), (in_dim, self.out_dim))
        scale = (1.0 / np.sqrt(in_dim)) * self.lr_mul
        b = None
        if self.bias:
            b = self.param(
                "bias",
                lambda k, s: jnp.full(s, self.bias_init, jnp.float32),
                (self.out_dim,),
            )
        out = jnp.dot(x, w * scale, preferred_element_type=jnp.float32).astype(x.dtype)
        if self.activation == "fused_lrelu":
            out = fused_leaky_relu(out, b * self.lr_mul if b is not None else None)
        elif b is not None:
            out = out + b * self.lr_mul
        return out


class MappingLinear(nn.Module):
    """NeRF-mapping linear (model_v3.py:40-65): kaiming-normal init baked into
    the weights (no runtime scaling), lrelu with scale=1."""

    out_dim: int
    use_bias: bool = True
    activation: str | None = None
    is_last: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        std_mul = 0.25 if self.is_last else 1.0
        w = self.param(
            "weight", kaiming_normal_leaky(0.2, std_mul), (in_dim, self.out_dim)
        )
        b = None
        if self.use_bias:
            b = self.param(
                "bias", uniform_bound(np.sqrt(1.0 / in_dim)), (self.out_dim,)
            )
        out = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        if self.activation is not None:
            out = fused_leaky_relu(out, b, scale=1.0)
        elif b is not None:
            out = out + b
        return out


class EqualConv2d(nn.Module):
    """Equalised-lr conv, NHWC (model_v3.py:145-180).

    blur_down=(blur_kernel, pad0, pad1): run as blur-THEN-conv composed
    into one dense stride-2 (k+3)x(k+3) conv. Convolutions compose, so
    K = W (*) B (a full 2-D convolution of the small kernels, trace-time)
    applied with the Blur's own pads reproduces Blur(pad)->conv(stride 2)
    exactly in exact arithmetic (B is symmetric so correlate==convolve).
    Same param ("weight" (k,k,cin,cout)) — checkpoint-compatible. Motive:
    the depthwise blur conv bypasses the MXU and XLA brackets the pair
    with full-res layout copies (~1/3 of d_step time at 1024^2)."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    blur_down: tuple | None = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "weight",
            lambda key, s: jax.random.normal(key, s, jnp.float32),
            (k, k, cin, self.out_channel),
        )
        scale = 1.0 / np.sqrt(cin * k * k)
        if self.blur_down is not None:
            blur_kernel, pad0, pad1 = self.blur_down
            kb = np.asarray(
                _blur_kernel_np_outer(tuple(blur_kernel)), np.float32
            )  # (4,4) normalized
            # full 2-D convolution of the spatial taps: K[m,n] =
            # sum_{u,v} B[u,v] W[m-u, n-v] -> (k+3, k+3). Built as 16
            # pad-and-adds, NOT .at[].add scatters: XLA:CPU's scatter
            # handling made the g_step compile of this graph explode
            # (>9 min / 14 GB vs 37 s), and pads lower cleanly on TPU too.
            bu, bv = kb.shape
            wk = sum(
                kb[u, v]
                * jnp.pad(w, ((u, bu - 1 - u), (v, bv - 1 - v), (0, 0), (0, 0)))
                for u in range(bu)
                for v in range(bv)
            )
            out = jax.lax.conv_general_dilated(
                x,
                (wk * scale).astype(x.dtype),
                window_strides=(self.stride, self.stride),
                padding=((pad0, pad1), (pad0, pad1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.use_bias:
                b = self.param(
                    "bias", nn.initializers.zeros, (self.out_channel,)
                )
                out = out + b
            return out
        out = jax.lax.conv_general_dilated(
            x,
            (w * scale).astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,))
            out = out + b
        return out


class Blur(nn.Module):
    """FIR blur with fixed pads (model_v3.py:126-142)."""

    pad: tuple
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    upsample_factor: int = 1

    @nn.compact
    def __call__(self, x):
        k = make_blur_kernel(tuple(self.blur_kernel), self.upsample_factor)
        from ..ops.upfirdn2d import blur, separable_taps

        # 4-tap taps for the separable shift-add form (OFF by default:
        # measured slower than the depthwise conv in d_step — see
        # ops.upfirdn2d.SEPARABLE_BLUR)
        k1d = separable_taps(tuple(self.blur_kernel), self.upsample_factor)
        return blur(x, k, pad=self.pad, k1d=k1d)


# Fold the 4-tap FIR blur into the following stride-2 conv as ONE dense
# (k+3)x(k+3) conv: blur-then-conv is a composition of convolutions, so the
# kernels compose at trace time — CC_W(stride 2) . TC_B == CC_{W*B}(stride 2)
# with the SAME pads (B is symmetric, so flip(B) == B). Removes the
# MXU-bypassing depthwise blur conv, its full-res intermediate, and the
# layout copies XLA inserts around the pair (~1/3 of d_step was `copy`).
# Derived from the same stored weights, so checkpoint parity is preserved
# up to bf16/fp32 rounding of the composed kernel.
#
# Default False everywhere — the fold is a MEASURED DEAD-END on both
# backends (round 5 closed it):
# - TPU: the composed dense convs' backward does not even COMPILE at the
#   flagship training config (batch-4 1024^2 d_step): XLA:TPU assigns the
#   block_1024 conv temps layouts with 4.0x padding expansion and the
#   program needs 16.24G (no-remat) / 16.28G (remat_d) of the 15.75G HBM —
#   compile-time OOM both ways (docs/r5_logs/ab_blur.log). The round-3
#   trace hypothesis (blur bracketed by layout copies) never survived an
#   on-chip measurement.
# - CPU: the backward compile is pathological (g_step >9 min / 14 GB vs
#   37 s unfused, measured on the 8-device dryrun host).
# The unfused Blur->conv pair is exactly equal in arithmetic and keeps the
# proven graph. Set True to force the fold (exactness pytest + A/B only).
FUSE_DOWN_CONV = False


def _fuse_down_conv_enabled() -> bool:
    return bool(FUSE_DOWN_CONV)


class ConvLayer(nn.Module):
    """[Blur] -> EqualConv2d -> [FusedLeakyReLU] (model_v3.py:485-519)."""

    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        blur_down = None
        if self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (self.kernel_size - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            if _fuse_down_conv_enabled() and len(self.blur_kernel) == 4:
                # blur composed into the conv kernel; EqualConv2d keeps the
                # exact same param path/shape, so checkpoints are unaffected
                blur_down = (tuple(self.blur_kernel), pad0, pad1)
                stride, padding = 2, 0
            else:
                x = Blur(pad=(pad0, pad1), blur_kernel=self.blur_kernel)(x)
                stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv2d(
            self.out_channel,
            self.kernel_size,
            stride=stride,
            padding=padding,
            use_bias=self.use_bias and not self.activate,
            blur_down=blur_down,
        )(x)
        if self.activate:
            b = (
                self.param("act_bias", nn.initializers.zeros, (self.out_channel,))
                if self.use_bias
                else None
            )
            x = fused_leaky_relu(x, b)
        return x


# ---------------------------------------------------------------------------
# modulated conv stack
# ---------------------------------------------------------------------------


class ModulatedConv2d(nn.Module):
    """Style-modulated conv (model_v3.py:218-314), NHWC.

    kernel_size=1 (the v10 flagship path) runs as a per-pixel batched matmul;
    upsample inserts a stride-2 transposed conv + gain-4 blur; k>1 uses the
    groups=batch conv. Weight stored (kh, kw, in, out)."""

    out_channel: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style):
        b, h, w_sp, cin = x.shape
        k = self.kernel_size
        weight = self.param(
            "weight",
            lambda key, s: jax.random.normal(key, s, jnp.float32),
            (k, k, cin, self.out_channel),
        )
        # style: (B, style_dim) -> per-input-channel gains, bias_init=1
        s = EqualLinear(cin, bias_init=1.0, name="modulation")(style)

        if self.upsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            if k == 1:
                # conv_transpose(k=1, stride 2) == modulate then zero-stuff;
                # expressed as one upfirdn with the blur (gain x4). The
                # reference's transposed conv yields 2h-1 then pads (pad0,pad1);
                # up=2 zero-stuffing adds a trailing zero, absorbed by pad1-1.
                y = modulated_matmul(
                    x.reshape(b, -1, cin), weight[0, 0], s, self.demodulate
                ).reshape(b, h, w_sp, self.out_channel)
                if len(self.blur_kernel) == 4 and (pad0, pad1 - 1) == (2, 1):
                    # standard schedule -> separable shift-add fast path
                    # (depthwise convs bypass the MXU; see upsample2x)
                    return upsample2x(y, self.blur_kernel)
                kblur = make_blur_kernel(tuple(self.blur_kernel), factor)
                return upfirdn2d(y, kblur, up=2, pad=(pad0, pad1 - 1))
            # general k: grouped transposed conv via lhs_dilation
            wmod = _modulate_weights_kxk(weight, s, self.demodulate)
            lhs = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w_sp, b * cin)
            # transposed conv == conv with spatially-flipped kernel, in/out
            # roles swapped, full padding (k-1), input dilated by stride
            wt = jnp.flip(wmod, axis=(1, 2))  # (B,kh,kw,Cin,Cout)
            rhs = jnp.transpose(wt, (1, 2, 3, 0, 4)).reshape(
                k, k, cin, b * self.out_channel
            )
            out = jax.lax.conv_general_dilated(
                lhs,
                rhs.astype(x.dtype),
                window_strides=(1, 1),
                padding=((k - 1, k - 1), (k - 1, k - 1)),
                lhs_dilation=(factor, factor),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=b,
            )
            oh, ow = out.shape[1], out.shape[2]
            out = out.reshape(oh, ow, b, self.out_channel).transpose(2, 0, 1, 3)
            from ..ops.upfirdn2d import blur, separable_taps

            kblur = make_blur_kernel(tuple(self.blur_kernel), factor)
            return blur(out, kblur, pad=(pad0, pad1),
                        k1d=separable_taps(tuple(self.blur_kernel), factor))

        if self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            from ..ops.upfirdn2d import blur, separable_taps

            kblur = make_blur_kernel(tuple(self.blur_kernel))
            x = blur(x, kblur, pad=(pad0, pad1),
                     k1d=separable_taps(tuple(self.blur_kernel)))
            wmod = _modulate_weights_kxk(weight, s, self.demodulate)
            bh, bw = x.shape[1], x.shape[2]
            lhs = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, bh, bw, b * cin)
            rhs = jnp.transpose(wmod, (1, 2, 3, 0, 4)).reshape(
                k, k, cin, b * self.out_channel
            )
            out = jax.lax.conv_general_dilated(
                lhs,
                rhs.astype(x.dtype),
                window_strides=(2, 2),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=b,
            )
            oh, ow = out.shape[1], out.shape[2]
            return out.reshape(oh, ow, b, self.out_channel).transpose(2, 0, 1, 3)

        if k == 1:
            return modulated_matmul(
                x.reshape(b, -1, cin), weight[0, 0], s, self.demodulate
            ).reshape(b, h, w_sp, self.out_channel)
        return modulated_conv2d(
            x, weight, s, demodulate=self.demodulate, padding=((k // 2, k // 2),) * 2
        )


class NoiseInjection(nn.Module):
    """Per-pixel noise with a learned scalar weight (model_v3.py:317-341).

    Geometry-aware noise projection (mesh splatting, model_v3.py:344-415) is
    a CPU-side visualisation aid in the reference; here projected noise is
    supplied pre-computed through `noise` by the caller."""

    @nn.compact
    def __call__(self, x, noise=None):
        w = self.param("weight", nn.initializers.zeros, (1,))
        if noise is None:
            b, h, ww, _ = x.shape
            noise = jax.random.normal(self.make_rng("noise"), (b, h, ww, 1), x.dtype)
        return x + w.astype(x.dtype) * noise.astype(x.dtype)


class StyledConv(nn.Module):
    """ModulatedConv -> NoiseInjection -> fused lrelu (model_v3.py:418-454).

    The reference also allocates an unused `bias` parameter; the importer
    drops it. The activation bias lives in `act_bias` (FusedLeakyReLU.bias)."""

    out_channel: int
    kernel_size: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, noise=None):
        x = ModulatedConv2d(
            self.out_channel,
            self.kernel_size,
            upsample=self.upsample,
            blur_kernel=self.blur_kernel,
            name="conv",
        )(x, style)
        x = NoiseInjection(name="noise")(x, noise)
        b = self.param("act_bias", nn.initializers.zeros, (self.out_channel,))
        return fused_leaky_relu(x, b)


class ToRGB(nn.Module):
    """1x1 modulated conv (no demod) to RGB + skip accumulation
    (model_v3.py:457-482).

    skip_dtype: accumulation dtype of the RGB skip chain. fp32 by default
    (bf16 loses ~0.4% on the summed skips); serving configs may set
    bfloat16 to halve the high-resolution skip traffic."""

    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2d(3, 1, demodulate=False, name="conv")(x, style)
        b = self.param("bias", nn.initializers.zeros, (3,))
        dt = jnp.dtype(self.skip_dtype)
        out = out.astype(dt) + b.astype(dt)
        if skip is not None:
            if self.upsample:
                skip = upsample2x(skip.astype(dt), self.blur_kernel)
            out = out + skip
        return out


# StyleGAN2 channel table (model_v3.py:564-574)
def channel_table(channel_multiplier: int) -> dict:
    return {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


def torch_bilinear_downsample(x, out_size: int):
    """torch `F.interpolate(mode='bilinear', align_corners=False)` for
    integer downscale factors, NHWC.

    The discriminators' progressive fade paths downsample the input image
    with torch bilinear (discriminator.py:231-236, discriminator_pose.py:
    303-308, discriminator_multi_scale.py:515) which is NOT antialiased:
    each output pixel samples only the 2 nearest input pixels per axis
    (at factor 2 that is exactly the 2x2 average). `jax.image.resize`
    bilinear antialiases when downscaling (triangle kernel widened by the
    scale), which diverges from the reference by ~0.2 in [-1,1] images —
    caught by the reference-forward oracle harness."""
    b, h, w, c = x.shape
    assert h % out_size == 0 and w == h, (x.shape, out_size)
    f = h // out_size
    if f == 1:
        return x

    import numpy as np  # static index math at trace time

    src = (np.arange(out_size) + 0.5) * f - 0.5
    i0 = np.clip(np.floor(src).astype(np.int32), 0, h - 1)
    i1 = np.minimum(i0 + 1, h - 1)
    t = (src - np.floor(src)).astype(np.float32)

    def gather(arr, axis):
        a0 = jnp.take(arr, jnp.asarray(i0), axis=axis)
        a1 = jnp.take(arr, jnp.asarray(i1), axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_size
        tt = jnp.asarray(t).reshape(shape).astype(arr.dtype)
        return a0 * (1 - tt) + a1 * tt

    return gather(gather(x, 1), 2)
