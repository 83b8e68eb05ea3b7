"""upfirdn2d — upsample, FIR filter, downsample in one fused pass.

Behavioural contract comes from the reference CPU fallback
(exp/op/upfirdn2d.py:160-201): insert `up-1` zeros after every input sample,
zero-pad by `pad`, convolve (true convolution, i.e. cross-correlate with the
flipped kernel) with a single 2-D FIR kernel shared by all channels, then
keep every `down`-th sample.  Output size per axis:

    out = (in * up + pad0 + pad1 - k) // down + 1

On TPU this maps exactly onto one `lax.conv_general_dilated` with
`lhs_dilation=up` — XLA lowers it to MXU-tiled depthwise convolution, so no
hand-written kernel is needed for bandwidth parity with the reference CUDA
kernels (exp/op/upfirdn2d_kernel.cu). Layout is NHWC (TPU-native).

The whole pipeline is built from JAX primitives, so it is differentiable any
number of times (the reference needed a hand-written transposed-pad backward
+ double-backward, exp/op/upfirdn2d.py:20-143).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _blur_kernel_np(kernel: tuple, upsample_factor: int = 1) -> np.ndarray:
    k = np.asarray(kernel, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    if upsample_factor > 1:
        k = k * (upsample_factor**2)
    return k


def make_blur_kernel(kernel=(1, 3, 3, 1), upsample_factor: int = 1) -> jnp.ndarray:
    """Normalised separable blur kernel (reference make_kernel, model_v3.py:73-81)."""
    return jnp.asarray(_blur_kernel_np(tuple(kernel), upsample_factor))


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: tuple = (0, 0),
) -> jnp.ndarray:
    """Apply upfirdn to an NHWC tensor with a 2-D FIR kernel.

    `pad` is (pad0, pad1) applied symmetrically to both spatial axes, matching
    the reference Python wrapper (exp/op/upfirdn2d.py:147-157).
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad

    # True convolution == cross-correlation with the flipped kernel.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    # Depthwise: one shared kernel replicated across channels.
    rhs = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))

    # lhs_dilation inserts up-1 zeros *between* samples ((h-1)*up+1 total);
    # torch's upfirdn appends them *after* every sample (h*up total). The
    # missing up-1 trailing zeros are folded into the low-side padding so the
    # output size formula matches exactly.
    out = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def _fir4_axis(y: jnp.ndarray, axis: int, k1d, pad0: int, pad1: int,
               down: int = 1) -> jnp.ndarray:
    """1-D 4-tap FIR along `axis` with zero pads and decimation, as 4
    (strided-)slice FMAs — pure VPU work XLA fuses into one pass. True
    convolution: cross-correlate with the flipped taps."""
    kf = [float(v) for v in np.asarray(k1d)][::-1]
    pw = [(0, 0)] * y.ndim
    pw[axis] = (pad0, pad1)
    xp = jnp.pad(y, pw)
    n = xp.shape[axis]
    out_len = (n - 4) // down + 1
    out = None
    for j, kj in enumerate(kf):
        s = jax.lax.slice_in_dim(
            xp, j, j + down * (out_len - 1) + 1, stride=down, axis=axis
        )
        out = kj * s if out is None else out + kj * s
    return out


def blur(x: jnp.ndarray, kernel: jnp.ndarray, pad: tuple,
         k1d=None) -> jnp.ndarray:
    """Blur module (model_v3.py:126-142): plain FIR filter with given pads.

    `k1d`: the kernel's separable 1-D taps, when the caller knows them
    (len-4 only). Depthwise convs bypass the MXU and dominate the image
    discriminator's time at 1024^2 (the reference leans on its CUDA
    upfirdn2d kernel here, exp/op/upfirdn2d_kernel.cu); the separable
    shift-add form is elementwise VPU work instead. Zero pads commute
    with a separable kernel, so axis-by-axis == the 2-D depthwise conv
    in exact arithmetic.
    """
    if k1d is not None and len(k1d) == 4 and SEPARABLE_BLUR:
        x = _fir4_axis(x, 1, k1d, pad[0], pad[1])
        return _fir4_axis(x, 2, k1d, pad[0], pad[1])
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)


# trace-time switch for the separable shift-add blur/downsample forms.
# Measured SLOWER than XLA's depthwise-conv lowering inside the training
# d_step (650 vs 811 ms median, same-process interleaved A/B on v5e,
# identical checksums — tools/ab_blur.py): the 4 strided-slice FMAs per
# axis materialize full-res intermediates where the depthwise conv is one
# fused sliding window. OFF by default; the harness flips it between jits.
# (The serving decoder's in-kernel/upsample2x shift-adds are a different
# case — they replace zero-stuffed transposed convs and remain a win.)
SEPARABLE_BLUR = False


def _upsample2x_separable_4tap(x: jnp.ndarray, k1d) -> jnp.ndarray:
    """2x zero-stuff + 4-tap FIR, expressed as shift-adds + interleave.

    Depthwise convs don't use the MXU and dominate decoder time at 1024^2;
    for the fixed StyleGAN2 case (up=2, 4-tap separable kernel, the
    Upsample pad schedule (2,1)) the even/odd output rows are 2-tap blends
    of input rows:   even[t] = k0*x[t-1] + k2*x[t]
                     odd[t]  = k1*x[t]   + k3*x[t+1]
    — pure elementwise VPU work that XLA fuses with its neighbours."""
    k0, k1, k2, k3 = [float(v) for v in np.asarray(k1d)]
    b, h, w, c = x.shape

    def up_axis(y, axis):
        # previous neighbour (x[t-1]) and next neighbour (x[t+1])
        zeros_shape = list(y.shape)
        zeros_shape[axis] = 1
        z = jnp.zeros(zeros_shape, y.dtype)
        prev = jnp.concatenate([z, jax.lax.slice_in_dim(y, 0, y.shape[axis] - 1, axis=axis)], axis=axis)
        nxt = jnp.concatenate([jax.lax.slice_in_dim(y, 1, y.shape[axis], axis=axis), z], axis=axis)
        even = k0 * prev + k2 * y
        odd = k1 * y + k3 * nxt
        # interleave even/odd along `axis`
        stacked = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(y.shape)
        new_shape[axis] *= 2
        return stacked.reshape(new_shape)

    x = up_axis(x, 1)
    x = up_axis(x, 2)
    return x


def upsample2x(x: jnp.ndarray, blur_kernel=(1, 3, 3, 1)) -> jnp.ndarray:
    """StyleGAN2 Upsample (model_v3.py:84-102): 2x zero-stuff + 4x-gain blur."""
    factor = 2
    if len(blur_kernel) == 4:
        k1d = np.asarray(blur_kernel, np.float32)
        k1d = k1d / k1d.sum() * factor  # sqrt of the (factor**2) 2-D gain
        return _upsample2x_separable_4tap(x, k1d)
    k = make_blur_kernel(blur_kernel, upsample_factor=factor)
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=factor, down=1, pad=(pad0, pad1))


def separable_taps(blur_kernel, upsample_factor: int = 1):
    """Normalised 1-D taps whose outer product == make_blur_kernel(...):
    k/sum(k) * upsample_factor per axis (the 2-D gain splits evenly)."""
    k = np.asarray(blur_kernel, np.float32)
    if k.ndim != 1:
        return None
    return tuple(k / k.sum() * upsample_factor)


def downsample2x(x: jnp.ndarray, blur_kernel=(1, 3, 3, 1)) -> jnp.ndarray:
    """StyleGAN2 Downsample (model_v3.py:105-123): blur + stride-2 decimation."""
    factor = 2
    if len(blur_kernel) == 4 and SEPARABLE_BLUR:
        # fused blur+decimate as 4 strided-slice FMAs per axis (the
        # depthwise-conv form bypasses the MXU; see blur())
        k1d = separable_taps(blur_kernel)
        x = _fir4_axis(x, 1, k1d, 1, 1, down=factor)
        return _fir4_axis(x, 2, k1d, 1, 1, down=factor)
    k = make_blur_kernel(blur_kernel)
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, k, up=1, down=factor, pad=(pad0, pad1))
