"""Fused CIPS-decoder upsample block (Pallas).

One decoder block at resolution r (decoder.py __call__, model_v3.py:612-632)
is: StyledConv(up) -> StyledConv -> ToRGB(+skip). Measured on v5e, the
1024^2 block alone costs 1.85 ms/frame on the XLA path — ~11 full passes
over the 64 MB activation map because the zero-stuff upsample, two noise
injections, biases, leaky-relus, the 1x1 convs and the fp32 skip chain
compile into separate fusions. This kernel runs the whole block per row
tile in VMEM:

    y1 = modconv_up's matmul output at the PREVIOUS resolution (XLA, MXU)
    [kernel] row/col 2x separable upsample + noise1 + bias1 + lrelu
             + conv2 (1x1 modulated matmul) + noise2 + bias2 + lrelu
             + toRGB + separable-upsampled skip add
    -> feat (2H, 2W, C), rgb skip (2H, 2W, 3)

Row-halo handling: Mosaic cannot row-slice narrow-lane 3D HBM refs nor split
lanes in a reshape, so instead of in-kernel halo DMA the host passes three
row-shifted views of y1/skip (prev/cur/next) — XLA materialises the shifts
once at the previous (quarter-size) resolution, which is far cheaper than
the fusion breaks this kernel removes.

Weights arrive pre-modulated/demodulated per sample (B=1 serving;
modulate_weights_1x1 outside).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# normalized [1,3,3,1]/8 * 2 gain (per-axis sqrt of the 4x 2-D gain)
K4 = (0.25, 0.75, 0.75, 0.25)


def _col_upsample(x, k=K4):
    """2x upsample along axis=1 (W) with zero edges; x (R, W, C)."""
    r, w, c = x.shape
    z = jnp.zeros((r, 1, c), x.dtype)
    prev = jnp.concatenate([z, x[:, :-1]], axis=1)
    nxt = jnp.concatenate([x[:, 1:], z], axis=1)
    even = k[0] * prev + k[2] * x
    odd = k[1] * x + k[3] * nxt
    return jnp.stack([even, odd], axis=2).reshape(r, 2 * w, c)


def _row_upsample(prev, cur, nxt, k=K4):
    """2x upsample along axis=0 given row-shifted tiles (T, W, C)."""
    even = k[0] * prev + k[2] * cur
    odd = k[1] * cur + k[3] * nxt
    t, w, c = even.shape
    return jnp.stack([even, odd], axis=1).reshape(2 * t, w, c)


def _up2(prev, cur, nxt):
    return _col_upsample(_row_upsample(prev, cur, nxt))


def _block_kernel(
    yp_ref, yc_ref, yn_ref,  # (T, Wp, C) row-shifted conv1 outputs
    sp_ref, sc_ref, sn_ref,  # (T, Wp, 3) row-shifted skip
    n1_ref,  # (2T, 2Wp, 1)
    n2_ref,  # (2T, 2Wp, 1)
    w2_ref,  # (C, C)
    wrgb_ref,  # (C, 3)
    b1_ref,  # (1, C)
    b2_ref,  # (1, C)
    brgb_ref,  # (1, 3)
    nw_ref,  # (1, 2) noise weights (SMEM)
    feat_ref,  # out (2T, 2Wp, C)
    rgb_ref,  # out (2T, 2Wp, 3)
):
    lrelu = lambda v: jnp.where(v >= 0, v, 0.2 * v) * 1.4142135623730951

    up = _up2(yp_ref[:], yc_ref[:], yn_ref[:])  # (2T, 2W, C)
    h = lrelu(up + nw_ref[0, 0] * n1_ref[:] + b1_ref[:])

    tt2, w2sp, c = h.shape
    h2 = jnp.dot(
        h.reshape(tt2 * w2sp, c).astype(jnp.bfloat16),
        w2_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(tt2, w2sp, c)
    h2 = lrelu(h2 + nw_ref[0, 1] * n2_ref[:] + b2_ref[:])

    rgb = jnp.dot(
        h2.reshape(tt2 * w2sp, c).astype(jnp.bfloat16),
        wrgb_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(tt2, w2sp, 3)
    rgb_ref[:] = rgb + brgb_ref[:] + _up2(sp_ref[:], sc_ref[:], sn_ref[:])
    feat_ref[:] = h2


def _shifts(a):
    """(prev, cur, next) along rows with zero edges."""
    z = jnp.zeros_like(a[:1])
    return (
        jnp.concatenate([z, a[:-1]], axis=0),
        a,
        jnp.concatenate([a[1:], z], axis=0),
    )


@functools.partial(jax.jit, static_argnames=("t_rows", "interpret"))
def decoder_block_fused(
    y1,  # (Hp, Wp, C) conv1 matmul output at the previous resolution
    skip,  # (Hp, Wp, 3) incoming rgb skip
    noise1,  # (2Hp, 2Wp, 1)
    noise2,  # (2Hp, 2Wp, 1)
    w2,  # (C, C) pre-modulated conv2 weight
    wrgb,  # (C, 3) pre-modulated toRGB weight (no demod)
    b1,  # (C,) act bias of the up conv
    b2,  # (C,)
    brgb,  # (3,)
    noise_w1,  # scalars: learned NoiseInjection weights
    noise_w2,
    t_rows: int = 16,
    interpret: bool = False,
):
    hp, wp, c = y1.shape
    assert hp % t_rows == 0, (hp, t_rows)
    grid = (hp // t_rows,)

    nw = jnp.stack([noise_w1, noise_w2]).reshape(1, 2).astype(jnp.float32)
    yp, yc, yn = _shifts(y1.astype(jnp.float32))
    sp, sc, sn = _shifts(skip.astype(jnp.float32))

    row3 = lambda i: (i, 0, 0)
    full2 = lambda i: (0, 0)
    tile_in = lambda ch: pl.BlockSpec(
        (t_rows, wp, ch), row3, memory_space=pltpu.VMEM
    )

    feat, rgb = pl.pallas_call(
        _block_kernel,
        grid=grid,
        in_specs=[
            tile_in(c), tile_in(c), tile_in(c),
            tile_in(3), tile_in(3), tile_in(3),
            pl.BlockSpec((2 * t_rows, 2 * wp, 1), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * t_rows, 2 * wp, 1), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), full2, memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((2 * t_rows, 2 * wp, c), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * t_rows, 2 * wp, 3), row3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2 * hp, 2 * wp, c), jnp.float32),
            jax.ShapeDtypeStruct((2 * hp, 2 * wp, 3), jnp.float32),
        ),
        interpret=interpret,
    )(
        yp, yc, yn, sp, sc, sn,
        noise1.astype(jnp.float32),
        noise2.astype(jnp.float32),
        w2.astype(jnp.float32),
        wrgb.astype(jnp.float32),
        b1.reshape(1, -1).astype(jnp.float32),
        b2.reshape(1, -1).astype(jnp.float32),
        brgb.reshape(1, -1).astype(jnp.float32),
        nw,
    )
    return feat, rgb


def decoder_block_reference(
    y1, skip, noise1, noise2, w2, wrgb, b1, b2, brgb, noise_w1, noise_w2
):
    """jnp oracle with the same semantics (bf16 matmul inputs)."""
    from ..ops.upfirdn2d import _upsample2x_separable_4tap

    k1d = np.asarray(K4, np.float32)
    up = _upsample2x_separable_4tap(y1[None], k1d)[0]
    lrelu = lambda v: jnp.where(v >= 0, v, 0.2 * v) * 1.4142135623730951
    h = lrelu(up + noise_w1 * noise1 + b1)
    hh, ww, c = h.shape
    h2 = jnp.dot(
        h.reshape(-1, c).astype(jnp.bfloat16),
        w2.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(hh, ww, c)
    h2 = lrelu(h2 + noise_w2 * noise2 + b2)
    rgb = jnp.dot(
        h2.reshape(-1, c).astype(jnp.bfloat16),
        wrgb.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(hh, ww, 3)
    skip_up = _upsample2x_separable_4tap(skip[None], k1d)[0]
    return h2, rgb + brgb + skip_up
