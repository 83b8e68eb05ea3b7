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


# ================================================================== v2/v3 ==
# Packed-lane decoder block: solves the Mosaic narrow-channel blocker.
#
# v3 additions (serving roofline work, guided by a jax.profiler trace):
#   - the row halo is fetched in-kernel from two single-row neighbor blocks
#     (program_id-masked at the image edges) instead of three host-side
#     row-shifted copies of y1 — removing ~2x of the kernel's input traffic
#     plus the XLA copy/relayout passes that materialised the shifts;
#   - the column-upsample lane maps can run the MXU in bf16 (colup_dtype):
#     the 0/0.25/0.75 entries are bf16-exact, so the only rounding is one
#     bf16 cast of the activations (serving default; fp32 stays available
#     and exact for the strict-parity tests);
#   - ToRGB is folded in (wrgb != None): rgb = stored-feat @ kron(I_P, wrgb)
#     written as a packed 2D (rows, 3P) output, and emit_feat=False elides
#     the feature store for the final block whose features feed only ToRGB.
#
# The late decoder blocks have C = 64/32 channels; a (rows, W, C) VMEM tile
# pads the lane dim to 128, wasting 2-4x VMEM and vector throughput. v2
# bit-casts (H, W, C) to (H, W/P, P*C) with P = 128//C — P horizontally
# adjacent pixels share one 128-wide lane vector (a free row-major reshape
# on the host). Inside the kernel every op is expressed on full 128-lane
# vectors:
#   - row 2x upsample: even/odd blend of row-shifted tiles (lanes untouched)
#   - column 2x upsample: a LINEAR map across the packed lane dim ->
#     4 constant (L, L) matrices built host-side (prev/cur blocks -> even
#     out-blocks, cur/next -> odd), applied on the MXU
#   - per-pixel noise: packed (.., P) noise expanded to (.., P*C) by a
#     constant 0/1 matrix on the MXU
#   - the modulated 1x1 conv: kron(I_P, w2) block-diagonal matmul
# ToRGB + skip accumulation stay in XLA (tiny traffic, avoids a 3-lane
# output tile); the kernel emits the block's feature map only.


def _build_colup_mats(p: int, c: int, k=K4):
    """Column-upsample as lane-space linear maps. Returns (E_p, E_c, O_c,
    O_n), each (P*C, P*C): even out-block = prev @ E_p + cur @ E_c, odd
    out-block = cur @ O_c + next @ O_n (zero blocks at the image edges)."""
    l = p * c
    mats = {"ep": np.zeros((l, l), np.float32),
            "ec": np.zeros((l, l), np.float32),
            "oc": np.zeros((l, l), np.float32),
            "on": np.zeros((l, l), np.float32)}
    for t in (0, 1):  # out block j = 2m + t
        for r in range(p):
            u_rel = t * p + r  # out pixel index relative to 2*m*p
            if u_rel % 2 == 0:
                # even out pixel u=2w: k0*x[w-1] + k2*x[w]
                contrib = [(u_rel // 2 - 1, k[0]), (u_rel // 2, k[2])]
            else:
                contrib = [(u_rel // 2, k[1]), (u_rel // 2 + 1, k[3])]
            for d, coeff in contrib:  # d = input pixel relative to block m
                if 0 <= d < p:
                    name = "ec" if t == 0 else "oc"
                    slot = d
                elif d == -1:
                    assert t == 0
                    name, slot = "ep", p - 1
                elif d == p:
                    assert t == 1
                    name, slot = "on", 0
                else:
                    raise AssertionError((t, r, d))
                for ch in range(c):
                    mats[name][slot * c + ch, r * c + ch] += coeff
    return mats["ep"], mats["ec"], mats["oc"], mats["on"]


def _build_noise_expand(p: int, c: int):
    """(P,) packed per-pixel noise -> (P*C,): E[i, i*C+c] = 1."""
    e = np.zeros((p, p * c), np.float32)
    for i in range(p):
        e[i, i * c : (i + 1) * c] = 1.0
    return e


def _build_rgbx_maps(p: int, c: int, wrgb):
    """ToRGB as DENSE 128-lane output groups (the fix for dead-end #1).

    A (rows, 3P) packed rgb store lane-pads 3P -> 128 (~10x physical
    bytes). Instead, G = 32 // P adjacent W-blocks (32 pixels) share one
    128-lane vector holding 32 x (r, g, b, 0) -- RGBx, 4/3 the logical
    bytes, fully lane-dense. Sub-block j of a group contributes through
    its own (P*C, 128) map: out[.., (j*P + r)*4 + k] = sum_ch
    feat[.., r*C + ch] * wrgb[ch, k]. Returns (G, P*C, 128) fp32.

    Same nonzero products and K-accumulation length as the kron (L, 3P)
    map; values match the padded fold to dot-accumulation-order rounding
    (the different N dim may reassociate the K loop; measured <=1 ULP)."""
    g = 32 // p
    sel = np.zeros((g, p, 3, 128), np.float32)
    for j in range(g):
        for r in range(p):
            for k in range(3):
                sel[j, r, k, (j * p + r) * 4 + k] = 1.0
    m = jnp.einsum(
        "ck,jrko->jrco", wrgb.astype(jnp.float32), jnp.asarray(sel)
    )
    return m.reshape(g, p * c, 128)


def _mxu(a, b):
    return jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


# --------------------------------------------------------------------------
# Procedural serving noise. NoiseInjection adds one per-PIXEL map broadcast
# over channels (model_v3.py:327-341); at 1024^2 the (.., P<128)-minor noise
# buffers lane-pad to 128 in the kernel's required default layout, so READING
# them costs ~10x their logical bytes (~0.3 ms/frame at the last block).
# Serving uses a fixed noise realization per trajectory anyway
# (render_video_web_v10.py:1792-1794), so instead of buffers the kernel can
# generate a deterministic realization from (pixel index, seed) with pure
# int32 math — identical on TPU and in interpret mode, zero HBM traffic.
# Buffers remain the mode for inversion/import artifacts (optimized values).

_2PI = 6.283185307179586
_HALF_PI = 1.5707963267948966


def _hash_u32(x):
    """lowbias32-style avalanche hash on uint32."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _fast_sin(x):
    """Degree-9 odd minimax sin (same poly as kernels.siren_render)."""
    inv_2pi = 0.15915494309189535
    c = (
        0.9999727636431689,
        -0.16661501432840328,
        0.008305441787505873,
        -0.00019215724206787978,
        2.125150239026409e-06,
    )
    k = jnp.round(x * inv_2pi)
    r = x - k * _2PI
    r2 = r * r
    return r * (c[0] + r2 * (c[1] + r2 * (c[2] + r2 * (c[3] + r2 * c[4]))))


def hash_normal(pix, seed):
    """Deterministic N(0,1) from uint32 pixel ids + uint32 seed (Box-Muller
    over two decorrelated avalanche hashes). Pure elementwise int/fp32 ops —
    bit-identical across TPU hardware and pallas interpret mode."""
    h1 = _hash_u32(pix ^ seed)
    h2 = _hash_u32(pix + jnp.uint32(0x9E3779B9) + (seed * jnp.uint32(0x85EBCA6B)))
    # 24-bit mantissa uniforms in (0, 1); uint32 -> f32 is not lowerable on
    # Mosaic, so hop through int32 (safe: the shifted values fit in 24 bits)
    u1 = (h1 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / 16777216.0
    ) + (1.0 / 33554432.0)
    u2 = (h2 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / 16777216.0
    )
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * _fast_sin(_2PI * u2 + _HALF_PI)  # cos(2*pi*u2)


def layer_seed(base_seed, layer_idx):
    """Per-noise-layer uint32 seed from a base seed (shared by the kernel
    call-sites and the jnp oracle)."""
    return _hash_u32(
        jnp.uint32(base_seed) ^ (jnp.uint32(0xABC00000) + jnp.uint32(layer_idx))
    )


def hash_noise_map(height, width, seed):
    """(height, width, 1) noise buffer equal to the kernel's in-kernel hash
    realization — the jnp oracle for hash-noise mode, and the generator for
    the small non-fused layers when a seed drives the whole decoder."""
    r = jnp.arange(height, dtype=jnp.uint32)[:, None]
    c = jnp.arange(width, dtype=jnp.uint32)[None, :]
    pix = r * jnp.uint32(width) + c
    return hash_normal(pix, jnp.uint32(seed))[..., None]


def _packed_kernel(
    yc_ref,  # (T, Wb, L) current packed conv1 tile
    yhp_ref,  # (1, Wb, L) halo row ABOVE the tile (clamped at i=0)
    yhn_ref,  # (1, Wb, L) halo row BELOW the tile (clamped at i=G-1)
    *rest,  # then, in order:
    #   buffers mode: n1 (2T, 2Wb, P), n2 (2T, 2Wb, P)
    #   hash mode:    seeds (1, 2) uint32 SMEM
    # ep, ec, oc, on (L, L) col-upsample maps; en (P, L) noise expander;
    # w2p (L, L); b1, b2 (1, L); nw (1, 2) SMEM;
    # [wrgbp (L, 3P)] if emit_rgb; then out refs:
    #   feat (2T, 2Wb, L) if emit_feat, rgb (2T*2Wb, 3P) if emit_rgb
    colup_dtype,
    rgb_dtype,
    store_dtype,
    pack_p,
    out_width,
    emit_feat=True,
    emit_rgb=False,
    rgb_pack="pad",  # "rgbx": dense 128-lane RGBx groups; "pad": (rows, 3P)
    hash_noise=False,
    fold_noise=False,
    fold_bias=False,  # with fold_noise: b1 rides a ones lane in the maps
    emit_y1=False,  # emit the NEXT block's conv_a matmul output in the
    # next block's packed layout (kills the feat->XLA conv->repack
    # relayout chain between fused blocks)
    y1_merge=False,  # next pack p' == 2p: merge even/odd W-blocks on lanes
    tiles_per_frame=None,  # frame-batched serving: the row axis stacks F
    # independent frames; the upsample halo must NOT leak across frame
    # boundaries, so the edge masks fire at i % tiles_per_frame == 0 /
    # tpf-1 instead of the global array edges. None = single frame.
):
    rest = list(rest)
    n1e_ref = n1o_ref = None
    if hash_noise:
        seeds_ref = rest.pop(0)
        n1_ref = n2_ref = None
    elif fold_noise:
        # noise1 arrives pre-split into even/odd out-W-blocks (host-side):
        # Mosaic cannot lane-concat an offset slice of the interleaved
        # buffer ("result/input offset mismatch on non-concat dimension"),
        # but offset-0 refs concat fine.
        n1e_ref, n1o_ref, n2_ref = rest.pop(0), rest.pop(0), rest.pop(0)
        n1_ref = None
    else:
        n1_ref, n2_ref = rest.pop(0), rest.pop(0)
    if fold_noise:
        # extended col-upsample maps already carry nw0*noise rows
        (me_ref, mo_ref, en_ref, w2p_ref, b1_ref, b2_ref, nw_ref) = rest[:7]
        rest = rest[7:]
        ep_ref = ec_ref = oc_ref = on_ref = None
    else:
        (ep_ref, ec_ref, oc_ref, on_ref, en_ref, w2p_ref, b1_ref, b2_ref,
         nw_ref) = rest[:9]
        rest = rest[9:]
    wrgbp_ref = wk_ref = None
    if emit_rgb:
        wrgbp_ref, rest = rest[0], rest[1:]
    if emit_y1:
        wk_ref, rest = rest[0], rest[1:]
    out_refs = rest
    lrelu = lambda v: jnp.where(v >= 0, v, 0.2 * v) * 1.4142135623730951
    t, wb, l = yc_ref.shape
    p = pack_p

    # row halo from single-row neighbor blocks (zeroed at the image edges).
    # y1 may arrive bf16 (serving halves its DMA); upsample math is fp32.
    yc = yc_ref[:].astype(jnp.float32)
    i = pl.program_id(0)
    g = pl.num_programs(0)
    if tiles_per_frame is None:
        at_top, at_bot = i == 0, i == g - 1
    else:
        fi = i % tiles_per_frame
        at_top, at_bot = fi == 0, fi == tiles_per_frame - 1
    prev_row = jnp.where(at_top, 0.0, yhp_ref[:].astype(jnp.float32))
    next_row = jnp.where(at_bot, 0.0, yhn_ref[:].astype(jnp.float32))
    yp = jnp.concatenate([prev_row, yc[:-1]], axis=0)
    yn = jnp.concatenate([yc[1:], next_row], axis=0)

    # row 2x upsample (sublane axis): (T,..) -> (2T,..)
    even = K4[0] * yp + K4[2] * yc
    odd = K4[1] * yc + K4[3] * yn
    x = jnp.stack([even, odd], axis=1).reshape(2 * t, wb, l)

    # W-block shifts are non-lane concatenations
    zb = jnp.zeros((2 * t, 1, l), x.dtype)
    x_prev = jnp.concatenate([zb, x[:, :-1]], axis=1)
    x_next = jnp.concatenate([x[:, 1:], zb], axis=1)

    # per-pixel noise in (2T, 2Wb, P) — or pre-split even/odd (2T, Wb, P)
    # halves when folding (Mosaic cannot lane-concat offset slices)
    if hash_noise:
        # per-frame pixel ids when frame-batched (every frame re-uses the
        # same trajectory-fixed noise realization)
        fidx = (
            i if tiles_per_frame is None else i % tiles_per_frame
        )
        row0 = jnp.uint32(2 * t) * fidx.astype(jnp.uint32)

        def hash_grid(seed, wblocks, col0_stride, col0_off):
            shape_p = (2 * t, wblocks, p)
            r_idx = jax.lax.broadcasted_iota(jnp.uint32, shape_p, 0) + row0
            c_idx = (
                jax.lax.broadcasted_iota(jnp.uint32, shape_p, 1)
                * jnp.uint32(col0_stride)
                + jnp.uint32(col0_off)
                + jax.lax.broadcasted_iota(jnp.uint32, shape_p, 2)
            )
            pix = r_idx * jnp.uint32(out_width) + c_idx
            return hash_normal(pix, seed)

        n2p = hash_grid(seeds_ref[0, 1], 2 * wb, p, 0)
        if fold_noise:
            # even out-block m covers columns [2m*p, 2m*p + p)
            n1e = hash_grid(seeds_ref[0, 0], wb, 2 * p, 0)
            n1o = hash_grid(seeds_ref[0, 0], wb, 2 * p, p)
        else:
            n1p = hash_grid(seeds_ref[0, 0], 2 * wb, p, 0)
    else:
        # buffers may arrive bf16 (serving halves the lane-padded DMA);
        # the expand matmul and everything downstream stay fp32
        n2p = n2_ref[:].astype(jnp.float32)
        if fold_noise:
            n1e = n1e_ref[:].astype(jnp.float32)
            n1o = n1o_ref[:].astype(jnp.float32)
        else:
            n1p = n1_ref[:].astype(jnp.float32)

    if fold_noise:
        # column 2x upsample WITH the first noise injection folded into the
        # lane-space maps: even out = [x_prev | x | n1_even] @ M_e, odd out
        # = [x | x_next | n1_odd] @ M_o, where M_e/M_o stack the blend maps
        # over nw0-scaled noise-expand rows (built host-side). Removes the
        # separate noise-expand matmul and two full-map VPU passes
        # (noise add + bias broadcast fuse into one post-matmul lrelu pass).
        # fold_bias additionally rides b1 on a ones lane (K = 2L + P + 1),
        # leaving lrelu as the only post-matmul pass.
        k_extra = p + (1 if fold_bias else 0)

        def cat(a, b_, n_):
            parts = [a, b_, n_]
            if fold_bias:
                parts.append(jnp.ones((2 * t, wb, 1), jnp.float32))
            return (
                jnp.concatenate(parts, axis=-1)
                .reshape(2 * t * wb, 2 * l + k_extra)
                .astype(colup_dtype)
            )

        a_e = cat(x_prev, x, n1e)
        a_o = cat(x, x_next, n1o)
        ev = jnp.dot(
            a_e, me_ref[:].astype(colup_dtype),
            preferred_element_type=jnp.float32,
        )
        od = jnp.dot(
            a_o, mo_ref[:].astype(colup_dtype),
            preferred_element_type=jnp.float32,
        )
        up = jnp.stack(
            [ev.reshape(2 * t, wb, l), od.reshape(2 * t, wb, l)], axis=2
        ).reshape(2 * t, 2 * wb, l)
        h = lrelu(up) if fold_bias else lrelu(up + b1_ref[:])
    else:
        # column 2x upsample in lane space: the blends are (rows, L) @ (L, L)
        # MXU matmuls. colup_dtype=fp32 keeps the upsample path exact; bf16
        # (serving) runs the MXU ~8x faster — the 0/0.25/0.75 map entries are
        # bf16-exact, so the only rounding is one bf16 cast of the
        # activations.
        flat = lambda a: a.reshape(2 * t * wb, l).astype(colup_dtype)
        cmat = lambda r: r[:].astype(colup_dtype)
        ev = jnp.dot(flat(x_prev), cmat(ep_ref), preferred_element_type=jnp.float32)
        ev = ev + jnp.dot(flat(x), cmat(ec_ref), preferred_element_type=jnp.float32)
        od = jnp.dot(flat(x), cmat(oc_ref), preferred_element_type=jnp.float32)
        od = od + jnp.dot(flat(x_next), cmat(on_ref), preferred_element_type=jnp.float32)
        up = jnp.stack(
            [ev.reshape(2 * t, wb, l), od.reshape(2 * t, wb, l)], axis=2
        ).reshape(2 * t, 2 * wb, l)

        n1 = jnp.dot(
            n1p.reshape(2 * t * 2 * wb, p), en_ref[:],
            preferred_element_type=jnp.float32,
        ).reshape(2 * t, 2 * wb, l)
        h = lrelu(up + nw_ref[0, 0] * n1 + b1_ref[:])

    # modulated 1x1 conv as block-diagonal matmul
    h2 = _mxu(h.reshape(2 * t * 2 * wb, l), w2p_ref[:]).reshape(
        2 * t, 2 * wb, l
    )
    n2 = jnp.dot(
        n2p.reshape(2 * t * 2 * wb, p), en_ref[:],
        preferred_element_type=jnp.float32,
    ).reshape(2 * t, 2 * wb, l)
    h2 = lrelu(h2 + nw_ref[0, 1] * n2 + b2_ref[:])

    ri = 0
    if emit_feat:
        out_refs[ri][:] = h2.astype(out_refs[ri].dtype)
        ri += 1
    if emit_rgb:
        # ToRGB folded in: round h2 through the feat-store dtype first so
        # the fused rgb matches the XLA path (which reads the stored feat)
        # bit-for-bit, even when the feat store itself is elided.
        stored = h2.astype(store_dtype).astype(rgb_dtype)
        if rgb_pack == "rgbx":
            # dense 128-lane RGBx groups: G W-blocks -> 32 pixels x 4
            # lanes; G disjoint-lane matmuls summed (cross terms exactly 0)
            g_rgb = wrgbp_ref.shape[0]
            nwg = (2 * wb) // g_rgb
            h2g = stored.reshape(2 * t, nwg, g_rgb, l)
            acc = None
            for j in range(g_rgb):
                part = jnp.dot(
                    h2g[:, :, j].reshape(2 * t * nwg, l),
                    wrgbp_ref[j].astype(rgb_dtype),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
            out_refs[ri][:] = acc.reshape(2 * t, nwg, 128)
        else:
            rgb = jnp.dot(
                stored.reshape(2 * t * 2 * wb, l),
                wrgbp_ref[:].astype(rgb_dtype),
                preferred_element_type=jnp.float32,
            )
            out_refs[ri][:] = rgb
        ri += 1
    if emit_y1:
        # next block's conv_a, in the NEXT pack layout. Round h2 through the
        # feat-store dtype so the chain matches the XLA path (which reads
        # the stored feat) exactly; matmul inputs mirror _matmul_img's dtype.
        stored = h2.astype(store_dtype).astype(rgb_dtype)
        wk = wk_ref[:].astype(rgb_dtype)
        if y1_merge:
            # p' = 2p: out W-block m' = [in 2m' | in 2m'+1] on lanes
            h2r = stored.reshape(2 * t, wb, 2, l)
            lo = jnp.dot(
                h2r[:, :, 0].reshape(2 * t * wb, l), wk,
                preferred_element_type=jnp.float32,
            )
            hi = jnp.dot(
                h2r[:, :, 1].reshape(2 * t * wb, l), wk,
                preferred_element_type=jnp.float32,
            )
            n = lo.shape[-1]
            y1n = jnp.concatenate(
                [lo.reshape(2 * t, wb, n), hi.reshape(2 * t, wb, n)],
                axis=-1,
            )
        else:
            # p' = p: pack is unchanged, one block-diagonal matmul
            y1n = jnp.dot(
                stored.reshape(2 * t * 2 * wb, l), wk,
                preferred_element_type=jnp.float32,
            ).reshape(2 * t, 2 * wb, -1)
        out_refs[ri][:] = y1n.astype(out_refs[ri].dtype)


def decoder_block_prepare(
    noise1,
    noise2,
    w2,
    b1,
    b2,
    noise_w1,
    noise_w2,
    wrgb=None,
    w_next=None,
    noise_seeds=None,
    *,
    c: int,
    fold_noise: bool = False,
):
    """y1-independent kernel operands (weights, maps, reshaped noise).

    Everything here is fixed for a whole trajectory (styles + noise bufs
    are per-video constants in the reference app, render_video_web_v10.py:
    1792-1794): the kron weight expansions, bias tiles and noise
    reshape/casts need not re-run inside a per-frame scan body. Pass the
    result to decoder_block_packed(prepared=...)."""
    p = max(1, 128 // c)
    d = {}
    ep, ec, oc, on = (jnp.asarray(m) for m in _build_colup_mats(p, c))
    en = jnp.asarray(_build_noise_expand(p, c))
    d["w2p"] = jnp.kron(jnp.eye(p, dtype=w2.dtype), w2).astype(jnp.float32)
    d["b1t"] = jnp.tile(b1.reshape(1, -1), (1, p)).astype(jnp.float32)
    d["b2t"] = jnp.tile(b2.reshape(1, -1), (1, p)).astype(jnp.float32)
    d["nw"] = (
        jnp.stack([noise_w1, noise_w2]).reshape(1, 2).astype(jnp.float32)
    )
    if noise_seeds is not None:
        d["seeds"] = jnp.asarray(noise_seeds, jnp.uint32).reshape(1, 2)
    else:
        h2, w2_ = noise1.shape[:2]
        n1 = noise1.reshape(h2, w2_ // p, p)
        n2 = noise2.reshape(h2, w2_ // p, p)
        if n1.dtype not in (jnp.bfloat16, jnp.float32):
            n1, n2 = n1.astype(jnp.float32), n2.astype(jnp.float32)
        if fold_noise:
            d["noise"] = (n1[:, 0::2], n1[:, 1::2], n2)
        else:
            d["noise"] = (n1, n2)
    if fold_noise:
        nw0 = jnp.asarray(noise_w1, jnp.float32)
        rows_e = [ep, ec, nw0 * en]
        rows_o = [oc, on, nw0 * en]
        if fold_noise == "bias":
            # full fold (KERNEL_NOTES headroom #1): bias rides a ones lane,
            # K = 2L + P + 1 — the post-matmul pass is lrelu alone
            rows_e.append(d["b1t"])
            rows_o.append(d["b1t"])
        d["maps"] = (
            jnp.concatenate(rows_e, axis=0),
            jnp.concatenate(rows_o, axis=0),
            en,
        )
    else:
        d["maps"] = (ep, ec, oc, on, en)
    if wrgb is not None:
        d["wrgbp"] = jnp.kron(jnp.eye(p, dtype=wrgb.dtype), wrgb).astype(
            jnp.float32
        )
        if 32 % p == 0:
            # dense-lane variant; decoder_block_packed picks it whenever
            # the block's width is divisible by the group size
            d["wrgbx"] = _build_rgbx_maps(p, c, wrgb)
    if w_next is not None:
        d["wk"] = jnp.kron(jnp.eye(p, dtype=w_next.dtype), w_next).astype(
            jnp.float32
        )  # (L, p * c_next): c_next stays derivable from the shape
    return d


@functools.partial(
    jax.jit,
    static_argnames=(
        "t_rows", "interpret", "out_dtype", "emit_feat", "colup_dtype",
        "rgb_dtype", "fold_noise", "rgb_pack", "frames",
    ),
)
def decoder_block_packed(
    y1,  # (Hp, Wp, C) conv1 (upsampling modconv) matmul output, prev res
    noise1,  # (2Hp, 2Wp, 1); ignored (may be None) with noise_seeds
    noise2,  # (2Hp, 2Wp, 1)
    w2,  # (C, C) pre-modulated conv2 weight
    b1,  # (C,)
    b2,  # (C,)
    noise_w1,
    noise_w2,
    wrgb=None,  # (C, 3) pre-modulated ToRGB weight (no demod) -> emit rgb
    w_next=None,  # (C, C') pre-modulated conv_a weight of the NEXT fused
    # block -> additionally emit that block's y1 in ITS packed layout,
    # replacing the feat -> XLA dot -> repack round trip between fused
    # blocks (the relayout copies are ~0.2 ms/frame in the serving trace).
    # Requires p' in {p, 2p}; returned as (2Hp, 2Wp, C') (free row-major
    # view of the packed array).
    noise_seeds=None,  # (2,) uint32 -> in-kernel hash noise (serving):
    # a fixed deterministic N(0,1) realization per seed, zero HBM traffic.
    # The (.., P<128)-minor noise buffers otherwise lane-pad to 128 in the
    # kernel's required layout (~10x their logical read bytes).
    t_rows: int = 8,
    interpret: bool = False,
    out_dtype=jnp.float32,
    emit_feat: bool = True,
    colup_dtype=jnp.float32,
    rgb_dtype=jnp.bfloat16,
    fold_noise: bool = False,
    rgb_pack: str | None = None,  # None: auto ("rgbx" dense-lane store
    # whenever the width divides into 32-pixel groups, else the padded
    # (rows, 3P) store); or force "rgbx"/"pad" explicitly (tests)
    frames: int = 1,  # frame-batched serving: y1 stacks `frames`
    # independent frames along rows (Hp = frames * per-frame rows); the
    # shared noise/bias/weight operands stay per-frame and the upsample
    # halo is masked at frame boundaries. Trajectory rendering batches
    # frames through ONE kernel launch instead of a per-frame scan.
    prepared=None,  # decoder_block_prepare(...) output: skips rebuilding
    # the y1-independent operands (trajectory-invariant serving prep).
    # noise1/noise2/w2/b1/b2/noise weights may then be None; wrgb/w_next/
    # noise_seeds still control WHICH outputs are emitted (pass the same
    # values used at prepare time, or any non-None placeholder of the
    # same shape).
):
    """Fused upsample+noise+act+conv2+noise+act (+ToRGB) for one decoder
    block in the packed-lane layout. The row halo is fetched in-kernel via
    single-row neighbor blocks (no host-side shifted copies).

    Returns feat (2Hp, 2Wp, C) when wrgb is None; (feat, rgb) with rgb
    (2Hp, 2Wp, 3) fp32 (pre-bias, pre-skip) when wrgb is given; rgb alone
    when additionally emit_feat=False (final block: the feature store is
    elided entirely). The RGB skip/bias chain stays in XLA."""
    hp, wp, c = y1.shape
    p = max(1, 128 // c)
    assert (c * p) % 128 == 0 or c >= 128, (c, p)
    l = p * c
    assert wp % p == 0 and hp % t_rows == 0, (hp, wp, p, t_rows)
    wb = wp // p

    if prepared is None:
        prepared = decoder_block_prepare(
            noise1, noise2, w2, b1, b2, noise_w1, noise_w2,
            wrgb=wrgb, w_next=w_next, noise_seeds=noise_seeds,
            c=c, fold_noise=fold_noise,
        )
    # which outputs/inputs exist is static pytree structure, not tracing
    hash_noise = "seeds" in prepared
    emit_rgb = "wrgbp" in prepared
    emit_y1 = "wk" in prepared
    g_rgb = 32 // p if p <= 32 else 0
    if rgb_pack is None:
        rgb_pack = (
            "rgbx"
            if emit_rgb and "wrgbx" in prepared and g_rgb > 0
            and (2 * wb) % g_rgb == 0
            else "pad"
        )
    assert emit_feat or emit_rgb
    b1t, b2t, nw = prepared["b1t"], prepared["b2t"], prepared["nw"]

    ypk = y1.reshape(hp, wb, l)
    if ypk.dtype not in (jnp.bfloat16, jnp.float32):
        ypk = ypk.astype(jnp.float32)

    assert hp % frames == 0, (hp, frames)
    hp_frame = hp // frames
    assert hp_frame % t_rows == 0, (hp_frame, t_rows)
    tpf = hp_frame // t_rows  # noise/halo tiles per frame
    g = hp // t_rows
    grid = (g,)
    row3 = lambda i: (i, 0, 0)
    # per-frame operands (noise) repeat every tpf tiles when frame-batched
    rowf = row3 if frames == 1 else (lambda i: (i % tpf, 0, 0))
    full2 = lambda i: (0, 0)
    tile = lambda r, w, ch: pl.BlockSpec((r, w, ch), row3, memory_space=pltpu.VMEM)
    tilef = lambda r, w, ch: pl.BlockSpec((r, w, ch), rowf, memory_space=pltpu.VMEM)
    const = lambda a, b_: pl.BlockSpec((a, b_), full2, memory_space=pltpu.VMEM)
    # single-row halo blocks: row above / below the tile, clamped at edges
    # (the kernel zero-masks them via program_id / frame boundary)
    halo_p = pl.BlockSpec(
        (1, wb, l), lambda i: (jnp.maximum(i * t_rows - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    halo_n = pl.BlockSpec(
        (1, wb, l),
        lambda i: (jnp.minimum((i + 1) * t_rows, hp - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )

    in_specs = [tile(t_rows, wb, l), halo_p, halo_n]
    operands = [ypk, ypk, ypk]
    if hash_noise:
        in_specs.append(pl.BlockSpec((1, 2), full2, memory_space=pltpu.SMEM))
        operands.append(prepared["seeds"])
    elif fold_noise:
        # pre-split even/odd out-W-blocks (kernel lane-concats them)
        in_specs += [
            tilef(2 * t_rows, wb, p), tilef(2 * t_rows, wb, p),
            tilef(2 * t_rows, 2 * wb, p),
        ]
        operands += list(prepared["noise"])
    else:
        in_specs += [
            tilef(2 * t_rows, 2 * wb, p), tilef(2 * t_rows, 2 * wb, p)
        ]
        operands += list(prepared["noise"])
    if fold_noise:
        # extended maps carry the nw0-scaled noise-expand rows:
        # even out = [x_prev | x | n1_even] @ M_e (+ bias after, unless the
        # maps also carry a b1 row — fold_noise="bias")
        me, mo, en = prepared["maps"]
        k_rows = me.shape[0]
        fold_bias = k_rows == 2 * l + p + 1  # maps carry the b1 row
        in_specs += [
            const(k_rows, l), const(k_rows, l),
            const(p, l),
            const(l, l),
            const(1, l), const(1, l),
            pl.BlockSpec((1, 2), full2, memory_space=pltpu.SMEM),
        ]
        operands += [me, mo, en, prepared["w2p"], b1t, b2t, nw]
    else:
        fold_bias = False
        ep, ec, oc, on, en = prepared["maps"]
        in_specs += [
            const(l, l), const(l, l), const(l, l), const(l, l),
            const(p, l),
            const(l, l),
            const(1, l), const(1, l),
            pl.BlockSpec((1, 2), full2, memory_space=pltpu.SMEM),
        ]
        operands += [ep, ec, oc, on, en, prepared["w2p"], b1t, b2t, nw]
    y1_merge = False
    if emit_y1:
        c_next = prepared["wk"].shape[1] // p
        p_next = max(1, 128 // c_next)
        assert p_next in (p, 2 * p), (p, p_next, c, c_next)
        y1_merge = p_next == 2 * p

    out_specs, out_shape = [], []
    if emit_feat:
        out_specs.append(tile(2 * t_rows, 2 * wb, l))
        out_shape.append(
            jax.ShapeDtypeStruct((2 * hp, 2 * wb, l), out_dtype)
        )
    if emit_rgb and rgb_pack == "rgbx":
        nwg = (2 * wb) // g_rgb
        in_specs.append(
            pl.BlockSpec(
                (g_rgb, l, 128), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(prepared["wrgbx"])  # (G, L, 128) dense RGBx maps
        out_specs.append(tile(2 * t_rows, nwg, 128))
        out_shape.append(
            jax.ShapeDtypeStruct((2 * hp, nwg, 128), jnp.float32)
        )
    elif emit_rgb:
        in_specs.append(const(l, 3 * p))
        operands.append(prepared["wrgbp"])  # (L, 3P) kron-expanded ToRGB
        out_specs.append(
            pl.BlockSpec(
                (2 * t_rows * 2 * wb, 3 * p), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((2 * hp * 2 * wb, 3 * p), jnp.float32)
        )
    if emit_y1:
        in_specs.append(const(l, p * c_next))
        operands.append(prepared["wk"])  # (L, p*C') kron-expanded conv_a'
        wb_n = wb if y1_merge else 2 * wb
        l_n = (2 * p if y1_merge else p) * c_next
        out_specs.append(tile(2 * t_rows, wb_n, l_n))
        out_shape.append(
            jax.ShapeDtypeStruct((2 * hp, wb_n, l_n), out_dtype)
        )

    kernel = functools.partial(
        _packed_kernel,
        colup_dtype=jnp.dtype(colup_dtype),
        rgb_dtype=jnp.dtype(rgb_dtype),
        store_dtype=jnp.dtype(out_dtype),
        pack_p=p,
        out_width=2 * wp,
        emit_feat=emit_feat,
        emit_rgb=emit_rgb,
        rgb_pack=rgb_pack,
        hash_noise=hash_noise,
        fold_noise=bool(fold_noise),
        fold_bias=fold_bias,
        emit_y1=emit_y1,
        y1_merge=y1_merge,
        tiles_per_frame=None if frames == 1 else tpf,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        interpret=interpret,
        # the ToRGB fold pushes the largest (1024^2) block's live
        # intermediates slightly past Mosaic's default 16 MiB scoped-vmem
        # budget; v5e has 128 MiB of VMEM — allow 64 MiB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(*operands)

    outs = outs if isinstance(outs, (tuple, list)) else (outs,)
    res = []
    i = 0
    if emit_feat:
        res.append(outs[i].reshape(2 * hp, 2 * wp, c))
        i += 1
    if emit_rgb:
        if rgb_pack == "rgbx":
            # (2Hp, NWg, 128) -> (2Hp, 2Wp, 4) row-major -> drop the pad
            res.append(
                outs[i].reshape(2 * hp, 2 * wp, 4)[..., :3]
            )
        else:
            res.append(outs[i].reshape(2 * hp, 2 * wp, 3))
        i += 1
    if emit_y1:
        # packed (2Hp, Wb', L') row-major == (2Hp, 2Wp, C') row-major
        res.append(outs[i].reshape(2 * hp, 2 * wp, c_next))
    return tuple(res) if len(res) > 1 else res[0]


def decoder_block_packed_reference(
    y1, noise1, noise2, w2, b1, b2, noise_w1, noise_w2
):
    """jnp oracle for the packed kernel (feature part of the block)."""
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
    return lrelu(h2 + noise_w2 * noise2 + b2)


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
