"""Serving-path CIPS decoder with Pallas-fused upsample blocks.

Runs the whole Decoder (models/decoder.py, contract model_v3.py:522-729)
for batch 1 from the raw param tree: the pre-upsample 1x1 modulated convs
stay XLA einsums (MXU-bound, small activations), while every upsample block
— the HBM-bound half of serving time — goes through
kernels.decoder_block.decoder_block_packed (one read + one write of the
block's activation map instead of XLA's ~11 fusion passes). ToRGB is folded
into the kernel too (it would otherwise re-read the full feature map from
HBM), and the FINAL block's feature store is elided entirely — its features
are only consumed by ToRGB. Only the 3-channel RGB skip accumulation stays
XLA.

The pipeline is split prepare/render: `decoder_fused_prepare` computes
every style/noise-dependent operand (modulated weights, kron expansions,
noise casts — all fixed for a whole trajectory, matching the reference
app's get_ws-once semantics, render_video_web_v10.py:1792-1824) and
`decoder_fused_render` consumes it per frame. `decoder_fused_apply` is
prepare+render in one call (training-free serving parity surface).

Numerics match the flax Decoder: fp32 upsample/noise/bias paths, bf16 matmul
inputs with fp32 accumulation (the TPU default rounding for fp32 dots).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..models.layers import channel_table
from ..ops.modulated import modulate_weights_1x1
from ..ops.upfirdn2d import upsample2x
from ..ops.fused_act import fused_leaky_relu
from .decoder_block import (
    decoder_block_packed,
    decoder_block_prepare,
    hash_noise_map,
    layer_seed,
)


def _mod_style(mod, style):
    """EqualLinear(modulation) forward: scale 1/sqrt(in), bias_init 1."""
    w, b = mod["weight"], mod["bias"]
    return style @ (w * (1.0 / np.sqrt(w.shape[0]))) + b


def _conv_weight(node, style, demodulate=True):
    """(Cin, Cout) modulated weight for one sample from a StyledConv/ToRGB
    conv node {weight (1,1,Cin,Cout), modulation {...}}."""
    s = _mod_style(node["modulation"], style)
    return modulate_weights_1x1(node["weight"][0, 0], s, demodulate=demodulate)[0]


def _matmul_img(x, w, dtype):
    """(1, H, W, Cin) @ (Cin, Cout), bf16-in/fp32-acc when dtype is bf16."""
    b, h, ww, c = x.shape
    y = jnp.dot(
        x.reshape(-1, c).astype(dtype),
        w.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(b, h, ww, -1)


def _plan(upsample_list, fuse_res, size_start, size_end, chain_y1,
          channel_multiplier):
    """Static per-resolution schedule shared by prepare and render: list of
    (res, kind, carried_in, w_next_c) with kind in {'xla_up', 'fused',
    'plain'}; carried_in = this fused block's conv_a output arrives from
    the previous kernel (chain_y1); w_next_c = successor channel count when
    this kernel must emit the successor's conv_a (else None)."""
    channels = channel_table(channel_multiplier)
    log_in = int(math.log2(size_start))
    log_out = int(math.log2(size_end))
    if fuse_res is None:
        fuse_res = tuple(upsample_list)
    steps = []
    carried_next = False
    for i in range(log_in + 1, log_out + 1):
        res = 2**i
        up = res in upsample_list
        if up and res not in fuse_res:
            kind = "xla_up"
            carried_in, w_next_c = False, None
            carried_next = False
        elif up:
            kind = "fused"
            carried_in = carried_next
            last = i == log_out
            next_res = 2 ** (i + 1)
            w_next_c = None
            if (
                chain_y1
                and not last
                and next_res in upsample_list
                and next_res in fuse_res
            ):
                c_cur = channels[res]
                c_nxt = channels[next_res]
                p_cur = max(1, 128 // c_cur)
                p_nxt = max(1, 128 // c_nxt)
                if p_nxt in (p_cur, 2 * p_cur):
                    w_next_c = c_nxt
            carried_next = w_next_c is not None
        else:
            kind = "plain"
            carried_in, w_next_c = False, None
            carried_next = False
        steps.append((res, kind, carried_in, w_next_c))
    return steps, channels


def decoder_fused_prepare(
    dec_params,
    styles,  # (1, n_latent, style_dim)
    noise,  # list[num_layers] of (1, h, w, 1) buffers, or None w/ noise_seed
    *,
    upsample_list,
    size_start: int = 4,
    size_end: int = 1024,
    channel_multiplier: int = 2,
    dtype=jnp.bfloat16,
    fuse_res=None,
    fold_rgb=False,
    noise_seed=None,
    fold_noise: bool = False,
    chain_y1: bool = False,
    feat_size: int | None = None,  # renderer feature-map size; required
    # with noise_seed (otherwise derived from noise[0])
):
    """Trajectory-invariant half: modulated weights, kernel operand packs
    (kron expansions, bias tiles), noise buffers reshaped/cast to their
    kernel dtypes. Returns a pytree for `decoder_fused_render`; the static
    kwargs passed here must be repeated at render time."""
    # ONE identity per prep: a multi-frame render shares these styles
    # (per-sample style batches must go through the flax Decoder)
    assert styles.shape[0] == 1, styles.shape
    log_in = int(math.log2(size_start))
    log_out = int(math.log2(size_end))
    n_latent = (log_out - log_in) * 2 + 2
    assert styles.shape[1] == n_latent, styles.shape
    n_noise = (log_out - log_in) * 2 + 1
    if noise_seed is None:
        assert noise is not None and len(noise) == n_noise
    elif noise is None:
        noise = [None] * n_noise
    dt = jnp.dtype(dtype)

    def get_noise(idx, h, w):
        if noise[idx] is not None:
            return noise[idx]
        return hash_noise_map(h, w, layer_seed(noise_seed, idx))[None]

    cur = feat_size
    if cur is None:
        assert noise[0] is not None, "feat_size required with noise_seed"
        cur = noise[0].shape[1]

    def conv_rec(node, style, nbuf):
        return {
            "w": _conv_weight(node["conv"], style).astype(dt),
            "n": nbuf,
            "nw": node["noise"]["weight"].reshape(()),
            "b": node["act_bias"],
        }

    def rgb_rec(node, style):
        return {
            "w": _conv_weight(node["conv"], style, demodulate=False).astype(
                dt
            ),
            "b": node["bias"],
        }

    prep = {
        "head": conv_rec(dec_params["conv1"], styles[:, 0], get_noise(0, cur, cur)),
        "rgb1": rgb_rec(dec_params["to_rgb1"], styles[:, 1]),
        "blocks": [],
    }

    steps, channels = _plan(
        upsample_list, fuse_res, size_start, size_end, chain_y1,
        channel_multiplier,
    )
    layer_i, noise_i, block = 1, 1, 0
    for res, kind, carried_in, w_next_c in steps:
        ca = dec_params[f"convs_{2 * block}"]
        cb = dec_params[f"convs_{2 * block + 1}"]
        rgb_node = dec_params[f"to_rgbs_{block}"]
        if kind != "plain":
            cur *= 2
        rec = {}
        if kind == "fused":
            if not carried_in:
                rec["wa"] = _conv_weight(ca["conv"], styles[:, layer_i]).astype(dt)
            wb_w = _conv_weight(cb["conv"], styles[:, layer_i + 1])
            wrgb = (
                _conv_weight(
                    rgb_node["conv"], styles[:, layer_i + 2], demodulate=False
                )
                if fold_rgb
                else None
            )
            w_next = None
            if w_next_c is not None:
                nxt_ca = dec_params[f"convs_{2 * (block + 1)}"]
                # ToRGB and the next conv_a share the style index
                w_next = _conv_weight(nxt_ca["conv"], styles[:, layer_i + 2])
            if noise_seed is not None and noise[noise_i] is None:
                n_a = n_b = None
                seeds = jnp.stack(
                    [
                        layer_seed(noise_seed, noise_i),
                        layer_seed(noise_seed, noise_i + 1),
                    ]
                )
            else:
                # bf16 serving: the (.., P<128)-minor noise tiles lane-pad
                # to 128 in the kernel's layout; bf16 halves that DMA
                n_a = noise[noise_i][0].astype(dt)
                n_b = noise[noise_i + 1][0].astype(dt)
                seeds = None
            rec["bp"] = decoder_block_prepare(
                n_a,
                n_b,
                wb_w,
                ca["act_bias"],
                cb["act_bias"],
                ca["noise"]["weight"].reshape(()),
                cb["noise"]["weight"].reshape(()),
                wrgb=wrgb,
                w_next=w_next,
                noise_seeds=seeds,
                c=channels[res],
                fold_noise=fold_noise,
            )
            if fold_rgb:
                rec["rgb_b"] = rgb_node["bias"]
            else:
                rec["rgb"] = rgb_rec(rgb_node, styles[:, layer_i + 2])
        else:
            rec["a"] = conv_rec(ca, styles[:, layer_i], get_noise(noise_i, cur, cur))
            rec["b"] = conv_rec(
                cb, styles[:, layer_i + 1], get_noise(noise_i + 1, cur, cur)
            )
            rec["rgb"] = rgb_rec(rgb_node, styles[:, layer_i + 2])
        prep["blocks"].append(rec)
        layer_i += 2
        noise_i += 2
        block += 1
    return prep


def decoder_fused_render(
    prep,  # decoder_fused_prepare(...) output (same static kwargs!)
    features,  # (1, H, W, in_channel) renderer feature map
    *,
    upsample_list,
    size_start: int = 4,
    size_end: int = 1024,
    channel_multiplier: int = 2,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    fuse_res=None,
    fold_rgb=False,
    fold_noise: bool = False,
    chain_y1: bool = False,
):
    """Per-frame half: everything that depends on the renderer features.

    `features` may carry F > 1 leading entries — F FRAMES of the same
    identity (one trajectory, shared styles/noise), rendered through one
    launch per block with the frame axis stacked on kernel rows
    (decoder_block_packed frames=F). This is the TPU-idiomatic trajectory
    path: the per-frame XLA glue (weight staging, transition relayouts,
    skip fusions) amortizes over the whole chunk."""
    f = features.shape[0]
    # chain_y1 emits successor conv_a packed per-tile; untested across
    # stacked frame rows (and measured slower anyway) — keep them exclusive
    assert not (chain_y1 and f > 1), "chain_y1 is single-frame only"
    dt = jnp.dtype(dtype)

    def styled_conv(rec, x):
        y = _matmul_img(x, rec["w"], dt)
        y = y + rec["nw"] * rec["n"]
        return fused_leaky_relu(y, rec["b"])

    def to_rgb(rec, x, skip, up):
        out = _matmul_img(x, rec["w"], dt).astype(jnp.float32) + rec["b"]
        if skip is not None:
            if up:
                skip = upsample2x(skip)
            out = out + skip
        return out

    x = styled_conv(prep["head"], features.astype(jnp.float32))
    skip = to_rgb(prep["rgb1"], x, None, False)

    steps, _ = _plan(
        upsample_list, fuse_res, size_start, size_end, chain_y1,
        channel_multiplier,
    )
    log_out = int(math.log2(size_end))
    y1_carry = None  # successor conv_a output emitted by the previous kernel
    for (res, kind, carried_in, w_next_c), rec in zip(steps, prep["blocks"]):
        if kind == "xla_up":
            # XLA up-block: same decomposition as the kernel (matmul at the
            # previous resolution, shift-add separable 2x upsample, noise,
            # act, conv_b) — XLA's fusion handles the wide-channel blocks
            # well; the kernel wins only on the narrow-channel (C<128)
            # late blocks where lane padding breaks XLA's tiling.
            a = rec["a"]
            y1 = _matmul_img(x, a["w"], dt)
            h = upsample2x(y1)
            h = fused_leaky_relu(h + a["nw"] * a["n"], a["b"])
            x = styled_conv(rec["b"], h)
            skip = to_rgb(rec["rgb"], x, skip, True)
        elif kind == "fused":
            # fused block: conv_a matmul at the previous resolution (XLA,
            # or carried from the previous kernel's in-kernel emission),
            # then upsample+noise+act+conv_b+noise+act+ToRGB in one kernel
            # pass. The final block elides its feature store entirely — its
            # features are only ever consumed by ToRGB.
            last = res == 2**log_out
            if carried_in:
                y1 = y1_carry
                y1_carry = None
            else:
                # frame axis stacked on rows: (F, Hp, Wp, C) -> (F*Hp, ..)
                y1b = _matmul_img(x, rec["wa"], dt).astype(dt)
                y1 = y1b.reshape(-1, *y1b.shape[2:])
            hp = y1.shape[0] // f
            out = decoder_block_packed(
                y1,
                None,
                None,
                None,
                None,
                None,
                None,
                None,
                prepared=rec["bp"],
                t_rows=min(8, hp),
                interpret=interpret,
                out_dtype=dt,
                emit_feat=(not last) or not fold_rgb,
                colup_dtype=dt if dt == jnp.bfloat16 else jnp.float32,
                rgb_dtype=dt,
                fold_noise=fold_noise,
                frames=f,
            )
            outs = list(out) if isinstance(out, tuple) else [out]
            if w_next_c is not None:
                y1_carry = outs.pop()
            unstack = lambda a: a.reshape(f, a.shape[0] // f, *a.shape[1:])
            if fold_rgb:
                feat, rgb = (None, outs[0]) if last else outs
                x = None if last else unstack(feat)
                rgb = unstack(rgb).astype(jnp.float32) + rec["rgb_b"]
                skip = rgb + upsample2x(skip)
            else:
                x = unstack(outs[0])
                skip = to_rgb(rec["rgb"], x, skip, True)
        else:
            x = styled_conv(rec["a"], x)
            x = styled_conv(rec["b"], x)
            skip = to_rgb(rec["rgb"], x, skip, False)

    return skip.astype(jnp.float32)


def decoder_fused_apply(
    dec_params,
    features,  # (1, H, W, in_channel) renderer feature map
    styles,  # (1, n_latent, style_dim)
    noise,  # list[num_layers] of (1, h, w, 1) buffers (required)
    *,
    upsample_list,
    size_start: int = 4,
    size_end: int = 1024,
    channel_multiplier: int = 2,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    fuse_res=None,  # resolutions whose up-block runs the Pallas kernel;
    # None -> all of upsample_list. Unfused up-blocks run the identical
    # XLA math (shift-add upsample2x + matmuls), so fuse_res only moves
    # the XLA/kernel boundary, never the numerics contract.
    fold_rgb=False,  # fold ToRGB into the kernel. Measured OFF is faster:
    # Pallas outputs use the default tiled layout, so the (rows, 3P) packed
    # rgb pads its lane dim 3P -> 128 in HBM (~10x the logical bytes); the
    # interleaved A/B showed 9.2 ms/frame folded vs 3.0 ms unfolded. Kept
    # as an option pending a planar-layout rgb store.
    noise_seed=None,  # uint32: derive ALL noise procedurally from one seed
    # (decoder_block.hash_noise_map / in-kernel hash). Serving-only: a fixed
    # deterministic realization per seed, replacing the (.., P<128)-minor
    # noise buffers whose lane padding costs ~10x their bytes to read.
    # `noise` may then be None; explicit buffers keep priority for
    # inversion artifacts.
    fold_noise: bool = False,  # fold the first noise injection into the
    # column-upsample matmuls (kernel K: 2L -> 2L+P). Measured SLOWER on
    # v5e (3.09 vs 2.71 ms/frame interleaved A/B): padding K 260 -> 384
    # costs the MXU more than the saved noise-expand matmul + fused
    # VPU adds — Mosaic was already fusing the noise/bias adds into one
    # post-matmul pass. Kept as a tested option; fp32 matches the unfolded
    # kernel up to dot accumulation order.
    chain_y1: bool = False,  # emit each fused block's successor conv_a
    # output INSIDE the kernel (packed for the successor). Numerically
    # identical to the XLA path (same trajectory checksum), but measured
    # SLOWER on v5e: 3.90 vs 2.76 ms/frame interleaved A/B. The feat ->
    # XLA dot -> repack copies it removes are ASYNC (copy-start/-done)
    # and largely hidden behind kernel compute, while the in-kernel
    # emission serializes extra MXU work + a third output DMA into the
    # kernel's critical path. Kept as a parity-tested option.
):
    """Fused-decoder forward; mirrors models.Decoder.__call__ exactly for
    batch 1, kernel_size 1, explicit noise. Returns rgb (1, H*up, W*up, 3).

    Equivalent to decoder_fused_prepare + decoder_fused_render — every
    parity test of this function covers the split serving path too."""
    prep = decoder_fused_prepare(
        dec_params,
        styles,
        noise,
        upsample_list=upsample_list,
        size_start=size_start,
        size_end=size_end,
        channel_multiplier=channel_multiplier,
        dtype=dtype,
        fuse_res=fuse_res,
        fold_rgb=fold_rgb,
        noise_seed=noise_seed,
        fold_noise=fold_noise,
        chain_y1=chain_y1,
        feat_size=features.shape[1],
    )
    return decoder_fused_render(
        prep,
        features,
        upsample_list=upsample_list,
        size_start=size_start,
        size_end=size_end,
        channel_multiplier=channel_multiplier,
        dtype=dtype,
        interpret=interpret,
        fuse_res=fuse_res,
        fold_rgb=fold_rgb,
        fold_noise=fold_noise,
        chain_y1=chain_y1,
    )
