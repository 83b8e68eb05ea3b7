"""Fused FiLM-SIREN + volume-integration Pallas kernel (the "NeRF block").

The hot inference op of the flagship model (SURVEY.md §3.3 hot spots): for
each ray, run every depth sample through the 2-layer FiLM-SIREN MLP, then
alpha-composite along the ray — all in VMEM. The unfused XLA path writes the
per-sample activations (rays x samples x 256 fp32 ~ 100 MB per layer) to HBM
between layers; fusing the whole block reduces HBM traffic to the inputs
(rays x samples x 3) plus per-RAY outputs (rays x 256) — a ~24x write
reduction — and keeps the MXU fed from VMEM.

Matmuls run with bf16 inputs / fp32 accumulation (matching the TPU's default
fp32-matmul rounding, verified bit-identical on the thumbnail); the sin()
phase math and the compositing stay fp32.

Only the flagship geometry (depth-2 SIREN) is special-cased; other depths
fall back to the reference jnp path automatically.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_INV_2PI = 0.15915494309189535
_2PI = 6.283185307179586
# degree-9 odd minimax polynomial for sin on [-pi, pi], max err 8e-6
_SIN_C = (
    0.9999727636431689,
    -0.16661501432840328,
    0.008305441787505873,
    -0.00019215724206787978,
    2.125150239026409e-06,
)
# degree-7 odd minimax (Lawson-iterated lstsq), max err 2.5e-4 — still an
# order below the bf16 activations downstream; saves one FMA per element.
_SIN_C7 = (
    0.9992758282410646,
    -0.1656670344137187,
    0.007958082735916722,
    -0.0001450787306795439,
)
# Trace-time switch (A/B harness flips it between jits): 9 = default.
SIN_DEGREE = 9


def fast_sin(x):
    """Polynomial sin: libm-grade sin costs ~29 VPU cycles/element and is
    the single largest cost of the SIREN renderer (2.3 of 3.3 ms/frame,
    measured by ablation); range-reduce + degree-9 odd minimax is ~3x
    cheaper at 8e-6 absolute error — far below the bf16 activation noise.
    SIN_DEGREE=7 drops one Horner FMA at 2.5e-4 max error."""
    k = jnp.round(x * _INV_2PI)
    r = x - k * _2PI
    r2 = r * r
    if SIN_DEGREE == 7:
        c = _SIN_C7
        return r * (c[0] + r2 * (c[1] + r2 * (c[2] + r2 * c[3])))
    c = _SIN_C
    return r * (c[0] + r2 * (c[1] + r2 * (c[2] + r2 * (c[3] + r2 * c[4]))))


def _film(x, w, g, beff):
    """sin(g * (x @ w) + beff) with beff = g*bias + beta pre-folded
    host-side (constants only — folding g into the WEIGHTS would change
    which values get bf16-rounded and the resulting phase noise amplifies
    exponentially through the SIREN layers; folding the biases is pure
    fp32 reassociation). bf16 matmul inputs, fp32 phase."""
    lin = jnp.dot(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return fast_sin(g * lin + beff)


def _linear(x, w, b):
    return (
        jnp.dot(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + b
    )


def _integrate(rgb, sdf, feats, z_vals, dnorm, pts, sigmoid_beta):
    """SDF-sigma compositing over the sample axis (axis=1).

    rgb (R,S,3), sdf (R,S), feats (R,S,C), z_vals (R,S), dnorm (R,1),
    pts (R,S,3). Returns thumb (R,3), feat (R,C), xyz (R,3), mask_depth (R,2).
    Mirrors core.integration.volume_integration (nerf_utils.py:230-338)."""
    r, s = z_vals.shape
    dists = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], jnp.full((r, 1), 1e10, z_vals.dtype)],
        axis=1,
    ) * dnorm  # (R,S)
    sigma = jax.nn.sigmoid(-sdf / sigmoid_beta) / sigmoid_beta
    alpha = 1.0 - jnp.exp(-sigma * dists)  # (R,S)
    # exclusive cumprod of (1-alpha) as exp(log @ lower-triangular-ones):
    # Mosaic has no cumprod primitive, and on the MXU a (R,S)x(S,S) matmul
    # beats a sequential scan anyway. visibility_s = prod_{j<s} (1-alpha_j).
    # The contraction axis is zero-padded up to the 128-lane tile: padded
    # lanes are undefined on TPU (NaN in interpret mode) and must not feed
    # a reduction.
    s_pad = max(128, ((s + 127) // 128) * 128)
    # clamp: compilers may reassociate (1-alpha)+1e-10 to 0 at alpha==1,
    # and log(0) = -inf would turn the masked dot into NaN (0 * -inf).
    log1m = jnp.log(jnp.clip(1.0 - alpha + 1e-10, 1e-10, None))  # (R,S)
    log1m_p = jnp.concatenate(
        [log1m, jnp.zeros((r, s_pad - s), log1m.dtype)], axis=1
    )
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (s_pad, s), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (s_pad, s), 1)
    ).astype(log1m.dtype)  # tri[j, s] = 1 iff j < s
    visibility = jnp.exp(
        jnp.dot(log1m_p, tri, preferred_element_type=jnp.float32)
    )
    weights = alpha * visibility  # (R,S)

    # weighted sums over the sample axis as VPU multiply+reduce (Mosaic
    # cannot lower batched dot_general with a 2D lhs)
    w3 = weights[:, :, None]  # (R,S,1)
    thumb = -1.0 + 2.0 * jnp.sum(w3 * jax.nn.sigmoid(rgb), axis=1)
    feat = jnp.sum(w3 * feats, axis=1)
    xyz = jnp.sum(w3 * pts, axis=1)
    mask = weights[:, -1:]
    depth = -jnp.sqrt(jnp.sum(jnp.square(xyz), axis=-1, keepdims=True))
    return thumb, feat, xyz, mask, depth, weights


def _kernel(
    # inputs (VMEM blocks)
    pts_ref,  # (Rt, S, 3) world-space points
    view_ref,  # (Rt, 3)
    zvals_ref,  # (Rt, S)
    dnorm_ref,  # (Rt, 1)
    w0_ref, g0_ref, be0_ref,  # layer 0: (3,W) gamma (1,W) g*b+beta (1,W)
    w1_ref, g1_ref, be1_ref,  # layer 1: (W,W) (1,W) (1,W)
    wvh_ref, wvv_ref, gv_ref, bev_ref,  # view split: (W,W) (3,W) (1,W) (1,W)
    wsdf_ref, bsdf_ref,  # (W,1) (1,1)
    wrgb_ref, brgb_ref,  # (W,3) (1,3)
    scal_ref,  # (1,2) [pts_normalize_scale, sigmoid_beta] in SMEM
    # outputs
    thumb_ref,  # (Rt, 3)
    feat_ref,  # (Rt, W)
    xyz_ref,  # (Rt, 3)
    maskd_ref,  # (Rt, 2)
    sdf_ref,  # (Rt, S)
    *,
    n_samples: int,
    width: int,
):
    rt = pts_ref.shape[0]
    s = n_samples
    pts = pts_ref[:]  # (Rt, S, 3) fp32
    scale = scal_ref[0, 0]
    sigmoid_beta = scal_ref[0, 1]

    x = (pts * scale).reshape(rt * s, 3)  # normalized points
    h = _film(x, w0_ref[:], g0_ref[:], be0_ref[:])
    h = _film(h, w1_ref[:], g1_ref[:], be1_ref[:])
    sdf = _linear(h, wsdf_ref[:], bsdf_ref[:])  # (Rt*S, 1)

    # view conditioning WITHOUT the (Rt*S, W+3) concat: the view dirs are
    # per-RAY, so their K=3 contribution is a tiny (Rt,3)@(3,W) matmul
    # folded (with gamma/beta/bias) into a per-ray phase term broadcast
    # over samples — this also keeps the main matmul at K=W (the concat
    # form pads K = W+3 up to the next 128 multiple on the MXU)
    vterm = jnp.dot(
        view_ref[:].astype(jnp.bfloat16),
        wvv_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    vphase = gv_ref[:] * vterm + bev_ref[:]  # (Rt, W)
    hv = jnp.dot(
        h.astype(jnp.bfloat16),
        wvh_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(rt, s, width)
    feats = fast_sin(gv_ref[:] * hv + vphase[:, None, :]).reshape(
        rt * s, width
    )
    rgb = _linear(feats, wrgb_ref[:], brgb_ref[:])  # (Rt*S, 3)

    thumb, feat, xyz, mask, depth, _ = _integrate(
        rgb.reshape(rt, s, 3),
        sdf.reshape(rt, s),
        feats.reshape(rt, s, width),
        zvals_ref[:],
        dnorm_ref[:],
        pts,
        sigmoid_beta,
    )
    thumb_ref[:] = thumb
    feat_ref[:] = feat
    xyz_ref[:] = xyz
    # separate column stores: Mosaic rejects concatenating two (R,1) slices
    # with mismatched vector layouts
    maskd_ref[:, 0:1] = mask
    maskd_ref[:, 1:2] = depth
    sdf_ref[:] = sdf.reshape(rt, s)


def _pack_siren_params(net_params, styles):
    """Flatten the SirenGenerator param tree + per-layer styles into the
    kernel's weight operands. styles: (L+1, style_dim) for ONE sample.

    gamma/beta are style-conditioned FiLM coefficients
    (volume_renderer.py:66-83): g = 15*(s@Wg+bg)+30, e = 0.25*(s@We+be).
    The per-layer bias is folded as beff = g*bias + beta (fp32 constants —
    one VPU op saved per activation element; the WEIGHTS stay unfolded so
    bf16 rounding hits the same values as the XLA path). The view layer's
    (W+3, W) weight is split into its h-rows and view-rows: the view
    contribution is per-RAY."""

    def coeffs(node, style):
        g = 15.0 * (style @ node["gamma"]["weight"] + node["gamma"]["bias"]) + 30.0
        e = 0.25 * (style @ node["beta"]["weight"] + node["beta"]["bias"])
        beff = g * node["bias"] + e
        return g[None, :], beff[None, :]

    p0, p1 = net_params["pts_0"], net_params["pts_1"]
    pv = net_params["views"]
    g0, be0 = coeffs(p0, styles[0])
    g1, be1 = coeffs(p1, styles[1])
    gv, bev = coeffs(pv, styles[-1])
    width = p1["weight"].shape[1]
    return (
        p0["weight"], g0, be0,
        p1["weight"], g1, be1,
        pv["weight"][:width], pv["weight"][width:], gv, bev,
        net_params["sigma_head"]["weight"],
        net_params["sigma_head"]["bias"][None, :],
        net_params["rgb_head"]["weight"],
        net_params["rgb_head"]["bias"][None, :],
    )


def siren_prepare(renderer_params, styles, near, far):
    """Trajectory-invariant prep: style-conditioned FiLM fold + fp32 weight
    casts + scale/beta constants. In a multi-frame trajectory (fixed zs,
    varying camera — the reference app's get_ws-once semantics,
    render_video_web_v10.py:1806-1824) this runs ONCE instead of per frame
    inside the scan body."""
    net = renderer_params["network"]
    weights = _pack_siren_params(net, styles)
    scale = (2.0 / (far - near)).reshape(())
    sbeta = renderer_params["sigmoid_beta"].reshape(())
    scal = jnp.stack([scale, sbeta]).reshape(1, 2).astype(jnp.float32)
    return {
        "weights": tuple(w.astype(jnp.float32) for w in weights),
        "scal": scal,
    }


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "interpret")
)
def siren_render_prepared(
    prepared,  # siren_prepare(...) output
    pts: jnp.ndarray,  # (R, S, 3) world points
    viewdirs: jnp.ndarray,  # (R, 3)
    z_vals: jnp.ndarray,  # (R, S)
    rays_d: jnp.ndarray,  # (R, 3)
    ray_tile: int = 128,
    interpret: bool = False,
):
    """Per-frame half of the fused render (camera-dependent inputs only).
    Returns (thumb (R,3), feat (R,W), sdf (R,S,1), mask_depth (R,2),
    xyz (R,3))."""
    r, s, _ = pts.shape
    weights = prepared["weights"]
    scal = prepared["scal"]
    width = weights[3].shape[1]  # pts_1 weight (W, W)
    assert r % ray_tile == 0, (r, ray_tile)
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)  # (R,1)

    grid = (r // ray_tile,)
    row = lambda i: (i, 0)
    row3 = lambda i: (i, 0, 0)
    full = lambda i: (0, 0)

    in_specs = [
        pl.BlockSpec((ray_tile, s, 3), row3, memory_space=pltpu.VMEM),  # pts
        pl.BlockSpec((ray_tile, 3), row, memory_space=pltpu.VMEM),  # viewdirs
        pl.BlockSpec((ray_tile, s), row, memory_space=pltpu.VMEM),  # z_vals
        pl.BlockSpec((ray_tile, 1), row, memory_space=pltpu.VMEM),  # dnorm
    ]
    for wgt in weights:
        in_specs.append(
            pl.BlockSpec(wgt.shape, full, memory_space=pltpu.VMEM)
        )
    in_specs.append(pl.BlockSpec((1, 2), full, memory_space=pltpu.SMEM))

    out_shape = (
        jax.ShapeDtypeStruct((r, 3), jnp.float32),  # thumb
        jax.ShapeDtypeStruct((r, width), jnp.float32),  # feat
        jax.ShapeDtypeStruct((r, 3), jnp.float32),  # xyz
        jax.ShapeDtypeStruct((r, 2), jnp.float32),  # mask_depth
        jax.ShapeDtypeStruct((r, s), jnp.float32),  # sdf
    )
    out_specs = (
        pl.BlockSpec((ray_tile, 3), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_tile, width), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_tile, 3), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_tile, 2), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_tile, s), row, memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_kernel, n_samples=s, width=width)
    thumb, feat, xyz, maskd, sdf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        pts.astype(jnp.float32),
        viewdirs.astype(jnp.float32),
        z_vals.astype(jnp.float32),
        dnorm.astype(jnp.float32),
        *weights,
        scal,
    )
    return thumb, feat, sdf[..., None], maskd, xyz


def siren_render_fused(
    renderer_params: Any,  # {'sigmoid_beta', 'network': {...}} (depth-2)
    styles: jnp.ndarray,  # (L+1, style_dim) — single sample
    pts: jnp.ndarray,  # (R, S, 3) world points
    viewdirs: jnp.ndarray,  # (R, 3)
    z_vals: jnp.ndarray,  # (R, S)
    rays_d: jnp.ndarray,  # (R, 3)
    near: jnp.ndarray,  # scalar-ish
    far: jnp.ndarray,
    ray_tile: int = 128,
    interpret: bool = False,
):
    """Fused render of one batch item (prepare + render in one call).
    Returns (thumb (R,3), feat (R,W), sdf (R,S,1), mask_depth (R,2),
    xyz (R,3)).

    Deliberately NOT jitted as a unit: the prep half runs in the caller's
    context, so an eager call computes bit-identical prep to
    serving.prepare_trajectory (same programs -> exact split/one-shot
    parity), while a jitted caller traces everything into one program
    as before."""
    prepared = siren_prepare(renderer_params, styles, near, far)
    return siren_render_prepared(
        prepared, pts, viewdirs, z_vals, rays_d,
        ray_tile=ray_tile, interpret=interpret,
    )


@jax.custom_vjp
def siren_render(renderer_params, styles, pts, viewdirs, z_vals, rays_d,
                 near, far):
    """Differentiable fused render: Pallas-fast forward, XLA backward.

    The kernel itself has no hand-written VJP; the backward pass replays the
    jnp reference under jax.vjp — gradients are exact for the reference
    semantics while the (more frequent) forward runs at kernel speed. Used
    by inversion; full training keeps the XLA path (eikonal needs the pts
    vjp inside the forward)."""
    return siren_render_fused(
        renderer_params, styles, pts, viewdirs, z_vals, rays_d, near, far
    )


def _siren_render_fwd(renderer_params, styles, pts, viewdirs, z_vals, rays_d,
                      near, far):
    out = siren_render_fused(
        renderer_params, styles, pts, viewdirs, z_vals, rays_d, near, far
    )
    return out, (renderer_params, styles, pts, viewdirs, z_vals, rays_d,
                 near, far)


def _siren_render_bwd(res, cotangents):
    _, vjp = jax.vjp(siren_render_reference, *res)
    return vjp(cotangents)


siren_render.defvjp(_siren_render_fwd, _siren_render_bwd)


def siren_render_reference(
    renderer_params, styles, pts, viewdirs, z_vals, rays_d, near, far,
    matmul_dtype=jnp.bfloat16,
):
    """Pure-jnp oracle with identical signature (parity tests + fallback).

    matmul inputs round to bf16 by default — this matches both the fused
    kernel and the TPU XLA default for fp32 dots, so parity tests can be
    tight; pass matmul_dtype=float32 for a full-precision reference."""
    from ..core.rays import normalize_points
    from ..core.integration import volume_integration

    net = renderer_params["network"]
    scale = (2.0 / (far - near)).reshape(())
    x = pts * scale
    dirs = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)

    def dot(a, b):
        return jnp.dot(
            a.astype(matmul_dtype),
            b.astype(matmul_dtype),
            preferred_element_type=jnp.float32,
        )

    def film(node, h, style):
        g = 15.0 * (style @ node["gamma"]["weight"] + node["gamma"]["bias"]) + 30.0
        e = 0.25 * (style @ node["beta"]["weight"] + node["beta"]["bias"])
        lin = dot(h, node["weight"]) + node["bias"]
        return jnp.sin(g * lin + e)

    h = film(net["pts_0"], x, styles[0])
    h = film(net["pts_1"], h, styles[1])
    sdf = dot(h, net["sigma_head"]["weight"]) + net["sigma_head"]["bias"]
    hv = jnp.concatenate([h, dirs], axis=-1)
    feats = film(net["views"], hv, styles[-1])
    rgb = dot(feats, net["rgb_head"]["weight"]) + net["rgb_head"]["bias"]

    thumb, feat, xyz, maskd = volume_integration(
        rgb=rgb, sdf=sdf, features=feats, z_vals=z_vals, rays_d=rays_d,
        pts=pts, with_sdf=True, sigmoid_beta=renderer_params["sigmoid_beta"],
    )
    return thumb, feat, sdf, maskd, xyz
