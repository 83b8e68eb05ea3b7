"""Trajectory serving: prepare once per identity, render per frame.

The reference's multi-view app computes the w latents once per video and
re-renders only the camera-dependent half per frame
(render_video_web_v10.py:1695-1824: get_ws + per-frame synthesis with
noise bufs created once at :1792). This module is that split for the
Pallas serving path — `prepare_trajectory` folds EVERYTHING that depends
only on (params, zs, noise): mapping MLPs, style-modulated conv weights,
kron operand expansions, FiLM coefficient folds, noise reshape/casts.
`render_frame` consumes the prep with just a camera.

Measured (tools/ab_serving.py, v5e): inside a jitted `lax.scan` over a
whole trajectory this is a WASH (2.74 vs 2.73 ms/frame) — XLA's
loop-invariant code motion already hoists the invariant prep out of the
scan. Per-frame dispatch on this remote-tunnel setup is equally a wash
(~33 ms/frame both ways: the host<->chip RPC round-trip dominates;
tools/ab_frame_latency.py). The split is shipped as the structurally
right serving surface — identity state computed once, camera-only frame
calls (matters wherever dispatch is not tunnel-bound), and it is what
bench.py's fused path now exercises end-to-end.

Numerics are identical to `Generator.__call__` with fused_renderer +
fused_decoder: both route through the same kernels; `prepare` merely
reschedules the trajectory-invariant ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core.camera import camera_from_angles
from .core.rays import prepare_nerf_inputs
from .kernels.siren_render import siren_prepare, siren_render_prepared
from .kernels.decoder_fused import decoder_fused_prepare, decoder_fused_render


def prepare_trajectory(
    model,  # models.generator.Generator (depth-2 serving flagship)
    params,
    zs,  # (z_render, z_decoder[, z_decoder_2])
    *,
    noise_bufs=None,  # fixed per trajectory (reference app semantics);
    noise_seed=None,  # or procedural hash noise — one of the two required
    truncation: float = 1.0,
    mean_latents=None,
    inject_index=None,
    fold_rgb: bool = True,  # fold ToRGB into the decoder kernels (dense
    # RGBx lane store, measured faster on v5e); pass the same value to
    # render_frame
    fold_noise=False,  # fold noise1 (True) or noise1+bias ("bias") into
    # the column-upsample matmuls (A/B option; see kernels.decoder_block)
):
    """Trajectory-invariant prep pytree for `render_frame`."""
    cfg = model.cfg
    assert noise_bufs is not None or noise_seed is not None, (
        "serving trajectories use fixed noise: pass noise_bufs or noise_seed"
    )
    style_render, style_decoder = model.apply(
        params, zs, truncation, mean_latents, inject_index, method="map_zs"
    )
    assert style_render.shape[0] == 1, "batch-1 serving path"
    # near/far are config constants (camera_from_angles derives them from
    # dist_radius alone), so the SIREN scale fold is trajectory-invariant
    cam0 = camera_from_angles(
        jnp.zeros((1,)), jnp.zeros((1,)), cfg.img_size,
        fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius,
    )
    dec = cfg.decoder
    return {
        "siren": siren_prepare(
            params["params"]["renderer"],
            style_render[0],
            cam0.near.reshape(-1)[0],
            cam0.far.reshape(-1)[0],
        ),
        "dec": decoder_fused_prepare(
            params["params"]["decoder"],
            style_decoder,
            noise_bufs,
            upsample_list=tuple(dec.upsample_list),
            size_start=dec.size_start,
            size_end=dec.size_end,
            channel_multiplier=dec.channel_multiplier,
            dtype=jnp.dtype(dec.dtype),
            noise_seed=None if noise_bufs is not None else noise_seed,
            feat_size=cfg.img_size,
            fold_rgb=fold_rgb,
            fold_noise=fold_noise,
        ),
    }


def render_frame(
    model,
    prep,  # prepare_trajectory(...) output
    azim,  # (F,) yaw — F frames of ONE identity in a single launch
    elev,  # (F,) pitch
    *,
    img_size: int | None = None,
    interpret: bool = False,  # CPU/interpret kernels (tests)
    fold_rgb: bool = True,  # must match prepare_trajectory
    fold_noise=False,  # must match prepare_trajectory
):
    """F frames from prepped state + camera angles, in one XLA program.

    F > 1 is the frame-batched trajectory path: rays of all frames stack on
    the SIREN's ray axis and the decoder runs one kernel launch per block
    with the frame axis stacked on kernel rows (decoder_fused_render
    frames=F) — per-frame XLA glue (weight staging, transition relayouts,
    skip fusions) amortizes over the chunk. Returns
    {"rgb": (F, out, out, 3), "thumb_rgb": (F, img, img, 3)}."""
    cfg = model.cfg
    img_size = img_size or cfg.img_size
    cam = camera_from_angles(
        azim, elev, img_size, fov_ang=cfg.fov_ang,
        dist_radius=cfg.dist_radius,
    )
    pts, rays_d, viewdirs, z_vals = prepare_nerf_inputs(
        focal=cam.focal,
        img_size=img_size,
        cam_poses=cam.extrinsics,
        near=cam.near,
        far=cam.far,
        n_samples=cfg.n_samples,
        perturb=False,
        static_viewdirs=cfg.static_viewdirs,
    )
    b, h, w, n, _ = pts.shape
    flat = lambda a: a.reshape(b * h * w, *a.shape[3:])
    thumb, feat, _, _, _ = siren_render_prepared(
        prep["siren"],
        flat(pts),
        flat(viewdirs),
        flat(z_vals),
        flat(rays_d),
        interpret=interpret,
    )
    features = feat.reshape(b, h, w, -1)
    dec = cfg.decoder
    rgb = decoder_fused_render(
        prep["dec"],
        features,
        upsample_list=tuple(dec.upsample_list),
        size_start=dec.size_start,
        size_end=dec.size_end,
        channel_multiplier=dec.channel_multiplier,
        dtype=jnp.dtype(dec.dtype),
        interpret=interpret,
        fold_rgb=fold_rgb,
        fold_noise=fold_noise,
    )
    return {"rgb": rgb, "thumb_rgb": thumb.reshape(b, h, w, 3)}


def render_trajectory_scan(model, prep, yaws, elev=None, *, interpret=False,
                           fold_rgb=True, fold_noise=False,
                           frames_per_step: int = 1):
    """Scan all frames in ONE XLA program (zero host dispatch between
    frames), returning a checksum-friendly stacked rgb mean per frame plus
    the last frame. Building block for benches; apps stack full frames
    themselves when they need pixels.

    frames_per_step > 1 chunks the trajectory into frame batches rendered
    through one kernel launch per decoder block (render_frame's F-frame
    path); len(yaws) must divide evenly."""
    if elev is None:
        elev = jnp.zeros_like(yaws)
    fps_ = frames_per_step
    assert yaws.shape[0] % fps_ == 0, (yaws.shape, fps_)

    def body(carry, ae):
        az, el = ae
        out = render_frame(model, prep, az.reshape(fps_), el.reshape(fps_),
                           interpret=interpret, fold_rgb=fold_rgb,
                           fold_noise=fold_noise)
        # per-frame means summed -> checksum comparable across
        # frames_per_step choices (parity checks in the A/B tools)
        rgb32 = out["rgb"].astype(jnp.float32)
        return carry + rgb32.mean(axis=(1, 2, 3)).sum(), None

    checksum, _ = jax.lax.scan(
        body, jnp.zeros(()),
        (yaws.reshape(-1, fps_), elev.reshape(-1, fps_)),
    )
    return checksum
