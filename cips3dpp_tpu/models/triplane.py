"""Triplane volume renderer (the EG3D-style experimental renderer).

Behavioural contract: exp/cips3d/models/volume_renderer_v8.py:728-1008
(TriplaneRenderer + TriplaneNet + PosEncoding; used by the experimental
v4/v8 model lineage, model_v8.py:1316). Planes (B, 3, C, H, W) are sampled
at projected 3D points with bilinear zero-padded align_corners=False
interpolation (the reference routes through grid_sample_cus for
double-backward; JAX autodiff gives that for free), features from the
three planes are concatenated and fed to a softplus MLP with an SDF head
and a view-conditioned rgb/feature head, then integrated with the shared
SDF volume integration (core/integration.py).

TPU-first: the bilinear sample is a flat gather + lerp (4 taps; XLA lowers
take_along_axis to one gather per tap), the MLP is batched matmuls over
(rays x samples) rows on the MXU, and eikonal uses the same pts-vjp trick
as models/renderer.py — no autograd-graph surgery.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.rays import normalize_points
from ..core.integration import volume_integration


# ------------------------------------------------------------- sampling --


def grid_sample_bilinear(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of NHWC features at [-1, 1] grid coords.

    Matches torch.nn.functional.grid_sample(mode='bilinear',
    padding_mode='zeros', align_corners=False): coords[..., 0] is x (width
    axis), coords[..., 1] is y (height axis); pixel centres at half-integer
    grid positions; out-of-bounds taps contribute zero.

    feat: (B, H, W, C); coords: (B, N, 2) -> (B, N, C).
    """
    B, H, W, C = feat.shape
    x = (coords[..., 0] + 1.0) * (W / 2.0) - 0.5
    y = (coords[..., 1] + 1.0) * (H / 2.0) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    flat = feat.reshape(B, H * W, C)

    def tap(ix, iy):
        inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        idx = iyc * W + ixc  # (B, N)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, N, C)
        return g * inb[..., None].astype(feat.dtype)

    return (
        tap(x0, y0) * ((1 - wx) * (1 - wy))[..., None]
        + tap(x0 + 1, y0) * (wx * (1 - wy))[..., None]
        + tap(x0, y0 + 1) * ((1 - wx) * wy)[..., None]
        + tap(x0 + 1, y0 + 1) * (wx * wy)[..., None]
    )


def generate_planes(mode: str = "xy_xz_yz") -> np.ndarray:
    """Plane axis triplets (volume_renderer_v8.py:832-868)."""
    if mode == "xy_xz_zx":
        axes = [
            [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
            [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
            [[0, 0, 1], [1, 0, 0], [0, 1, 0]],
        ]
    elif mode == "xy_xz_yz":
        axes = [
            [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
            [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
            [[0, 1, 0], [0, 0, 1], [1, 0, 0]],
        ]
    else:
        raise NotImplementedError(mode)
    return np.asarray(axes, np.float32)


def project_onto_planes(plane_axes: np.ndarray, coords: jnp.ndarray):
    """3D points -> per-plane 2D coords (volume_renderer_v8.py:869-884):
    projections = coords @ inv(axes), keep the first two components.
    coords (B, N, 3) -> (B, n_planes, N, 2). The inverses are constants
    (permutation-like matrices), folded at trace time."""
    inv = np.linalg.inv(plane_axes)  # (P, 3, 3)
    proj = jnp.einsum("bnc,pcd->bpnd", coords, jnp.asarray(inv))
    return proj[..., :2]


def sample_from_planes(
    plane_axes: np.ndarray, plane_features: jnp.ndarray, coords: jnp.ndarray
) -> jnp.ndarray:
    """plane_features (B, P, C, H, W) [torch layout, matches the reference
    generator's plane tensor], coords (B, N, 3) in [-1, 1] ->
    (B, P, N, C) sampled features (volume_renderer_v8.py:885-918)."""
    B, P, C, H, W = plane_features.shape
    feat = plane_features.transpose(0, 1, 3, 4, 2).reshape(B * P, H, W, C)
    proj = project_onto_planes(plane_axes, coords)  # (B, P, N, 2)
    proj = proj.reshape(B * P, -1, 2)
    out = grid_sample_bilinear(feat, proj)  # (B*P, N, C)
    return out.reshape(B, P, -1, C)


# -------------------------------------------------------------- modules --


class PosEncoding(nn.Module):
    """x -> [x?, sin(2^k pi x)..., cos(2^k pi x)...]
    (volume_renderer_v8.py:656-726; freqs = 2^k * pi, all sins then all
    cos's on the last axis)."""

    n_freqs: int
    append_xyz: bool = False

    @nn.compact
    def __call__(self, x):
        freqs = [2.0**k * np.pi for k in range(self.n_freqs)]
        out = [x] if self.append_xyz else []
        for fn in (jnp.sin, jnp.cos):
            out += [fn(f * x) for f in freqs]
        return jnp.concatenate(out, axis=-1)

    def out_dim(self, in_dim: int = 3) -> int:
        return in_dim * 2 * self.n_freqs + (in_dim if self.append_xyz else 0)


class _Linear(nn.Module):
    """LinearLayer (volume_renderer_v8.py:17-37): plain affine; the
    reference's init variants only change the initial scale."""

    out_dim: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        s = self.scale

        def unif(a):
            return lambda key, shape: jax.random.uniform(
                key, shape, minval=-a, maxval=a
            )

        w = self.param("weight", unif(s), (in_dim, self.out_dim))
        b = self.param("bias", unif(1.0 / np.sqrt(in_dim)), (self.out_dim,))
        return x @ w + b


class TriplaneNet(nn.Module):
    """sigma branch + view-conditioned rgb/feature branch
    (volume_renderer_v8.py:600-653)."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, feats, view_enc=None):
        h = _Linear(self.hidden_dim, name="sigma_0")(feats)
        sdf = _Linear(1, name="sigma_1")(nn.softplus(h))

        x = feats if view_enc is None else jnp.concatenate(
            [feats, view_enc], axis=-1
        )
        x = _Linear(self.hidden_dim, name="views_0")(x)
        x = _Linear(self.hidden_dim, name="views_1")(nn.softplus(x))
        rgb = _Linear(3, name="rgb")(x)
        return rgb, sdf, x


@dataclasses.dataclass(frozen=True)
class TriplaneConfig:
    plane_channels: int = 32
    hidden_dim: int = 256
    with_sdf: bool = True
    view_n_freqs: int = 0  # 0 = no view encoding (reference default cfgs)
    triplane_mode: str = "xy_xz_yz"


class TriplaneRenderer(nn.Module):
    """Volume renderer over generator-produced feature planes
    (volume_renderer_v8.py:728-831)."""

    cfg: TriplaneConfig = TriplaneConfig()

    def setup(self):
        self.network = TriplaneNet(self.cfg.hidden_dim)
        if self.cfg.view_n_freqs > 0:
            self.view_encoding = PosEncoding(self.cfg.view_n_freqs)
        self.sigmoid_beta = self.param(
            "sigmoid_beta", lambda k: 0.1 * jnp.ones((1,))
        )
        self._plane_axes = generate_planes(self.cfg.triplane_mode)

    def run_network(self, planes, npts, viewdirs):
        """npts (B, R, S, 3) normalised to [-1, 1]; viewdirs (B, R, 3)."""
        B, R, S, _ = npts.shape
        sampled = sample_from_planes(
            self._plane_axes, planes, npts.reshape(B, R * S, 3)
        )  # (B, P, R*S, C)
        # concat plane features (run_network: "N_plane C_plane" merge)
        feats = sampled.transpose(0, 2, 1, 3).reshape(B, R, S, -1)

        view_enc = None
        if self.cfg.view_n_freqs > 0:
            dirs = jnp.broadcast_to(viewdirs[:, :, None, :], npts.shape)
            view_enc = self.view_encoding(dirs)
        return self.network(feats, view_enc)

    def __call__(
        self,
        planes,  # (B, 3, C, H, W)
        pts,  # (B, R, S, 3) world points
        rays_d,  # (B, R, 3)
        viewdirs,  # (B, R, 3)
        z_vals,  # (B, R, S)
        near,
        far,
        return_eikonal: bool = False,
    ):
        if return_eikonal:
            # d(sdf)/d(pts): vjp through normalisation + plane sampling +
            # MLP (same pattern as models/renderer.py:102-113)
            def net(p):
                return self.run_network(
                    planes, normalize_points(p, near, far), viewdirs
                )

            (rgb, sdf, feats), vjp = jax.vjp(net, pts)
            eik = vjp(
                (jnp.zeros_like(rgb), jnp.ones_like(sdf), jnp.zeros_like(feats))
            )[0]
        else:
            rgb, sdf, feats = self.run_network(
                planes, normalize_points(pts, near, far), viewdirs
            )
            eik = None

        rgb_map, feat_map, xyz, mask_depth = volume_integration(
            rgb=rgb,
            sdf=sdf,
            features=feats,
            z_vals=z_vals,
            rays_d=rays_d,
            pts=pts,
            with_sdf=self.cfg.with_sdf,
            sigmoid_beta=self.sigmoid_beta,
        )
        return rgb_map, feat_map, sdf, mask_depth, xyz, eik
