"""Volume feature renderer: SIREN MLP + SDF-sigma compositing.

Behavioural contract: exp/cips3d/volume_renderer.py:163-303 + 569-634
(VolumeFeatureRenderer). Differences by design:

- The eikonal term is a `jax.vjp` of the network wrt the points, computed
  inside the forward when requested — not a torch-autograd mutation
  (nerf_utils.py:220-228). The vjp is itself differentiable, so the eikonal
  loss trains the renderer exactly as the reference does.
- Ray chunking (`N_samples_forward`, volume_renderer.py:228-266) is replaced
  by an optional `lax.scan` over static ray tiles (`ray_chunk`): same memory
  effect, one compiled graph, no Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.rays import normalize_points
from ..core.integration import volume_integration
from .siren import SirenGenerator


class VolumeFeatureRenderer(nn.Module):
    depth: int = 8  # N_layers_renderer
    hidden_dim: int = 256
    input_dim: int = 3
    view_dim: int = 3
    with_sdf: bool = True
    # SIREN activation storage dtype; phase math stays fp32 (see FiLMSiren).
    dtype: str = "float32"
    # Rematerialise the SIREN trunk in backward: training residuals at the
    # flagship geometry are (B, 64^2, 24, 256) fp32 ≈ 400 MB per layer —
    # the g_step trace (docs/r5_logs/trace_gstep.log) is copy/prefetch
    # dominated by exactly these tensors, while recomputing the depth-2
    # trunk costs ~0.1 ms of MXU time. jax.checkpoint is twice
    # differentiable, so the eikonal pts-vjp and R1/path grad-of-grads
    # still work.
    remat: bool = False

    def setup(self):
        self.sigmoid_beta = self.param(
            "sigmoid_beta", lambda k, s: 0.1 * jnp.ones(s, jnp.float32), (1,)
        )
        net_cls = nn.remat(SirenGenerator) if self.remat else SirenGenerator
        self.network = net_cls(
            depth=self.depth,
            width=self.hidden_dim,
            input_ch=self.input_dim,
            view_ch=self.view_dim,
        )

    def run_network(self, normalized_pts, viewdirs, styles):
        """concat(pts, broadcast viewdirs) -> SIREN (volume_renderer.py:285-303)."""
        dirs = jnp.broadcast_to(viewdirs[..., None, :], normalized_pts.shape)
        net_in = jnp.concatenate([normalized_pts, dirs], axis=-1)
        net_in = net_in.astype(jnp.dtype(self.dtype))
        rgb, sdf, feats = self.network(net_in, styles)
        # integration runs fp32 regardless of the MLP storage dtype
        f32 = jnp.float32
        return rgb.astype(f32), sdf.astype(f32), feats.astype(f32)

    def __call__(
        self,
        pts,  # (B, R, N, 3) world-space sample points
        rays_d,  # (B, R, 3)
        viewdirs,  # (B, R, 3)
        z_vals,  # (B, R, N)
        near,  # (B, 1, 1)
        far,  # (B, 1, 1)
        styles,  # (B, depth+1, style_dim)
        return_eikonal: bool = False,
        ray_chunk: int | None = None,
        fused: bool = False,
    ):
        """Returns (thumb_rgb (B,R,3), feature_map (B,R,C), sdf (B,R,N,1),
        mask_depth (B,R,2), xyz (B,R,3), eikonal (B,R,N,3) | None).

        fused=True routes through the Pallas SIREN+integration kernel
        (kernels/siren_render.py) — depth-2 flagship geometry, applied per
        batch item via vmap; grad-safe (custom_vjp with exact XLA backward).
        With return_eikonal, the eikonal term is a standalone trunk vjp."""
        if (
            fused
            and self.depth == 2
            and self.with_sdf
            and jax.default_backend() == "tpu"  # Pallas TPU kernel only
        ):
            # siren_render is the custom_vjp wrapper: Pallas forward, exact
            # XLA backward — so fused=True is safe under jax.grad too
            # (inversion, non-eikonal G passes), not just inference.
            from ..kernels.siren_render import siren_render

            rp = self.variables["params"]
            near_s = near.reshape(-1)[0]
            far_s = far.reshape(-1)[0]

            def one(styles_i, pts_i, viewdirs_i, z_vals_i, rays_d_i):
                return siren_render(
                    rp, styles_i, pts_i, viewdirs_i, z_vals_i, rays_d_i,
                    near_s, far_s,
                )

            thumb, feat, sdf, maskd, xyz = jax.vmap(one)(
                styles, pts, viewdirs, z_vals, rays_d
            )
            eik = None
            if return_eikonal:
                # The kernel itself is eikonal-free; d(sdf)/d(pts) is a
                # standalone XLA vjp of the trunk over the same points —
                # differentiable again, so the eikonal loss trains exactly
                # as on the non-fused path. Costs one extra trunk forward,
                # but the fused render acts as free remat for the main
                # branch (the custom_vjp backward recomputes its own
                # residuals), so peak HBM still drops.
                def net(p):
                    npts = normalize_points(p, near, far)
                    return self.run_network(npts, viewdirs, styles)

                (rgb_e, sdf_e, feat_e), vjp = jax.vjp(net, pts)
                eik = vjp(
                    (
                        jnp.zeros_like(rgb_e),
                        jnp.ones_like(sdf_e),
                        jnp.zeros_like(feat_e),
                    )
                )[0]
            return thumb, feat, sdf, maskd, xyz, eik

        def render_tile(pts_t, rays_d_t, viewdirs_t, z_vals_t):
            if return_eikonal:
                # d(sdf)/d(pts) through normalisation + MLP, differentiable
                # again for the eikonal loss gradient.
                def net(p):
                    npts = normalize_points(p, near, far)
                    return self.run_network(npts, viewdirs_t, styles)

                (rgb, sdf, feats), vjp = jax.vjp(net, pts_t)
                eik = vjp(
                    (jnp.zeros_like(rgb), jnp.ones_like(sdf), jnp.zeros_like(feats))
                )[0]
            else:
                npts = normalize_points(pts_t, near, far)
                rgb, sdf, feats = self.run_network(npts, viewdirs_t, styles)
                eik = None

            rgb_map, feat_map, xyz, mask_depth = volume_integration(
                rgb=rgb,
                sdf=sdf,
                features=feats,
                z_vals=z_vals_t,
                rays_d=rays_d_t,
                pts=pts_t,
                with_sdf=self.with_sdf,
                sigmoid_beta=self.sigmoid_beta,
            )
            return rgb_map, feat_map, sdf, mask_depth, xyz, eik

        b, r, n, _ = pts.shape
        if ray_chunk is None or ray_chunk >= r:
            return render_tile(pts, rays_d, viewdirs, z_vals)

        # Static-shape scan over ray tiles: bounds HBM live-set like the
        # reference's chunk loops without retracing per chunk.
        assert r % ray_chunk == 0, (r, ray_chunk)
        tiles = r // ray_chunk

        def body(_, args):
            return None, render_tile(*args)

        xs = (
            pts.reshape(b, tiles, ray_chunk, n, 3).swapaxes(0, 1),
            rays_d.reshape(b, tiles, ray_chunk, 3).swapaxes(0, 1),
            viewdirs.reshape(b, tiles, ray_chunk, 3).swapaxes(0, 1),
            z_vals.reshape(b, tiles, ray_chunk, n).swapaxes(0, 1),
        )
        _, outs = jax.lax.scan(body, None, xs)

        def merge(y):
            if y is None:
                return None
            # (tiles, B, chunk, ...) -> (B, tiles*chunk, ...)
            y = y.swapaxes(0, 1)
            return y.reshape(b, r, *y.shape[3:])

        return tuple(merge(y) for y in outs)

    def mlp_init_pass(self, pts, viewdirs, near, far, styles):
        """Sphere-init targets: sdf vs |pts| - (far-near)/4
        (volume_renderer.py:569-634). Caller supplies stratified samples."""
        npts = normalize_points(pts, near, far)
        _, sdf, _ = self.run_network(npts, viewdirs, styles)
        sdf = sdf[..., 0]
        span = (far - near).reshape((-1,) + (1,) * (sdf.ndim - 1))
        target = jnp.linalg.norm(jax.lax.stop_gradient(pts), axis=-1) - span / 4.0
        return sdf, target
