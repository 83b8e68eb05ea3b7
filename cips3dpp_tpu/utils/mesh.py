"""Shape extraction & mesh visualization utilities.

Behavioural contract: exp/stylesdf/utils.py:183-242 (align_volume,
extract_mesh_with_marching_cubes, xyz2mesh) and
exp/stylesdf/scripts/generate_shapes_and_images.py (marching-cubes .obj
export of the SDF). The reference leans on skimage + pytorch3d + trimesh;
here shape extraction is self-contained:

- SDF grid sampling runs as one jitted batch over the frozen renderer.
- Iso-surface extraction uses marching *tetrahedra* (table-free, same
  output class as marching cubes for visualization/export).
- The depth surface mesh is a regular-grid triangulation of the xyz map
  (the reference's Delaunay on a regular pixel grid reduces to the same
  two-triangles-per-quad connectivity).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------- SDF volume --


def sample_sdf_grid(
    model,
    params,
    style_render,
    resolution: int = 128,
    bounds: float = 0.24,
    chunk: int = 65536,
):
    """Evaluate the SDF on a cubic grid around the origin.

    bounds defaults to (far-near) = 0.24, the volume the camera sweep covers
    (generate_shapes_and_images.py samples a similar cube). Returns
    (res, res, res) numpy SDF."""
    lin = np.linspace(-bounds, bounds, resolution, dtype=np.float32)
    xs, ys, zs_ = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([xs, ys, zs_], axis=-1).reshape(-1, 3)

    near = jnp.full((1, 1, 1), 1.0 - 0.12)
    far = jnp.full((1, 1, 1), 1.0 + 0.12)

    @jax.jit
    def sdf_fn(params, p):
        def f(mdl):
            # (1, chunk, 1, 3) points, dummy viewdirs
            pj = p[None, :, None, :]
            from ..core.rays import normalize_points

            npts = normalize_points(pj, near, far)
            dirs = jnp.zeros_like(npts[..., :1, :])
            _, sdf, _ = mdl.renderer.run_network(
                npts, dirs[:, :, 0, :], style_render
            )
            return sdf[0, :, 0, 0]

        return model.apply(params, method=f)

    out = np.empty(len(pts), np.float32)
    for i in range(0, len(pts), chunk):
        block = jnp.asarray(pts[i : i + chunk])
        pad = 0
        if block.shape[0] < chunk:
            pad = chunk - block.shape[0]
            block = jnp.pad(block, ((0, pad), (0, 0)))
        vals = np.asarray(sdf_fn(params, block))
        out[i : i + chunk] = vals[: chunk - pad] if pad else vals
    return out.reshape(resolution, resolution, resolution), lin


# --------------------------------------------------- marching tetrahedra --

# Each grid cube splits into 6 tetrahedra (corner indices into the cube's 8
# vertices, consistent orientation).
_TETS = np.array(
    [
        [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
        [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
    ],
    np.int32,
)
# cube corner offsets (z fastest)
_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    np.int32,
)


def marching_tetrahedra(volume: np.ndarray, level: float = 0.0,
                        coords=None):
    """Iso-surface of a scalar grid via tetrahedral decomposition.

    Returns (verts (V,3) float32, faces (F,3) int32). Vectorised numpy —
    fine for the <=256^3 grids used for shape export."""
    res = volume.shape[0]
    if coords is None:
        coords = [np.arange(s, dtype=np.float32) for s in volume.shape]

    # cube corner values/positions for every cell
    idx = np.stack(
        np.meshgrid(*[np.arange(s - 1) for s in volume.shape], indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)  # (C, 3)
    corner_idx = idx[:, None, :] + _CORNERS[None, :, :]  # (C, 8, 3)
    vals = volume[
        corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]
    ]  # (C, 8)
    pos = np.stack(
        [coords[d][corner_idx[..., d]] for d in range(3)], axis=-1
    ).astype(np.float32)  # (C, 8, 3)

    verts_out = []
    faces_out = []
    n_verts = 0

    for tet in _TETS:
        tv = vals[:, tet]  # (C, 4)
        tp = pos[:, tet]  # (C, 4, 3)
        inside = tv < level  # (C, 4)
        code = (
            inside[:, 0] * 1 + inside[:, 1] * 2 + inside[:, 2] * 4 + inside[:, 3] * 8
        )

        def interp(sel, a, b):
            """zero-crossing on edge a-b for selected tets."""
            va, vb = tv[sel, a], tv[sel, b]
            t = (level - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
            return tp[sel, a] + t[:, None] * (tp[sel, b] - tp[sel, a])

        # single-corner cases (1 triangle); corner c inside (or outside)
        for corners, c in [((1,), 0), ((2,), 1), ((4,), 2), ((8,), 3)]:
            for cc in (corners[0], 15 - corners[0]):
                sel = np.nonzero(code == cc)[0]
                if len(sel) == 0:
                    continue
                others = [o for o in range(4) if o != c]
                v0 = interp(sel, c, others[0])
                v1 = interp(sel, c, others[1])
                v2 = interp(sel, c, others[2])
                tri = np.stack([v0, v1, v2], axis=1)  # (S, 3, 3)
                verts_out.append(tri.reshape(-1, 3))
                faces_out.append(
                    np.arange(len(sel) * 3, dtype=np.int32).reshape(-1, 3) + n_verts
                )
                n_verts += len(sel) * 3

        # two-corner cases (quad -> 2 triangles)
        for cc, (a, b) in [(3, (0, 1)), (5, (0, 2)), (9, (0, 3)),
                           (6, (1, 2)), (10, (1, 3)), (12, (2, 3))]:
            sel = np.nonzero(code == cc)[0]
            if len(sel) == 0:
                continue
            others = [o for o in range(4) if o not in (a, b)]
            v0 = interp(sel, a, others[0])
            v1 = interp(sel, a, others[1])
            v2 = interp(sel, b, others[1])
            v3 = interp(sel, b, others[0])
            quad = np.stack([v0, v1, v2, v0, v2, v3], axis=1)
            verts_out.append(quad.reshape(-1, 3))
            faces_out.append(
                np.arange(len(sel) * 6, dtype=np.int32).reshape(-1, 3) + n_verts
            )
            n_verts += len(sel) * 6

    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    verts = np.concatenate(verts_out)
    faces = np.concatenate(faces_out)
    # weld duplicate vertices to keep .obj small
    rounded = np.round(verts / 1e-5).astype(np.int64)
    uniq, inv = np.unique(rounded, axis=0, return_inverse=True)
    welded = np.zeros((len(uniq), 3), np.float32)
    welded[inv] = verts
    return welded, inv[faces].astype(np.int32)


def extract_shape(model, params, style_render, resolution=128, bounds=0.24,
                  level=0.0):
    """SDF grid -> mesh (the reference's extract_mesh_with_marching_cubes
    workflow, stylesdf/utils.py:207-224)."""
    vol, lin = sample_sdf_grid(model, params, style_render, resolution, bounds)
    return marching_tetrahedra(vol, level=level, coords=[lin, lin, lin])


def save_obj(verts: np.ndarray, faces: np.ndarray, path: str):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces + 1:  # obj is 1-indexed
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
    return path


def align_volume(volume: np.ndarray, near: float = 0.88, far: float = 1.12):
    """Warp an axis-aligned sampled volume into the camera frustum
    (stylesdf/utils.py:172-196): xy coordinates scale from far/near at the
    near plane to 1 at the far plane, trilinear resampling with border
    padding; out-of-frustum cells get a positive SDF so marching cubes
    ignores them."""
    import jax.scipy.ndimage as jndi

    h, w, d = volume.shape
    vol = jnp.asarray(volume)
    # normalized grid coords in [-1, 1]
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    zs = jnp.linspace(-1.0, 1.0, d)
    gy, gx, gz = jnp.meshgrid(ys, xs, zs, indexing="ij")
    coeff = jnp.linspace(far / near, 1.0, d).reshape(1, 1, d)
    sx = gx * coeff
    sy = gy * coeff
    oob = (jnp.abs(sx) > 1.0) | (jnp.abs(sy) > 1.0)
    # to index space, border clamp
    iy = jnp.clip((sy + 1.0) * (h - 1) / 2.0, 0, h - 1)
    ix = jnp.clip((sx + 1.0) * (w - 1) / 2.0, 0, w - 1)
    iz = jnp.broadcast_to((gz + 1.0) * (d - 1) / 2.0, iy.shape)
    out = jndi.map_coordinates(vol, [iy, ix, iz], order=1, mode="nearest")
    out = jnp.where(oob, 1.0, out)
    return np.asarray(out)


# ------------------------------------------------------------ depth mesh --


def xyz_to_mesh(xyz: np.ndarray, mask: np.ndarray | None = None):
    """Surface point-cloud image (H, W, 3) -> triangle mesh.

    The reference Delaunay-triangulates the pixel grid (stylesdf/utils.py:
    228-242); on a regular grid that is exactly two triangles per quad."""
    h, w, _ = xyz.shape
    verts = xyz.reshape(-1, 3).astype(np.float32)
    ii, jj = np.meshgrid(np.arange(h - 1), np.arange(w - 1), indexing="ij")
    tl = (ii * w + jj).ravel()
    tr = tl + 1
    bl = tl + w
    br = bl + 1
    faces = np.concatenate(
        [np.stack([tl, bl, tr], 1), np.stack([tr, bl, br], 1)]
    ).astype(np.int32)
    if mask is not None:
        keep_v = mask.reshape(-1) > 0.5
        keep_f = keep_v[faces].all(axis=1)
        faces = faces[keep_f]
    return verts, faces


def depth_to_normal_shading(xyz: np.ndarray, light=(0.0, 0.0, 5.0)):
    """Cheap CPU lambertian shading of the xyz map for depth videos
    (replaces the pytorch3d mesh renderer, stylesdf/utils.py:246-354 —
    visualization only)."""
    dx = np.gradient(xyz, axis=1)
    dy = np.gradient(xyz, axis=0)
    n = np.cross(dx, dy)
    n = n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-8)
    l = np.asarray(light, np.float32)
    ldir = l / np.linalg.norm(l)
    shade = np.clip((n @ ldir), 0, 1)
    return np.repeat(shade[..., None], 3, axis=-1) * 2.0 - 1.0
