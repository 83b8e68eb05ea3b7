"""Software triangle rasterizer (z-buffer, Gouraud vertex colors), pure JAX.

Replaces the reference's pytorch3d mesh renderer for the two places it is
load-bearing:
  - geometry-aware noise projection: render a marching-cubes mesh whose
    vertex colors are fixed noise, from the current camera, and splat it as
    decoder noise (exp/cips3d/models/model_v3.py:344-415);
  - depth-surface videos: rasterize the Delaunay mesh of the xyz map with
    lambertian shading (exp/stylesdf/utils.py:246-354).

TPU-first design: a `lax.scan` over fixed-size face chunks carries a
(z-buffer, color, hit) state; each chunk evaluates edge functions for all
faces x all pixels as one dense batch (VPU-friendly), then min-reduces into
the buffer. Static shapes throughout; the camera model inverts
core/rays.get_rays_in_world exactly (pixel centres, y down, -z forward).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def project_vertices(verts, c2w, focal, img_size: int):
    """World -> screen. verts (V,3); c2w (3,4) camera-to-world; focal scalar.

    Returns (u, v, z): pixel-centre coordinates (u right, v down, origin at
    the image corner, matching get_rays_in_world's `linspace(0.5, S-0.5)`
    grid) and positive view depth z."""
    r = c2w[:3, :3]
    t = c2w[:3, 3]
    pc = (verts - t) @ r  # pc_j = sum_i (p-t)_i R[i,j] = R^T (p - t)
    z = -pc[:, 2]
    zs = jnp.maximum(z, 1e-8)
    u = img_size * 0.5 + focal * pc[:, 0] / zs
    v = img_size * 0.5 - focal * pc[:, 1] / zs
    return u, v, z


def _edge(ax, ay, bx, by, px, py):
    """Signed doubled area of (a, b, p); (..., P) broadcast."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


@functools.partial(jax.jit, static_argnames=("img_size", "face_chunk"))
def rasterize_mesh(
    verts,  # (V, 3) world-space float32
    faces,  # (F, 3) int32
    vert_colors,  # (V, C)
    c2w,  # (3, 4)
    focal,  # scalar
    img_size: int,
    face_chunk: int = 128,
):
    """Render vertex-colored triangles with a z-buffer.

    Returns (color (S,S,C), depth (S,S), hit (S,S) bool). Faces must be a
    multiple-padded static shape; pad with degenerate (0,0,0) faces.
    Linear (non-perspective-correct) attribute interpolation — both users
    are visualization/noise, and triangles are tiny on screen."""
    s = img_size
    u, v, z = project_vertices(verts, c2w, focal, s)

    f = faces.shape[0]
    pad = (-f) % face_chunk
    faces = jnp.pad(faces, ((0, pad), (0, 0)))
    n_chunks = faces.shape[0] // face_chunk

    px = jnp.broadcast_to(jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5, (s, s)).reshape(-1)
    py = jnp.broadcast_to(jnp.arange(s, dtype=jnp.float32)[:, None] + 0.5, (s, s)).reshape(-1)

    c = vert_colors.shape[-1]
    init = (
        jnp.full((s * s,), jnp.inf, jnp.float32),  # zbuf
        jnp.zeros((s * s, c), jnp.float32),  # color
        jnp.zeros((s * s,), bool),  # hit
    )

    def body(carry, fidx):
        zbuf, color, hit = carry
        tri = faces[fidx]  # (Fc, 3)
        au, av, az = u[tri[:, 0]], v[tri[:, 0]], z[tri[:, 0]]
        bu, bv, bz = u[tri[:, 1]], v[tri[:, 1]], z[tri[:, 1]]
        cu, cv, cz = u[tri[:, 2]], v[tri[:, 2]], z[tri[:, 2]]
        area = _edge(au, av, bu, bv, cu, cv)  # (Fc,)
        valid = (jnp.abs(area) > 1e-9) & (az > 0) & (bz > 0) & (cz > 0)
        inv_area = jnp.where(valid, 1.0 / jnp.where(valid, area, 1.0), 0.0)

        # barycentrics for all pixels: (Fc, P)
        wa = _edge(bu[:, None], bv[:, None], cu[:, None], cv[:, None], px, py) * inv_area[:, None]
        wb = _edge(cu[:, None], cv[:, None], au[:, None], av[:, None], px, py) * inv_area[:, None]
        wc = 1.0 - wa - wb
        # small epsilon so shared-edge pixels aren't dropped by FP jitter
        # (overlaps resolve in the z-test)
        eps = 1e-5
        inside = (wa >= -eps) & (wb >= -eps) & (wc >= -eps) & valid[:, None]

        depth = wa * az[:, None] + wb * bz[:, None] + wc * cz[:, None]
        depth = jnp.where(inside, depth, jnp.inf)  # (Fc, P)

        kmin = jnp.argmin(depth, axis=0)  # (P,)
        parange = jnp.arange(depth.shape[1])
        dmin = depth[kmin, parange]
        closer = dmin < zbuf

        ca = vert_colors[tri[:, 0]][kmin]  # (P, C)
        cb = vert_colors[tri[:, 1]][kmin]
        cc = vert_colors[tri[:, 2]][kmin]
        wam, wbm, wcm = (
            wa[kmin, parange][:, None],
            wb[kmin, parange][:, None],
            wc[kmin, parange][:, None],
        )
        col = wam * ca + wbm * cb + wcm * cc

        zbuf = jnp.where(closer, dmin, zbuf)
        color = jnp.where(closer[:, None], col, color)
        hit = hit | closer
        return (zbuf, color, hit), None

    (zbuf, color, hit), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks * face_chunk).reshape(n_chunks, face_chunk)
    )
    return (
        color.reshape(s, s, c),
        jnp.where(hit, zbuf, 0.0).reshape(s, s),
        hit.reshape(s, s),
    )


# ------------------------------------------------------- noise projection --


def project_noise_map(
    verts: np.ndarray,
    faces: np.ndarray,
    vert_noise: np.ndarray,  # (V, 1)
    c2w,
    focal,
    img_size: int,
    base_noise=None,  # (S, S, 1) kept where the mesh is not visible
):
    """Geometry-aware noise (model_v3.py:387-415): render per-vertex noise
    from the camera; pixels the surface does not cover keep `base_noise`
    (the reference's prev_noise semantics)."""
    color, _, hit = rasterize_mesh(
        jnp.asarray(verts, jnp.float32),
        jnp.asarray(faces, jnp.int32),
        jnp.asarray(vert_noise, jnp.float32),
        jnp.asarray(c2w, jnp.float32),
        jnp.asarray(focal, jnp.float32),
        img_size,
    )
    if base_noise is None:
        base_noise = jnp.zeros_like(color)
    return jnp.where(hit[..., None], color, base_noise)


def shaded_mesh_image(
    verts: np.ndarray,
    faces: np.ndarray,
    c2w,
    focal,
    img_size: int,
    light=(0.0, 0.0, 5.0),
):
    """Lambertian vertex-shaded mesh render in [-1, 1] (the reference's
    create_depth_mesh_renderer look, stylesdf/utils.py:246-354): white
    ambient-free diffuse shading of the depth surface, black background."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    # per-vertex normals = area-weighted face-normal accumulation
    fv = verts[faces]  # (F, 3, 3)
    fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    vn = np.zeros_like(verts)
    np.add.at(vn, faces[:, 0], fn)
    np.add.at(vn, faces[:, 1], fn)
    np.add.at(vn, faces[:, 2], fn)
    vn /= np.linalg.norm(vn, axis=-1, keepdims=True) + 1e-8
    ldir = np.asarray(light, np.float32)
    ldir = ldir / np.linalg.norm(ldir)
    shade = np.abs(vn @ ldir)[:, None].astype(np.float32)  # (V, 1)
    color, depth, hit = rasterize_mesh(
        jnp.asarray(verts),
        jnp.asarray(faces),
        jnp.asarray(shade),
        jnp.asarray(c2w, jnp.float32),
        jnp.asarray(focal, jnp.float32),
        img_size,
    )
    img = jnp.where(hit[..., None], color * 2.0 - 1.0, -1.0)
    return np.asarray(jnp.repeat(img, 3, axis=-1)), np.asarray(depth)
