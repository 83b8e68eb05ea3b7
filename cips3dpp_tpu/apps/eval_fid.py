"""FID / KID evaluation.

Behavioural contract: exp/cips3d/scripts/eval_fid.py (torch-fidelity FID +
KID over 50k real / 50k generated), gen_images.py (rank-sharded random-camera
sampling) and setup_evaluation.py (real-set dump). TPU-first: generation is
one jitted batch-forward mapped over the device mesh (the reference shards by
rank and interleaves output filenames, gen_images.py:83); features stream
through InceptionV3 in device-sized batches; FID/KID are closed-form on host.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable

import numpy as np
import jax
import jax.numpy as jnp

from ..core.camera import sample_cameras
from ..models.inception import InceptionV3Features


# ---------------------------------------------------------------- metrics --


def _sym_eigvals(m):
    """Eigenvalues of a symmetric PSD matrix, robust to LAPACK dsyevd
    non-convergence on degenerate/badly-scaled spectra (seen with
    rank-deficient covariances at tiny sample counts): scale-normalise,
    then fall back to SVD (singular values == |eigenvalues| == eigenvalues
    for PSD input)."""
    m = (m + m.T) / 2
    scale = float(np.max(np.abs(m)))
    if not np.isfinite(scale):
        raise ValueError("non-finite covariance product in FID")
    if scale == 0.0:
        return np.zeros(len(m))
    try:
        return np.linalg.eigvalsh(m / scale) * scale
    except np.linalg.LinAlgError:
        return np.linalg.svd(m / scale, compute_uv=False) * scale


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """FID between two feature Gaussians (host numpy/scipy-free):
    |mu1-mu2|^2 + tr(S1 + S2 - 2 sqrtm(S1 S2)). The matrix sqrt uses an
    eigendecomposition of the symmetrised product."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    s1, s2 = np.asarray(sigma1, np.float64), np.asarray(sigma2, np.float64)
    diff = mu1 - mu2

    # sqrtm(s1 @ s2) via sqrtm(s1)^(1/2) trick with eigh for stability:
    # sqrtm(A B) has the same trace as sqrtm(sqrtm(A) B sqrtm(A)).
    va, ua = np.linalg.eigh(s1 + eps * np.eye(len(s1)))
    sq1 = ua @ np.diag(np.sqrt(np.maximum(va, 0))) @ ua.T
    inner = sq1 @ (s2 + eps * np.eye(len(s2))) @ sq1
    vi = _sym_eigvals(inner)
    tr_covmean = np.sum(np.sqrt(np.maximum(vi, 0)))

    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * tr_covmean)


def kid(features_a, features_b, n_subsets: int = 100, subset_size: int = 1000,
        seed: int = 0):
    """Kernel Inception Distance: polynomial-kernel MMD^2, torch-fidelity
    defaults (degree 3, gamma 1/dim, coef 1), averaged over subsets."""
    a = np.asarray(features_a, np.float64)
    b = np.asarray(features_b, np.float64)
    n = min(subset_size, len(a), len(b))
    d = a.shape[1]
    rng = np.random.RandomState(seed)

    def poly(x, y):
        return (x @ y.T / d + 1.0) ** 3

    vals = []
    for _ in range(n_subsets):
        xa = a[rng.choice(len(a), n, replace=False)]
        xb = b[rng.choice(len(b), n, replace=False)]
        kaa, kbb, kab = poly(xa, xa), poly(xb, xb), poly(xa, xb)
        # unbiased MMD^2
        sum_aa = (kaa.sum() - np.trace(kaa)) / (n * (n - 1))
        sum_bb = (kbb.sum() - np.trace(kbb)) / (n * (n - 1))
        sum_ab = kab.mean()
        vals.append(sum_aa + sum_bb - 2 * sum_ab)
    return float(np.mean(vals)), float(np.std(vals))


def feature_stats(features):
    f = np.asarray(features, np.float64)
    return f.mean(axis=0), np.cov(f, rowvar=False)


# ----------------------------------------------------------- feature pipe --


class InceptionExtractor:
    """fidelity_protocol=True (default) reproduces the reference pipeline
    end-to-end: images are quantised to uint8 exactly as save_image_dir
    writes them (the reference computes FID over saved image DIRS,
    eval_fid.py:52-63), then fed through the torch-fidelity input path
    (TF1 resize, (x-128)/128). False keeps raw [-1,1] floats."""

    def __init__(self, variables, batch_size: int = 32,
                 fidelity_protocol: bool = True):
        self.variables = variables
        self.batch_size = batch_size
        if fidelity_protocol:
            def fn(v, x):
                # same truncation as save_image_dir's .astype(np.uint8)
                u8 = jnp.floor((jnp.clip(x, -1.0, 1.0) + 1.0) * 127.5)
                return InceptionV3Features(fidelity_u8=True).apply(v, u8)
        else:
            def fn(v, x):
                return InceptionV3Features().apply(v, x)
        self._fn = jax.jit(fn)

    def __call__(self, images: Iterable[np.ndarray]) -> np.ndarray:
        """images: iterable of NHWC [-1,1] batches -> (N, 2048)."""
        feats = []
        for batch in images:
            feats.append(np.asarray(self._fn(self.variables, jnp.asarray(batch))))
        return np.concatenate(feats, axis=0)


# ------------------------------------------------------------- generation --


def generate_images(
    model,
    params,
    n_images: int,
    batch_size: int,
    key,
    img_size: int | None = None,
    to_host: bool = True,
    callback: Callable | None = None,
):
    """Random z + random camera batches (gen_images.py:33-92). Under a mesh,
    jit shards the batch across devices — the mesh replaces rank-sharded
    generation. Yields NHWC [-1,1] arrays."""
    cfg = model.cfg

    @jax.jit
    def gen(params, key):
        kz0, kz1, kc, kp, kn = jax.random.split(key, 5)
        zs = (
            jax.random.normal(kz0, (batch_size, cfg.mapping.z_dim)),
            jax.random.normal(kz1, (batch_size, cfg.mapping.z_dim)),
        )
        cam = sample_cameras(
            kc, batch_size, cfg.img_size,
            azim_range=cfg.azim_range, elev_range=cfg.elev_range,
            fov_ang=cfg.fov_ang, dist_radius=cfg.dist_radius,
            uniform=cfg.uniform_camera,
        )
        out = model.apply(
            params, zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
            near=cam.near, far=cam.far, rngs={"perturb": kp, "noise": kn},
        )
        return jnp.clip(out["rgb"], -1.0, 1.0)

    done = 0
    while done < n_images:
        key, sub = jax.random.split(key)
        imgs = gen(params, sub)
        take = min(batch_size, n_images - done)
        imgs = imgs[:take]
        done += take
        if callback:
            callback(done)
        yield np.asarray(imgs) if to_host else imgs


def save_image_dir(batches: Iterable[np.ndarray], outdir: str, start: int = 0,
                   fmt: str = "jpg"):
    """Dump [-1,1] batches as numbered images (setup_evaluation/gen_images
    file layout)."""
    import os
    from PIL import Image

    os.makedirs(outdir, exist_ok=True)
    idx = start
    for batch in batches:
        for img in batch:
            u8 = ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)
            Image.fromarray(u8).save(f"{outdir}/{idx}.{fmt}")
            idx += 1
    return idx


# ------------------------------------------------------------ entry point --


@dataclasses.dataclass
class FIDResult:
    fid: float
    kid_mean: float | None
    kid_std: float | None
    n_real: int
    n_fake: int


def eval_fid(
    model,
    params,
    real_batches: Iterable[np.ndarray],
    inception_variables,
    n_fake: int = 2048,
    batch_size: int = 16,
    key=None,
    with_kid: bool = False,
) -> FIDResult:
    """End-to-end FID (eval_fid.py:81-162): dump/stream reals, generate
    fakes on the mesh, Inception features, Frechet distance (+KID)."""
    key = jax.random.PRNGKey(0) if key is None else key
    extractor = InceptionExtractor(inception_variables, batch_size)

    real_feats = extractor(real_batches)
    fake_feats = extractor(
        generate_images(model, params, n_fake, batch_size, key)
    )

    mu_r, sig_r = feature_stats(real_feats)
    mu_f, sig_f = feature_stats(fake_feats)
    fid = frechet_distance(mu_f, sig_f, mu_r, sig_r)
    if with_kid:
        kid_mean, kid_std = kid(fake_feats, real_feats)
    else:
        kid_mean = kid_std = None
    return FIDResult(fid, kid_mean, kid_std, len(real_feats), len(fake_feats))
