"""InceptionV3 feature extractor for FID/KID (flax, NHWC).

The reference computes FID/KID with torch-fidelity's pt-inception
(eval_fid.py:52-63). This is that network's architecture — torchvision
InceptionV3 with the FID-variant tweaks (Mixed_7c uses max-pool in its pool
branch; TF-style (x*2-1) input scaling; 299^2 bilinear resize) — so the
standard `pt_inception-2015-12-05-6726825d.pth` weights can be imported via
`import_torch_inception` for numbers comparable to published FID. Without
weights (zero-egress build) a seeded random init still yields a valid
*relative* metric for tracking training progress.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class BasicConv(nn.Module):
    out: int
    kernel: tuple
    stride: tuple = (1, 1)
    padding: tuple | str = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.out, self.kernel, strides=self.stride, padding=pad,
            use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


def _tf1_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Interpolation matrix for TF1 ResizeBilinear (align_corners=False,
    half_pixel_centers=False) — torch-fidelity's
    interpolate_bilinear_2d_like_tensorflow1x: src = dst * in/out, clamped,
    NO half-pixel offset and NO antialiasing."""
    src = np.arange(out_size, dtype=np.float64) * (in_size / out_size)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    t = (src - lo).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] += 1.0 - t
    m[np.arange(out_size), hi] += t
    return m


def tf1_bilinear_resize(x, out_h: int, out_w: int):
    """TF1-style bilinear resize of NHWC x via two interpolation matmuls
    (MXU-friendly: a (out,in) dense matmul per axis beats a gather)."""
    mh = jnp.asarray(_tf1_resize_matrix(x.shape[1], out_h))
    mw = jnp.asarray(_tf1_resize_matrix(x.shape[2], out_w))
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, x)


def _avg_pool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


def _max_pool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=(2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # FID variant: Mixed_7c uses max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "max":
            pooled = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            pooled = _avg_pool3(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Returns the 2048-d pool3 feature used by FID.

    fidelity_u8=True reproduces torch-fidelity's exact input protocol
    (eval_fid.py:52-63 runs calculate_metrics over image DIRS, i.e. uint8
    pixels): x holds u8-valued floats in [0, 255]; TF1-bilinear resize to
    299^2 FIRST, then (x - 128) / 128. fidelity_u8=False keeps the [-1, 1]
    float API (resize only). Both use the TF1 resize — jax.image.resize
    antialiases on downsample, which torch-fidelity does not."""

    fidelity_u8: bool = False

    @nn.compact
    def __call__(self, x):
        x = tf1_bilinear_resize(x, 299, 299)
        if self.fidelity_u8:
            x = (x - 128.0) / 128.0
        x = BasicConv(32, (3, 3), stride=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool3s2(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


def init_inception(key):
    return InceptionV3Features().init(key, jnp.zeros((1, 64, 64, 3)))


def import_torch_inception(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Map `pt_inception-2015-12-05` torch names -> flax variables.

    torch: `<Block>.<branch>.conv.weight` (out,in,kh,kw), `.bn.{weight,bias,
    running_mean,running_var}`."""
    params: dict = {}
    batch_stats: dict = {}

    def walk(prefix_t, prefix_f):
        w = state_dict.get(f"{prefix_t}.conv.weight")
        if w is None:
            return False
        node_p = params
        node_b = batch_stats
        for part in prefix_f[:-1]:
            node_p = node_p.setdefault(part, {})
            node_b = node_b.setdefault(part, {})
        leaf = prefix_f[-1]
        node_p[leaf] = {
            "conv": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))},
            "bn": {
                "scale": jnp.asarray(state_dict[f"{prefix_t}.bn.weight"]),
                "bias": jnp.asarray(state_dict[f"{prefix_t}.bn.bias"]),
            },
        }
        node_b[leaf] = {
            "bn": {
                "mean": jnp.asarray(state_dict[f"{prefix_t}.bn.running_mean"]),
                "var": jnp.asarray(state_dict[f"{prefix_t}.bn.running_var"]),
            }
        }
        return True

    stems = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
             "Conv2d_3b_1x1", "Conv2d_4a_3x3"]
    for s in stems:
        walk(s, (s,))
    branches = [
        "branch1x1", "branch5x5_1", "branch5x5_2",
        "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
        "branch_pool", "branch3x3", "branch3x3_1", "branch3x3_2",
        "branch3x3_2a", "branch3x3_2b", "branch3x3dbl_3a", "branch3x3dbl_3b",
        "branch7x7_1", "branch7x7_2", "branch7x7_3",
        "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
        "branch7x7dbl_4", "branch7x7dbl_5",
        "branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4",
    ]
    mixes = ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
             "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
             "Mixed_7c"]
    for m in mixes:
        for br in branches:
            walk(f"{m}.{br}", (m, br))

    return {"params": params, "batch_stats": batch_stats}
