"""LPIPS perceptual metric (VGG backbone), pure JAX.

Behavioural contract: the reference reports PSNR/SSIM/LPIPS after every
inversion run (exp/cips3d/models/projector_v10.py:1266-1275) through the
`lpips` pip package. That metric = VGG16 relu{1_2,2_2,3_3,4_3,5_3} features,
channel-unit-normalised, squared difference, a learned non-negative 1x1
"lin" weighting per layer, spatial mean, summed over layers (Zhang et al.
2018).

Zero-egress build: no weights are bundled. For exact parity import
  - the torchvision `vgg16-397923af.pth` trunk (shared with models/vgg.py),
  - the lpips package's `vgg.pth` lin weights (keys `lin{k}.model.1.weight`).
Without them `init_lpips` gives a random trunk + uniform lin weights and the
result dict should be tagged `weights: random` by callers.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax
import jax.numpy as jnp

from ..models.vgg import VGG16Features, import_torchvision_vgg16

LPIPS_TAPS = (2, 7, 14, 21, 28)  # torchvision features idx of the tapped convs
LPIPS_CHANNELS = {2: 64, 7: 128, 14: 256, 21: 512, 28: 512}


def _unit_normalize(x, eps: float = 1e-10):
    """normalize_tensor: unit L2 norm over the channel axis (NHWC)."""
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)


def lpips(variables, a, b) -> jnp.ndarray:
    """Mean LPIPS distance over an NHWC batch; inputs in [-1, 1].

    variables = {"vgg": <VGG16Features variables>,
                 "lin": {idx: (C,) non-negative weights}}.
    """
    net = VGG16Features(taps=LPIPS_TAPS, post_relu=True)
    fa = net.apply(variables["vgg"], a)
    fb = net.apply(variables["vgg"], b)
    total = 0.0
    for idx in LPIPS_TAPS:
        d = jnp.square(_unit_normalize(fa[idx]) - _unit_normalize(fb[idx]))
        w = variables["lin"][str(idx)]
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total.mean()


def init_lpips(key, img_size: int = 256):
    """Random-trunk fallback (tag results `weights: random`): uniform lin
    weights make it a channel-normalised squared feature distance."""
    vgg = VGG16Features(taps=LPIPS_TAPS, post_relu=True).init(
        key, jnp.zeros((1, img_size, img_size, 3))
    )
    lin = {
        str(i): jnp.full((c,), 1.0 / c, jnp.float32)
        for i, c in LPIPS_CHANNELS.items()
    }
    return {"vgg": vgg, "lin": lin}


def import_lpips_torch(
    vgg_state_dict: Mapping[str, np.ndarray],
    lpips_state_dict: Mapping[str, np.ndarray],
):
    """Build LPIPS variables from the torchvision vgg16 state dict and the
    lpips package's `vgg.pth` lin-layer state dict."""
    vgg = import_torchvision_vgg16(vgg_state_dict)
    lin = {}
    for k, idx in enumerate(LPIPS_TAPS):
        w = np.asarray(lpips_state_dict[f"lin{k}.model.1.weight"])  # (1,C,1,1)
        lin[str(idx)] = jnp.asarray(w.reshape(-1))
    return {"vgg": vgg, "lin": lin}
