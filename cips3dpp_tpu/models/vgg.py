"""VGG16 perceptual feature extractor for GAN inversion.

Behavioural contract: exp/cips3d/models/vgg_per_loss.py:200-340
(VGG16ConvLoss, model_name='vgg16_conv'): imagenet-normalised input, features
tapped at the *pre-activation* conv outputs features_{2,7,14,21,28}
(conv1_2, conv2_2, conv3_3, conv4_3, conv5_3), each flattened and scaled by a
per-layer weight (the 'vgg16_conv_1024' table), concatenated; the projector
takes the squared distance of these vectors.

Pretrained weights are NOT bundled (zero-egress build): load the standard
torchvision `vgg16-397923af.pth` via `import_torchvision_vgg16` for exact
parity. Without weights, `init` yields a random-VGG perceptual metric —
the reference's own 'vgg16_conv_random' mode.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax
import flax.linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# torchvision vgg16.features conv indices and channel plan
_VGG16_PLAN = [
    # (features idx, out_channels, maxpool before)
    (0, 64, False), (2, 64, False),
    (5, 128, True), (7, 128, False),
    (10, 256, True), (12, 256, False), (14, 256, False),
    (17, 512, True), (19, 512, False), (21, 512, False),
    (24, 512, True), (26, 512, False), (28, 512, False),
]

# per-layer loss weights, 'vgg16_conv_1024' (vgg_per_loss.py:258-266)
LOSS_W_1024 = {2: 0.0002, 7: 0.0001, 14: 0.0001, 21: 0.0002, 28: 0.0005}
LOSS_W_256 = {2: 0.001, 7: 0.0006, 14: 0.0005, 21: 0.0005, 28: 0.001}

TAP_LAYERS = (2, 7, 14, 21, 28)


class VGG16Features(nn.Module):
    """Conv trunk; returns {features_idx: conv output}.

    post_relu=False taps the pre-activation conv output ('vgg16_conv'
    semantics, the projector's perceptual loss); post_relu=True taps after
    the ReLU (LPIPS reads relu{1_2,2_2,3_3,4_3,5_3}; see utils/lpips.py).
    Both share the same parameter tree, so one imported torchvision
    checkpoint serves both metrics.
    """

    taps: Sequence[int] = TAP_LAYERS
    post_relu: bool = False

    @nn.compact
    def __call__(self, x):
        """x: NHWC in [-1, 1]. The imagenet normalisation below is also
        exactly LPIPS's ScalingLayer: mean*2-1 = (-.030,-.088,-.188),
        std*2 = (.458,.448,.450)."""
        x = (x + 1.0) / 2.0
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std

        feats = {}
        for idx, ch, pool_before in _VGG16_PLAN:
            if pool_before:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv_{idx}")(x)
            if idx in self.taps and not self.post_relu:
                feats[idx] = x  # pre-activation tap ('vgg16_conv' semantics)
            x = nn.relu(x)
            if idx in self.taps and self.post_relu:
                feats[idx] = x
        return feats


def perceptual_features(
    variables, x, loss_w: Mapping[int, float] | None = None, taps=TAP_LAYERS
):
    """Weighted flattened feature vector (vgg_per_loss.py:300-334)."""
    if loss_w is None:
        loss_w = LOSS_W_1024
    feats = VGG16Features(taps=taps).apply(variables, x)
    parts = [
        (feats[i] * loss_w[i]).reshape(x.shape[0], -1) for i in sorted(feats)
    ]
    return jnp.concatenate(parts, axis=1)


def perceptual_distance(variables, a, b, loss_w=None):
    """Squared feature distance (projector_v10.py:1170-1174)."""
    fa = perceptual_features(variables, a, loss_w)
    fb = perceptual_features(variables, b, loss_w)
    return jnp.sum(jnp.square(fa - fb), axis=1).mean()


def init_vgg(key, img_size: int = 256):
    """Random-weight init (reference 'vgg16_conv_random' mode)."""
    return VGG16Features().init(key, jnp.zeros((1, img_size, img_size, 3)))


def import_torchvision_vgg16(state_dict: Mapping[str, np.ndarray]):
    """torchvision vgg16 `features.{i}.weight/bias` -> flax variables."""
    params = {}
    for idx, _, _ in _VGG16_PLAN:
        w = np.asarray(state_dict[f"features.{idx}.weight"])  # (out,in,kh,kw)
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        params[f"conv_{idx}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    return {"params": params}
