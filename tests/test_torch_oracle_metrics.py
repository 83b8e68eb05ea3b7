"""Torch-oracle parity for the metric networks: VGG16 perceptual trunk,
LPIPS, and pt-inception (FID).

Same pattern as tests/test_ref_oracle.py, but torchvision / lpips /
torch-fidelity are not installed here, so the oracles are RAW-torch
forwards (F.conv2d / F.max_pool2d / F.avg_pool2d / BatchNorm eval-mode)
that reproduce those packages' published architectures from the SAME
synthetic state dicts the flax importers consume. This pins the
conv/pad/pool/batchnorm/normalisation conventions — the class of silent
divergence the round-4 D oracle caught (antialiased vs torch-bilinear
fade downsample).

Behavioural contracts:
- VGG16ConvLoss: exp/cips3d/models/vgg_per_loss.py:202-340 (pre-activation
  taps features_{2,7,14,21,28}, imagenet normalisation of (x+1)/2).
- LPIPS: the `lpips` package's VGG variant as reported by the projector
  (exp/cips3d/models/projector_v10.py:1266-1275): ScalingLayer
  (shift = mean*2-1, scale = std*2), post-relu taps, channel unit-norm,
  per-layer lin weights, spatial mean, layer sum.
- FID: torch-fidelity pt-inception (exp/cips3d/scripts/eval_fid.py:52-63):
  uint8 input, TF1-style bilinear resize to 299 (src = dst*in/out, no
  half-pixel offset, no antialias), (x-128)/128, FID-variant InceptionV3
  (count_include_pad=False avg pools, Mixed_7c max-pool branch), global
  average pool -> 2048.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cips3dpp_tpu.models.vgg import (  # noqa: E402
    _VGG16_PLAN,
    LOSS_W_1024,
    TAP_LAYERS,
    VGG16Features,
    import_torchvision_vgg16,
    perceptual_distance,
)
from cips3dpp_tpu.models.inception import (  # noqa: E402
    InceptionV3Features,
    import_torch_inception,
)
from cips3dpp_tpu.utils.lpips import LPIPS_TAPS, lpips  # noqa: E402


def assert_close(a, b, tol=1e-3, what=""):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-6)
    diff = np.abs(a - b).max()
    assert diff <= tol * scale, f"{what}: max|d|={diff:.3e} scale={scale:.3e}"


# ------------------------------------------------------------------ VGG16 --


def synth_vgg_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    cin = 3
    for idx, ch, _ in _VGG16_PLAN:
        sd[f"features.{idx}.weight"] = rng.normal(
            0, 1.0 / np.sqrt(9 * cin), (ch, cin, 3, 3)
        ).astype(np.float32)
        sd[f"features.{idx}.bias"] = (0.05 * rng.normal(size=ch)).astype(
            np.float32
        )
        cin = ch
    return sd


def torch_vgg16_taps(sd, x_nchw, post_relu=False):
    """Raw-torch torchvision-vgg16 `features` trunk; x in [-1, 1]."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = ((x_nchw + 1.0) / 2.0 - mean) / std
    feats = {}
    for idx, _, pool_before in _VGG16_PLAN:
        if pool_before:
            x = F.max_pool2d(x, 2, 2)
        x = F.conv2d(
            x,
            torch.from_numpy(sd[f"features.{idx}.weight"]),
            torch.from_numpy(sd[f"features.{idx}.bias"]),
            padding=1,
        )
        if idx in TAP_LAYERS and not post_relu:
            feats[idx] = x
        x = F.relu(x)
        if idx in TAP_LAYERS and post_relu:
            feats[idx] = x
    return feats


def test_vgg16_conv_taps_match_torch():
    sd = synth_vgg_state_dict(0)
    variables = import_torchvision_vgg16(sd)
    x = np.random.RandomState(1).uniform(-1, 1, (2, 64, 64, 3)).astype(
        np.float32
    )

    with torch.no_grad():
        t_feats = torch_vgg16_taps(sd, torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))))
    j_feats = VGG16Features().apply(variables, jnp.asarray(x))

    for idx in TAP_LAYERS:
        t = np.transpose(t_feats[idx].numpy(), (0, 2, 3, 1))
        assert_close(np.asarray(j_feats[idx]), t, 1e-3, f"features_{idx}")


def test_vgg16_perceptual_distance_matches_torch():
    """The projector's loss: squared distance of the weighted flattened
    features (vgg_per_loss.py:300-334) — permutation-invariant, so the
    NHWC-vs-NCHW flatten order doesn't matter."""
    sd = synth_vgg_state_dict(2)
    variables = import_torchvision_vgg16(sd)
    rng = np.random.RandomState(3)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ta = torch_vgg16_taps(sd, torch.from_numpy(np.transpose(a, (0, 3, 1, 2))))
        tb = torch_vgg16_taps(sd, torch.from_numpy(np.transpose(b, (0, 3, 1, 2))))
        fa = torch.cat(
            [(ta[i] * LOSS_W_1024[i]).flatten(1) for i in sorted(ta)], dim=1
        )
        fb = torch.cat(
            [(tb[i] * LOSS_W_1024[i]).flatten(1) for i in sorted(tb)], dim=1
        )
        t_dist = float((fa - fb).pow(2).sum(dim=1).mean())

    j_dist = float(perceptual_distance(variables, jnp.asarray(a), jnp.asarray(b)))
    assert_close(j_dist, t_dist, 1e-3, "perceptual_distance")


# ------------------------------------------------------------------ LPIPS --


def torch_lpips(sd, lin, a, b):
    """The lpips package's VGG-variant formula in raw torch. Its
    ScalingLayer constants shift=(-.030,-.088,-.188), scale=(.458,.448,.450)
    equal imagenet mean*2-1 / std*2 — i.e. torch_vgg16_taps' normalisation
    of a [-1,1] input is exactly the ScalingLayer."""
    fa = torch_vgg16_taps(sd, a, post_relu=True)
    fb = torch_vgg16_taps(sd, b, post_relu=True)
    total = 0.0
    for k, idx in enumerate(LPIPS_TAPS):
        na = fa[idx] / torch.sqrt(
            (fa[idx] ** 2).sum(dim=1, keepdim=True) + 1e-10
        )
        nb = fb[idx] / torch.sqrt(
            (fb[idx] ** 2).sum(dim=1, keepdim=True) + 1e-10
        )
        d = (na - nb) ** 2
        w = torch.from_numpy(lin[f"lin{k}.model.1.weight"])  # (1,C,1,1)
        total = total + (d * w).sum(dim=1, keepdim=True).mean(dim=(2, 3))
    return float(total.mean())


def test_lpips_matches_torch():
    from cips3dpp_tpu.utils.lpips import LPIPS_CHANNELS, import_lpips_torch

    sd = synth_vgg_state_dict(4)
    rng = np.random.RandomState(5)
    lin_sd = {
        f"lin{k}.model.1.weight": np.abs(
            rng.normal(0, 0.1, (1, LPIPS_CHANNELS[idx], 1, 1))
        ).astype(np.float32)
        for k, idx in enumerate(LPIPS_TAPS)
    }
    variables = import_lpips_torch(sd, lin_sd)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = (a + 0.1 * rng.normal(size=a.shape)).clip(-1, 1).astype(np.float32)

    with torch.no_grad():
        t = torch_lpips(
            sd,
            lin_sd,
            torch.from_numpy(np.transpose(a, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(b, (0, 3, 1, 2))),
        )
    j = float(lpips(variables, jnp.asarray(a), jnp.asarray(b)))
    assert_close(j, t, 1e-3, "lpips")


# ------------------------------------------------------------ pt-inception --


class TBasicConv(torch.nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = torch.nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg3(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TInceptionA(torch.nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat(
            [self.branch1x1(x), b5, bd, self.branch_pool(_avg3(x))], 1
        )


class TInceptionB(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat(
            [self.branch3x3(x), bd, F.max_pool2d(x, 3, stride=2)], 1
        )


class TInceptionC(torch.nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasicConv(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
        return torch.cat(
            [self.branch1x1(x), b7, bd, self.branch_pool(_avg3(x))], 1
        )


class TInceptionD(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionE(torch.nn.Module):
    def __init__(self, cin, pool="avg"):
        super().__init__()
        self.pool = pool
        self.branch1x1 = TBasicConv(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "max":
            # FID variant: Mixed_7c pools with max (pytorch-fid
            # FIDInceptionE_2)
            pooled = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            pooled = _avg3(x)
        return torch.cat(
            [self.branch1x1(x), b3, bd, self.branch_pool(pooled)], 1
        )


class TPTInception(torch.nn.Module):
    """torch-fidelity / pytorch-fid FID-variant InceptionV3 trunk."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, pool="avg")
        self.Mixed_7c = TInceptionE(2048, pool="max")

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


def torch_tf1_resize(x, out_h, out_w):
    """torch-fidelity interpolate_bilinear_2d_like_tensorflow1x
    (align_corners=False): src = dst * in/out, floor/ceil clamp lerp —
    no half-pixel offset, no antialias."""
    def mat(in_s, out_s):
        src = torch.arange(out_s, dtype=torch.float64) * (in_s / out_s)
        lo = src.floor().long()
        hi = torch.clamp(lo + 1, max=in_s - 1)
        t = (src - lo.double()).float()
        m = torch.zeros(out_s, in_s)
        m[torch.arange(out_s), lo] += 1 - t
        m[torch.arange(out_s), hi] += t
        return m

    mh = mat(x.shape[2], out_h)
    mw = mat(x.shape[3], out_w)
    y = torch.einsum("oh,bchw->bcow", mh, x)  # (b, c, out_h, in_w)
    return torch.einsum("pw,bcow->bcop", mw, y)  # (b, c, out_h, out_w)


def synth_inception_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    net = TPTInception()
    sd = {}
    for k, v in net.state_dict().items():
        shape = tuple(v.shape)
        if k.endswith("running_var"):
            a = 0.5 + rng.uniform(0, 1, shape)
        elif k.endswith("bn.weight"):
            a = 1.0 + 0.1 * rng.normal(size=shape)
        elif k.endswith("num_batches_tracked"):
            a = np.zeros(shape, np.int64)
        else:
            a = 0.1 * rng.normal(size=shape)
        sd[k] = np.asarray(a, v.numpy().dtype if v.dtype != torch.int64
                           else np.int64)
    return sd


@pytest.mark.slow
@pytest.mark.parametrize("in_size", [96, 342])
def test_pt_inception_matches_torch(in_size):
    """96 = TF1 upsample path; 342 = downsample (where jax.image.resize's
    antialiasing would diverge — the round-4 D-oracle bug class)."""
    sd = synth_inception_state_dict(0)
    variables = import_torch_inception(sd)

    net = TPTInception()
    net.load_state_dict({k: torch.from_numpy(np.asarray(v))
                         for k, v in sd.items()})
    net.eval()

    u8 = np.random.RandomState(1).randint(
        0, 256, (2, in_size, in_size, 3)
    ).astype(np.float32)

    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(u8, (0, 3, 1, 2)))
        tx = torch_tf1_resize(tx, 299, 299)
        tx = (tx - 128.0) / 128.0
        t_feat = net(tx).numpy()

    j_feat = np.asarray(
        InceptionV3Features(fidelity_u8=True).apply(variables, jnp.asarray(u8))
    )
    assert_close(j_feat, t_feat, 2e-3, f"pool3 features in={in_size}")
