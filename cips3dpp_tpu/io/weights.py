"""Real-weight discovery behind one env var: ``CIPS3DPP_WEIGHTS_DIR``.

The reference's metric stacks pull pretrained torch weights at import time
(VGG16 perceptual loss: exp/cips3d/models/vgg_per_loss.py:202-340 via timm;
FID inception: exp/cips3d/scripts/eval_fid.py:52-63 via torch_fidelity;
LPIPS: the lpips package). This build is zero-egress, so instead every
loader consults ``$CIPS3DPP_WEIGHTS_DIR``: the moment the standard published
files are mounted there, VGG16 / LPIPS / Inception silently upgrade from the
provenance-tagged random fallback to the real thing — no flags, no code
changes. Outputs stay provenance-tagged either way so random-weight smoke
numbers can never be mistaken for comparable metrics.

Expected filenames (the standard published artifacts):

  vgg16-397923af.pth                    torchvision VGG16 (perceptual + LPIPS trunk)
  lpips_vgg.pth  (or vgg.pth)           LPIPS v0.1 vgg lin weights
                                        (richzhang/PerceptualSimilarity)
  pt_inception-2015-12-05-6726825d.pth  torch-fidelity pt-inception (FID/KID)

Generator checkpoints (e.g. ``ffhq_r1024_inversion/G_ema.pth``) are passed
explicitly — see README "Using the released checkpoints".
"""

from __future__ import annotations

import os
import sys

WEIGHTS_DIR_ENV = "CIPS3DPP_WEIGHTS_DIR"

VGG16_FILENAMES = ("vgg16-397923af.pth", "vgg16.pth")
LPIPS_FILENAMES = ("lpips_vgg.pth", "vgg.pth")
INCEPTION_FILENAMES = (
    "pt_inception-2015-12-05-6726825d.pth",
    "pt_inception.pth",
)


def find_weight(filenames, explicit: str | None = None) -> str | None:
    """Resolve a weight file: explicit path wins, else the first of
    `filenames` that exists under $CIPS3DPP_WEIGHTS_DIR, else None."""
    if explicit:
        return explicit
    d = os.environ.get(WEIGHTS_DIR_ENV)
    if not d:
        return None
    for name in filenames:
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


def _note(msg: str):
    print(f"[weights] {msg}", file=sys.stderr)


def load_vgg(key=None, path: str | None = None):
    """(variables, provenance): torchvision VGG16 if available, else the
    random init (reference 'vgg16_conv_random' mode)."""
    import jax

    from ..models.vgg import init_vgg, import_torchvision_vgg16
    from .torch_import import load_torch_checkpoint

    p = find_weight(VGG16_FILENAMES, path)
    if p:
        _note(f"VGG16 perceptual trunk <- {p}")
        return import_torchvision_vgg16(load_torch_checkpoint(p)), "imported"
    _note(
        "no VGG16 weights (set $CIPS3DPP_WEIGHTS_DIR): random-VGG "
        "perceptual metric (reference 'vgg16_conv_random' mode)"
    )
    return init_vgg(key if key is not None else jax.random.PRNGKey(0)), "random"


def load_lpips(key=None, vgg_path: str | None = None, lin_path: str | None = None):
    """(variables, provenance): real LPIPS needs BOTH the VGG16 trunk and
    the lin weights; anything less falls back to the tagged random metric."""
    import jax

    from ..utils.lpips import init_lpips, import_lpips_torch
    from .torch_import import load_torch_checkpoint

    pv = find_weight(VGG16_FILENAMES, vgg_path)
    pl = find_weight(LPIPS_FILENAMES, lin_path)
    if pv and pl:
        _note(f"LPIPS <- trunk {pv} + lin {pl}")
        return (
            import_lpips_torch(
                load_torch_checkpoint(pv), load_torch_checkpoint(pl)
            ),
            "imported",
        )
    _note("no LPIPS weights (set $CIPS3DPP_WEIGHTS_DIR): random fallback")
    return (
        init_lpips(key if key is not None else jax.random.PRNGKey(0)),
        "random",
    )


def load_inception(key=None, path: str | None = None):
    """(variables, provenance): torch-fidelity pt-inception if available —
    the reference FID protocol (eval_fid.py:52-63) — else tagged random."""
    import jax

    from ..models.inception import init_inception, import_torch_inception
    from .torch_import import load_torch_checkpoint

    p = find_weight(INCEPTION_FILENAMES, path)
    if p:
        _note(f"Inception (FID) <- {p}")
        return import_torch_inception(load_torch_checkpoint(p)), "imported"
    _note(
        "no Inception weights (set $CIPS3DPP_WEIGHTS_DIR): FID/KID numbers "
        "are NOT comparable to published values"
    )
    return (
        init_inception(key if key is not None else jax.random.PRNGKey(0)),
        "random",
    )
