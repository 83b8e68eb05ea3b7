"""CIPS3DPP_WEIGHTS_DIR hook + importer golden tests (no real weights).

The real VGG16/LPIPS/Inception weights cannot ship in this zero-egress
build, so these tests pin down everything that CAN be verified offline:
(1) the env-var discovery upgrades each loader the moment files appear,
(2) the VGG import transposes reproduce torch's own conv semantics on a
fixed input (torch CPU as the oracle), and (3) the inception import
round-trips a reference-shaped state dict exactly. When real weights mount,
parity is one command with zero code changes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")


def _synthetic_vgg_sd(seed=0):
    """Reference-shaped torchvision vgg16.features state dict."""
    from cips3dpp_tpu.models.vgg import _VGG16_PLAN

    rng = np.random.RandomState(seed)
    sd = {}
    in_ch = 3
    for idx, out_ch, _ in _VGG16_PLAN:
        sd[f"features.{idx}.weight"] = (
            rng.randn(out_ch, in_ch, 3, 3) / np.sqrt(in_ch * 9)
        ).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.randn(out_ch).astype(np.float32) * 0.1
        in_ch = out_ch
    return sd


def test_weights_dir_env_hook(tmp_path, monkeypatch):
    from cips3dpp_tpu.io.weights import load_vgg, load_lpips, load_inception

    # nothing mounted -> tagged random fallbacks
    monkeypatch.delenv("CIPS3DPP_WEIGHTS_DIR", raising=False)
    _, prov = load_vgg(jax.random.PRNGKey(0))
    assert prov == "random"
    _, prov = load_lpips(jax.random.PRNGKey(0))
    assert prov == "random"

    # mount a synthetic torchvision VGG16 -> the loader upgrades silently
    sd = {k: torch.from_numpy(v) for k, v in _synthetic_vgg_sd().items()}
    torch.save(sd, tmp_path / "vgg16-397923af.pth")
    monkeypatch.setenv("CIPS3DPP_WEIGHTS_DIR", str(tmp_path))
    vgg_vars, prov = load_vgg()
    assert prov == "imported"
    assert vgg_vars["params"]["conv_0"]["kernel"].shape == (3, 3, 3, 64)

    # LPIPS needs trunk AND lin weights: trunk alone stays random
    _, prov = load_lpips(jax.random.PRNGKey(0))
    assert prov == "random"
    from cips3dpp_tpu.utils.lpips import LPIPS_TAPS, LPIPS_CHANNELS

    lin_sd = {
        f"lin{k}.model.1.weight": torch.rand(1, LPIPS_CHANNELS[i], 1, 1)
        for k, i in enumerate(LPIPS_TAPS)
    }
    torch.save(lin_sd, tmp_path / "lpips_vgg.pth")
    lp_vars, prov = load_lpips()
    assert prov == "imported"

    # Inception still random (no file)
    _, prov = load_inception(jax.random.PRNGKey(0))
    assert prov == "random"


def test_vgg_import_matches_torch_forward():
    """Golden importer test: imported flax VGG features == torch's own
    conv/pool pipeline on a fixed input (import-transpose regression guard,
    reference metric: vgg_per_loss.py:202-340)."""
    from cips3dpp_tpu.models.vgg import (
        _VGG16_PLAN,
        VGG16Features,
        import_torchvision_vgg16,
        IMAGENET_MEAN,
        IMAGENET_STD,
        TAP_LAYERS,
    )

    sd_np = _synthetic_vgg_sd(seed=3)
    variables = import_torchvision_vgg16(sd_np)

    rng = np.random.RandomState(7)
    x = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    flax_feats = VGG16Features().apply(variables, jnp.asarray(x))

    # torch oracle: same plan, NCHW
    t = torch.from_numpy(
        np.ascontiguousarray(((x + 1) / 2).transpose(0, 3, 1, 2))
    ).float()
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1).float()
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1).float()
    t = (t - mean) / std
    torch_feats = {}
    with torch.no_grad():
        for idx, _, pool_before in _VGG16_PLAN:
            if pool_before:
                t = torch.nn.functional.max_pool2d(t, 2, 2)
            t = torch.nn.functional.conv2d(
                t,
                torch.from_numpy(sd_np[f"features.{idx}.weight"]),
                torch.from_numpy(sd_np[f"features.{idx}.bias"]),
                padding=1,
            )
            if idx in TAP_LAYERS:
                torch_feats[idx] = t.numpy().transpose(0, 2, 3, 1)
            t = torch.relu(t)

    for idx in TAP_LAYERS:
        np.testing.assert_allclose(
            np.asarray(flax_feats[idx]),
            torch_feats[idx],
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"tap {idx}",
        )


def test_inception_import_roundtrip():
    """Reference-shaped pt-inception state dict -> import -> identical
    variables and identical features (import-transpose regression guard)."""
    from cips3dpp_tpu.models.inception import (
        InceptionV3Features,
        init_inception,
        import_torch_inception,
    )

    variables = init_inception(jax.random.PRNGKey(0))

    # emit the torch-named state dict from the flax tree (inverse of walk)
    sd = {}

    def emit(prefix, node_p, node_b):
        if "conv" in node_p:
            w = np.asarray(node_p["conv"]["kernel"])
            sd[f"{prefix}.conv.weight"] = np.transpose(w, (3, 2, 0, 1))
            sd[f"{prefix}.bn.weight"] = np.asarray(node_p["bn"]["scale"])
            sd[f"{prefix}.bn.bias"] = np.asarray(node_p["bn"]["bias"])
            sd[f"{prefix}.bn.running_mean"] = np.asarray(node_b["bn"]["mean"])
            sd[f"{prefix}.bn.running_var"] = np.asarray(node_b["bn"]["var"])
            return
        for k in node_p:
            emit(f"{prefix}.{k}" if prefix else k, node_p[k], node_b[k])

    emit("", variables["params"], variables["batch_stats"])
    imported = import_torch_inception(sd)

    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(imported)
    )
    assert len(flat_a) == len(flat_b)
    for p, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_b[jax.tree_util.keystr(p)]),
            err_msg=jax.tree_util.keystr(p),
        )

    x = jnp.asarray(
        np.random.RandomState(5).uniform(-1, 1, (1, 64, 64, 3)), jnp.float32
    )
    fa = InceptionV3Features().apply(variables, x)
    fb = InceptionV3Features().apply(imported, x)
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
