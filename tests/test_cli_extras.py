"""Extra CLI workflow tests: z-interpolation, render-inverted."""

import json
import os

import numpy as np
import jax
import pytest

from cips3dpp_tpu.apps.cli import main
from test_cli import TINY_OPTS


def test_cli_interpolate_z(tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("s: {G_cfg: {}}\n")
    rc = main([
        "interpolate-z", "--cfg", str(cfg), "--section", "s",
        "--opts", *TINY_OPTS,
        "--outdir", str(tmp_path / "out"), "--n-frames", "3",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(res["grid"]) and os.path.exists(res["video"])


@pytest.mark.slow
def test_cli_invert_and_render_inverted(tmp_path, capsys):
    """Full inversion workflow: invert an image (few steps) then render
    multi-view from the saved w (reference _render_multi_view_web)."""
    from PIL import Image

    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    img_path = tmp_path / "face.png"
    Image.fromarray(img).save(img_path)

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        """
inv:
  G_cfg: {}
  n_steps_pose: 2
  n_steps_app: 3
  n_steps_multiview: 0
  flip_w_decoder_every: 2
  w_avg_samples: 32
"""
    )
    rc = main([
        "invert", "--cfg", str(cfg), "--section", "inv",
        "--opts", *TINY_OPTS,
        "--image", str(img_path), "--outdir", str(tmp_path / "inv"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(report["psnr"])
    assert os.path.exists(tmp_path / "inv" / "w.pkl")
    assert os.path.exists(tmp_path / "inv" / "proj.png")

    rc = main([
        "render-inverted", "--cfg", str(cfg), "--section", "inv",
        "--opts", *TINY_OPTS,
        "--inversion", str(tmp_path / "inv" / "w.pkl"),
        "--outdir", str(tmp_path / "views"), "--n-frames", "2",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(res["grid"])


def test_cli_extract_shape(tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("s: {G_cfg: {}}\n")
    rc = main([
        "extract-shape", "--cfg", str(cfg), "--section", "s",
        "--opts", *TINY_OPTS,
        "--outdir", str(tmp_path / "shapes"), "--resolution", "16",
        "--n-shapes", "1", "--truncation", "1.0",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(res[0]["obj"])
    assert os.path.exists(res[0]["img"])


@pytest.mark.slow
def test_cli_sample_project_noise(tmp_path, capsys):
    """Geometry-aware noise projection through the sampling CLI
    (model_v3.py:344-415)."""
    import json, os
    from cips3dpp_tpu.apps.cli import main
    from test_cli import TINY_OPTS

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("sample: {G_cfg: {}}\n")
    rc = main([
        "sample-multi-view", "--cfg", str(cfg), "--section", "sample",
        "--opts", *TINY_OPTS,
        "--outdir", str(tmp_path / "out"), "--n-frames", "2",
        "--truncation", "1.0", "--project-noise",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["frames"] == 2
    assert os.path.exists(res["video"])


def test_cli_fixed_zs_multi_view(tmp_path, capsys):
    """_fixed_zs_multi_view_web parity (render_video_web_v10.py:2128)."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("fixed: {G_cfg: {}}\n")
    rc = main([
        "fixed-zs-multi-view", "--cfg", str(cfg), "--section", "fixed",
        "--opts", *TINY_OPTS,
        "--outdir", str(tmp_path / "out"), "--n-frames", "2", "--n-zs", "4",
        "--view-mode", "elev_circle", "--truncation", "1.0",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["frames"] == 2 and res["n_zs"] == 4
    assert os.path.exists(res["video"])
    # 4 identities tile to a 2x2 grid of 16^2 tiles
    from PIL import Image

    assert Image.open(res["grid"]).size == (32, 32)


def test_cli_lerp_inversions(tmp_path, capsys):
    """lerp_image_list parity (projector_v10.py:732): lerp between two saved
    inversion artifacts."""
    import pickle
    import jax.numpy as jnp
    from cips3dpp_tpu.apps.inversion import Projector, InversionConfig
    from cips3dpp_tpu.models.generator import Generator
    from cips3dpp_tpu.models.vgg import init_vgg
    from test_models import tiny_config

    gen_cfg = tiny_config(img_size=8, upsample_list=(128,), n_samples=4)
    model = Generator(gen_cfg)
    from cips3dpp_tpu.core import sample_cameras

    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), 1, 8)
    zs = (jnp.zeros((1, 256)), jnp.zeros((1, 256)))
    params = model.init(
        {"params": key, "perturb": key, "noise": key},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    vgg = init_vgg(jax.random.PRNGKey(0), img_size=16)
    icfg = InversionConfig(n_steps_pose=1, n_steps_app=1, w_avg_samples=8)
    proj = Projector(model, params, vgg, icfg)
    target = np.asarray(
        jnp.tanh(jax.random.normal(jax.random.PRNGKey(9), (16, 16, 3)))
    )
    paths = []
    for i in range(2):
        state, _, _ = proj.project(target, key=jax.random.PRNGKey(i))
        paths.append(str(tmp_path / f"w{i}.pkl"))
        proj.save_inversion(paths[-1], state)

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("lerp: {G_cfg: {}}\n")
    rc = main([
        "lerp-inversions", "--cfg", str(cfg), "--section", "lerp",
        "--opts", *TINY_OPTS,
        "--outdir", str(tmp_path / "out"),
        "--inversions", *paths, "--n-interp", "2",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["frames"] == 4  # 2 pairs x 2 interp frames (cyclic)
    assert os.path.exists(res["video"])


def test_cli_import_torch_discriminators(tmp_path, capsys):
    """import-torch --model d / d_pose: reference-named D state dicts ->
    orbax checkpoints (finetune-from-training-ckpt path)."""
    import jax
    import jax.numpy as jnp
    import torch

    from cips3dpp_tpu.models.discriminator import DStyleGANProgressive
    from cips3dpp_tpu.models.discriminator_pose import DVolumeRenderProgressive
    from cips3dpp_tpu.io.torch_import import (
        export_d_stylegan_state_dict,
        export_d_pose_state_dict,
    )
    from cips3dpp_tpu.apps.cli import main

    # tiny config: out_size = 8 * 2^1 = 16, img_size 8
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("imp: {G_cfg: {}}\n")
    opts = [
        "G_cfg.renderer.n_layers", "2",
        "G_cfg.renderer.hidden_dim", "32",
        "G_cfg.decoder.upsample_list", "[128]",
        "G_cfg.decoder.style_dim", "64",
        "G_cfg.decoder.mapping_n_layers", "2",
        "G_cfg.decoder.channel_multiplier", "1",
        "G_cfg.img_size", "8",
        "G_cfg.n_samples", "4",
    ]

    d = DStyleGANProgressive(input_size=16, channel_multiplier=1)
    pd = d.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)))
    torch.save(
        {k: torch.from_numpy(v.copy())
         for k, v in export_d_stylegan_state_dict(pd).items()},
        tmp_path / "D.pth",
    )
    rc = main([
        "import-torch", "--cfg", str(cfg), "--section", "imp",
        "--opts", *opts, "--pth", str(tmp_path / "D.pth"),
        "--model", "d", "--outdir", str(tmp_path / "out_d"),
    ])
    assert rc in (0, None)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["model"] == "d" and os.path.isdir(rec["ckpt"])

    dr = DVolumeRenderProgressive(input_size=8)
    pdr = dr.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)))
    torch.save(
        {k: torch.from_numpy(v.copy())
         for k, v in export_d_pose_state_dict(pdr).items()},
        tmp_path / "D_renderer.pth",
    )
    rc = main([
        "import-torch", "--cfg", str(cfg), "--section", "imp",
        "--opts", *opts, "--pth", str(tmp_path / "D_renderer.pth"),
        "--model", "d_pose", "--outdir", str(tmp_path / "out_dp"),
    ])
    assert rc in (0, None)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["model"] == "d_pose" and os.path.isdir(rec["ckpt"])
