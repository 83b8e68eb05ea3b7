"""CLI launcher tests (in-process, tiny configs via --opts overrides)."""

import json
import os

import numpy as np
import pytest

from cips3dpp_tpu.apps.cli import main

TINY_OPTS = [
    "G_cfg.renderer.n_layers", "2",
    "G_cfg.renderer.hidden_dim", "32",
    "G_cfg.decoder.upsample_list", "[128]",
    "G_cfg.decoder.style_dim", "64",
    "G_cfg.decoder.mapping_n_layers", "2",
    "G_cfg.img_size", "8",
    "G_cfg.n_samples", "4",
]


def test_cli_help(capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    assert "sample-multi-view" in out and "train" in out


def test_cli_unknown():
    assert main(["bogus"]) == 2


def test_cli_sample_multi_view(tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("sample: {G_cfg: {}}\n")
    rc = main([
        "sample-multi-view", "--cfg", str(cfg), "--section", "sample",
        "--opts", *TINY_OPTS,
        "--outdir", str(tmp_path / "out"), "--n-frames", "3", "--truncation", "1.0",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["frames"] == 3
    assert os.path.exists(res["grid"])
    assert os.path.exists(res["video"])


def test_cli_style_mixing(tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("mix: {G_cfg: {}}\n")
    rc = main([
        "style-mixing", "--cfg", str(cfg), "--section", "mix",
        "--opts", *TINY_OPTS,
        "--outdir", str(tmp_path / "out"), "--n-rows", "2", "--n-cols", "2",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(res["grid"])
    assert res["shape"] == [32, 32, 3]  # 2x16 by 2x16


@pytest.mark.slow
def test_cli_train_tiny(tmp_path, capsys):
    """3 training iterations end-to-end through the CLI (data -> ckpt)."""
    from PIL import Image

    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(
            (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        ).save(data_dir / f"{i}.png")

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        """
train:
  G_cfg: {}
  D_cfg: {input_size: 1024, channel_multiplier: 1}
  D_renderer_cfg: {input_size: 64}
  batch: 4
  data_img_size: 16
  cam_img_size: 8
  d_reg_every: 2
  g_reg_every: 2
  ema_start: 1
  fade_steps: 10
  init_renderer: false
"""
    )
    rc = main([
        "train", "--cfg", str(cfg), "--section", "train",
        "--opts", *TINY_OPTS,
        "--data", str(data_dir), "--outdir", str(tmp_path / "run"),
        "--total-iters", "3", "--no-sphere-init", "--n-devices", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["done"]
    # checkpoint + config snapshot written
    ckpt_dir = tmp_path / "run" / "ckpt"
    assert ckpt_dir.exists()
    assert (ckpt_dir / "config_command.yaml").exists()
    # metrics logged
    assert (tmp_path / "run" / "logs" / "metrics.jsonl").exists()
