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
