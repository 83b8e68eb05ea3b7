"""Profiling utility tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp


def test_device_memory_stats():
    from cips3dpp_tpu.utils.profiling import device_memory_stats

    stats = device_memory_stats()
    assert set(stats) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}


def test_time_scanned():
    from cips3dpp_tpu.utils.profiling import time_scanned

    def body(carry, x):
        return carry + jnp.sum(x * x), None

    xs = jnp.arange(32.0).reshape(8, 4)
    per_iter, total = time_scanned(body, xs, reps=2)
    assert per_iter > 0 and total >= per_iter


def test_rendering_time_tiny():
    from test_models import tiny_config
    from cips3dpp_tpu.core import sample_cameras
    from cips3dpp_tpu.models.generator import Generator
    from cips3dpp_tpu.utils.profiling import rendering_time

    cfg = tiny_config()
    model = Generator(cfg)
    key = jax.random.PRNGKey(0)
    cam = sample_cameras(jax.random.PRNGKey(1), 1, cfg.img_size)
    zs = (jnp.zeros((1, 256)), jnp.zeros((1, 256)))
    params = model.init(
        {"params": key, "perturb": key, "noise": key},
        zs=zs, cam_poses=cam.extrinsics, focals=cam.focal,
        near=cam.near, far=cam.far,
    )
    res = rendering_time(model, params, n_frames=4, reps=1)
    assert res["fps"] > 0
    assert res["n_frames"] == 4


def test_trace_context(tmp_path):
    from cips3dpp_tpu.utils.profiling import trace

    with trace(str(tmp_path / "tr")) as d:
        x = jnp.ones((64, 64))
        (x @ x).block_until_ready()
    # trace files written
    found = False
    for root, _, files in os.walk(d):
        if files:
            found = True
    assert found


def test_metric_logger_txt_jsonl_and_figures(tmp_path):
    """tl2 textlogger parity (SURVEY.md §5): per-metric txt files, jsonl
    stream, and loss-curve PNG dumps from the accumulated txt."""
    from cips3dpp_tpu.utils.logging import MetricLogger

    lg = MetricLogger(str(tmp_path), flush_every=2)
    for i in range(4):
        lg.log(i, {"d_loss": 1.0 / (i + 1), "g_loss": float(i)})
        lg.log_jsonl(i, {"d_loss": 1.0 / (i + 1)})
    lg.flush()
    txt = (tmp_path / "d_loss.txt").read_text().strip().splitlines()
    assert len(txt) == 4 and txt[0].split()[0] == "0"
    assert (tmp_path / "metrics.jsonl").exists()
    pngs = lg.save_figures()
    assert sorted(os.path.basename(p) for p in pngs) == [
        "d_loss.png", "g_loss.png",
    ]
    for p in pngs:
        assert os.path.getsize(p) > 1000  # a real rendered figure
