"""IO tests: config inheritance/overrides, checkpoint round-trip, dataset."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cips3dpp_tpu.io.config import (
    load_command_config,
    apply_overrides,
    save_snapshot,
    load_snapshot,
    generator_config_from_dict,
    train_config_from_dict,
)


CFG_YAML = """
_model: &model
  renderer:
    n_layers: 2
  decoder:
    upsample_list: [128, 256, 512, 1024]

train_base:
  G_cfg: *model
  batch: 4
  total_iters: 800000
  lambda_gp: 10.0

train_r1024:
  base: train_base
  batch: 8
  G_cfg:
    renderer:
      n_layers: 3

eval:
  base: train_r1024
  batch: 1
"""


def test_config_inheritance(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(CFG_YAML)
    cfg = load_command_config(str(p), "train_r1024")
    assert cfg["batch"] == 8  # overridden
    assert cfg["total_iters"] == 800000  # inherited
    # nested merge: n_layers overridden, upsample_list inherited via anchor
    assert cfg["G_cfg"]["renderer"]["n_layers"] == 3
    assert cfg["G_cfg"]["decoder"]["upsample_list"] == [128, 256, 512, 1024]
    # two-level chain
    ev = load_command_config(str(p), "eval")
    assert ev["batch"] == 1 and ev["total_iters"] == 800000


def test_config_overrides(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(CFG_YAML)
    cfg = load_command_config(str(p), "train_base")
    cfg = apply_overrides(
        cfg, ["batch", "16", "G_cfg.renderer.n_layers", "8", "lambda_gp", "5.5"]
    )
    assert cfg["batch"] == 16
    assert cfg["G_cfg"]["renderer"]["n_layers"] == 8
    assert cfg["lambda_gp"] == 5.5


def test_config_snapshot_roundtrip(tmp_path):
    cfg = {"a": 1, "b": {"c": [1, 2]}}
    save_snapshot(cfg, str(tmp_path))
    assert load_snapshot(str(tmp_path)) == cfg


def test_typed_config_builders():
    g = generator_config_from_dict(
        {
            "renderer": {"n_layers": 4},
            "decoder": {"upsample_list": [128]},
            "img_size": 32,
        }
    )
    assert g.renderer.n_layers == 4
    assert g.decoder.upsample_list == (128,)
    assert g.img_size == 32
    t = train_config_from_dict({"batch": 2, "unknown_key": 5})
    assert t.batch == 2


def test_checkpoint_roundtrip(tmp_path):
    from cips3dpp_tpu.io.checkpoint import CheckpointManager

    state = {
        "w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "step": jnp.asarray(7),
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(0, state, config={"model": "tiny"})
    state2 = jax.tree.map(jnp.zeros_like, state)
    restored = mgr.restore(state2)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(state["w"]))
    assert int(restored["step"]) == 7
    assert mgr.load_config() == {"model": "tiny"}
    # rotation
    for step in (1, 2, 3):
        mgr.save(step, state)
    assert mgr.latest_step() == 3
    mgr.close()


def test_dataset_iterator(tmp_path):
    from cips3dpp_tpu.io.dataset import (
        ArrayDataset,
        NpyShardDataset,
        data_iterator,
        open_dataset,
    )

    imgs = (np.random.RandomState(0).rand(10, 8, 8, 3) * 255).astype(np.uint8)
    ds = ArrayDataset(imgs)
    it = data_iterator(ds, batch_size=4, seed=0)
    batch = next(it)
    assert batch.shape == (4, 8, 8, 3)
    assert batch.min() >= -1.0 and batch.max() <= 1.0

    # npy shards + auto-detection
    np.save(tmp_path / "images-8-0000.npy", imgs[:6])
    np.save(tmp_path / "images-8-0001.npy", imgs[6:])
    ds2 = open_dataset(str(tmp_path), resolution=8)
    assert isinstance(ds2, NpyShardDataset)
    assert len(ds2) == 10
    rng = np.random.default_rng(0)
    img9 = ds2.get(9, rng)
    assert img9.shape == (8, 8, 3)

    # host sharding: two shards see disjoint indices
    it0 = data_iterator(ds, 2, seed=1, shard_index=0, num_shards=2)
    it1 = data_iterator(ds, 2, seed=1, shard_index=1, num_shards=2)
    b0, b1 = next(it0), next(it1)
    assert not np.allclose(b0, b1)


def _write_src_images(tmp_path, n=3, size=48):
    from PIL import Image

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(n):
        # non-square to exercise the center crop
        arr = rng.randint(0, 255, (size + 16, size, 3), np.uint8)
        Image.fromarray(arr).save(src / f"img_{i}.png")
    return str(src)


def test_prepare_images_multi_size_and_workers(tmp_path):
    """One pass writes every size; the multiprocessing pool path produces
    identical bytes (reference prepare_data.py:69-80 parity)."""
    from cips3dpp_tpu.io.dataset import prepare_images, NpyShardDataset

    src = _write_src_images(tmp_path)
    out1 = prepare_images(src, str(tmp_path / "o1"), sizes=(16, 32))
    out2 = prepare_images(src, str(tmp_path / "o2"), sizes=(16, 32), n_workers=2)
    for size in (16, 32):
        a = np.load(os.path.join(out1, f"images-{size}-0000.npy"))
        b = np.load(os.path.join(out2, f"images-{size}-0000.npy"))
        assert a.shape == (3, size, size, 3)
        np.testing.assert_array_equal(a, b)


def test_prepare_images_explicit_crop(tmp_path):
    """crop_size pins a fixed centered window before the resize (the
    reference crop_data.py tool, crop_data.py:23-46): cropping to the full
    width x 32 of a 48x64 source must differ from the default max-square
    crop, and equal a hand-cropped-then-resized PIL pipeline."""
    from PIL import Image
    from cips3dpp_tpu.io.dataset import prepare_images

    src = _write_src_images(tmp_path, n=1, size=48)  # sources are 48w x 64h
    out_sq = prepare_images(src, str(tmp_path / "sq"), sizes=(16,))
    out_cr = prepare_images(
        src, str(tmp_path / "cr"), sizes=(16,), crop_size=(48, 32)
    )
    a = np.load(os.path.join(out_sq, "images-16-0000.npy"))[0]
    b = np.load(os.path.join(out_cr, "images-16-0000.npy"))[0]
    assert not np.array_equal(a, b)

    img = Image.open(os.path.join(src, "img_0.png")).convert("RGB")
    ref = img.crop((0, 16, 48, 48)).resize((16, 16), Image.LANCZOS)
    np.testing.assert_array_equal(b, np.asarray(ref))


def test_prepare_images_lmdb_roundtrip(tmp_path):
    """Reference-format multi-size LMDB write -> read back through
    LMDBDataset (keys f'{size}-{idx:05d}', b'length')."""
    lmdb = pytest.importorskip("lmdb")
    from cips3dpp_tpu.io.dataset import prepare_images_lmdb, LMDBDataset

    src = _write_src_images(tmp_path)
    out = prepare_images_lmdb(
        src, str(tmp_path / "lmdb"), sizes=(16, 32), map_size=1 << 26
    )
    for size in (16, 32):
        ds = LMDBDataset(out, resolution=size, hflip=False)
        assert len(ds) == 3
        img = ds.get(0, np.random.default_rng(0))
        assert img.shape == (size, size, 3)
        assert np.abs(img).max() <= 1.0
