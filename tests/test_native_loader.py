"""Native C++ data loader tests (build + correctness + throughput sanity)."""

import os
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    rng = np.random.RandomState(0)
    np.save(d / "images-16-0000.npy", (rng.rand(12, 16, 16, 3) * 255).astype(np.uint8))
    np.save(d / "images-16-0001.npy", (rng.rand(8, 16, 16, 3) * 255).astype(np.uint8))
    return str(d)


def test_build_and_basic(shard_dir):
    from cips3dpp_tpu.io.native_loader import open_native_loader

    loader = open_native_loader(shard_dir, batch_size=4, seed=1, n_threads=2)
    assert len(loader) == 20
    assert loader.height == loader.width == 16
    batch = next(loader)
    assert batch.shape == (4, 16, 16, 3)
    assert batch.dtype == np.float32
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    # values match a source pixel set: every value must be k/127.5-1
    k = np.round((batch + 1.0) * 127.5)
    np.testing.assert_allclose(k / 127.5 - 1.0, batch, atol=1e-6)
    loader.close()


def test_batches_vary_and_deterministic(shard_dir):
    from cips3dpp_tpu.io.native_loader import open_native_loader

    a1 = open_native_loader(shard_dir, batch_size=4, seed=7, n_threads=1,
                            hflip=False)
    b1 = [next(a1) for _ in range(3)]
    a1.close()
    a2 = open_native_loader(shard_dir, batch_size=4, seed=7, n_threads=1,
                            hflip=False)
    b2 = [next(a2) for _ in range(3)]
    a2.close()
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)  # same seed -> same stream
    assert not np.allclose(b1[0], b1[1])  # consecutive batches differ


def test_host_sharding_disjoint(shard_dir):
    from cips3dpp_tpu.io.native_loader import open_native_loader

    l0 = open_native_loader(shard_dir, batch_size=4, seed=3, hflip=False,
                            shard_index=0, num_shards=2, n_threads=1)
    l1 = open_native_loader(shard_dir, batch_size=4, seed=3, hflip=False,
                            shard_index=1, num_shards=2, n_threads=1)
    x0, x1 = next(l0), next(l1)
    assert not np.allclose(x0, x1)
    l0.close()
    l1.close()


def test_matches_python_pixels(shard_dir):
    """Loader output pixels must come from the actual shard data."""
    from cips3dpp_tpu.io.native_loader import open_native_loader

    raw = np.concatenate([
        np.load(os.path.join(shard_dir, f))
        for f in sorted(os.listdir(shard_dir))
    ])
    as_float = raw.astype(np.float32) / 127.5 - 1.0
    pool = {as_float[i].tobytes() for i in range(len(as_float))}
    pool |= {as_float[i, :, ::-1].copy().tobytes() for i in range(len(as_float))}

    loader = open_native_loader(shard_dir, batch_size=4, seed=5, n_threads=2)
    batch = next(loader)
    for img in batch:
        assert img.tobytes() in pool
    loader.close()
