"""Training data pipeline.

Behavioural contract: exp/stylesdf/dataset.py (LMDB keyed
f"{resolution}-{idx:05d}", hflip augmentation, optional thumbnail) and
exp/stylesdf/scripts/prepare_data.py (center-crop -> multi-size resize).

TPU-first design: the hot path yields device-ready NHWC float batches in
[-1, 1]; decode/augment run on host threads ahead of the step (the XLA step
never blocks on IO). Two storage backends:

- LMDB (drop-in compatibility with datasets prepared by the reference tool)
- packed .npy shards (this framework's native format, written by
  `prepare_images`) — simple memory-mapped reads, no lmdb dependency.
"""

from __future__ import annotations

import io
import os
import threading
import queue as queue_mod
from typing import Iterator, Sequence

import numpy as np


def _to_float(img_u8: np.ndarray) -> np.ndarray:
    return img_u8.astype(np.float32) / 127.5 - 1.0


class ArrayDataset:
    """In-memory / mmap NHWC uint8 images."""

    def __init__(self, images: np.ndarray, hflip: bool = True):
        assert images.ndim == 4 and images.shape[-1] == 3, images.shape
        self.images = images
        self.hflip = hflip

    def __len__(self):
        return len(self.images)

    def get(self, idx: int, rng: np.random.Generator) -> np.ndarray:
        img = self.images[idx]
        if self.hflip and rng.random() < 0.5:
            img = img[:, ::-1]
        return _to_float(img)


class NpyShardDataset(ArrayDataset):
    """Native format: one or more {prefix}-{res}-{shard}.npy uint8 arrays."""

    def __init__(self, paths: Sequence[str], hflip: bool = True):
        arrays = [np.load(p, mmap_mode="r") for p in sorted(paths)]
        self.arrays = arrays
        self.sizes = np.array([len(a) for a in arrays])
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        self.hflip = hflip

    def __len__(self):
        return int(self.offsets[-1])

    def get(self, idx: int, rng: np.random.Generator) -> np.ndarray:
        shard = int(np.searchsorted(self.offsets, idx, side="right") - 1)
        img = np.asarray(self.arrays[shard][idx - self.offsets[shard]])
        if self.hflip and rng.random() < 0.5:
            img = img[:, ::-1]
        return _to_float(img)


class LMDBDataset:
    """Reads LMDB files produced by the reference's prepare_data tool
    (dataset.py:13-65 key scheme)."""

    def __init__(self, path: str, resolution: int, hflip: bool = True):
        import lmdb  # optional dep; gate at use

        self.env = lmdb.open(
            path, readonly=True, lock=False, readahead=False, meminit=False
        )
        with self.env.begin(write=False) as txn:
            self.length = int(txn.get(b"length").decode())
        self.resolution = resolution
        self.hflip = hflip

    def __len__(self):
        return self.length

    def get(self, idx: int, rng: np.random.Generator) -> np.ndarray:
        from PIL import Image

        key = f"{self.resolution}-{idx:05d}".encode()
        with self.env.begin(write=False) as txn:
            buf = txn.get(key)
        img = np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))
        if self.hflip and rng.random() < 0.5:
            img = img[:, ::-1]
        return _to_float(img)


def open_dataset(path: str, resolution: int, hflip: bool = True):
    """Auto-detect backend: directory of .npy shards, an LMDB dir, or a
    directory of images (debug path)."""
    if os.path.isdir(path):
        npys = [
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".npy")
        ]
        if npys:
            return NpyShardDataset(npys, hflip=hflip)
        if os.path.exists(os.path.join(path, "data.mdb")):
            return LMDBDataset(path, resolution, hflip=hflip)
        # plain image folder
        from PIL import Image

        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
        )
        imgs = np.stack(
            [
                np.asarray(
                    Image.open(f).convert("RGB").resize((resolution, resolution))
                )
                for f in files
            ]
        )
        return ArrayDataset(imgs, hflip=hflip)
    raise FileNotFoundError(path)


def data_iterator(
    dataset,
    batch_size: int,
    seed: int = 0,
    shard_index: int = 0,
    num_shards: int = 1,
    prefetch: int = 4,
) -> Iterator[np.ndarray]:
    """Infinite shuffled iterator with host-side prefetch threads.

    Sharding replaces DistributedSampler (cips3d/utils.py:29-52): each host
    takes every num_shards-th index of a per-epoch permutation."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)

    def worker():
        rng = np.random.default_rng(seed + shard_index)
        epoch = 0
        while True:
            order = np.random.default_rng(seed + epoch).permutation(len(dataset))
            order = order[shard_index::num_shards]
            for start in range(0, len(order) - batch_size + 1, batch_size):
                idxs = order[start : start + batch_size]
                batch = np.stack([dataset.get(int(i), rng) for i in idxs])
                q.put(batch)
            epoch += 1

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        yield q.get()


def _list_images(src_dir: str):
    return sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    )


def _center_crop_resize(args):
    """Worker: one source image -> {size: uint8 HWC array}. Top-level so it
    pickles for multiprocessing (the reference's pool worker,
    prepare_data.py:23-46). crop_size=None crops to the centered max square
    (prepare_data.py); an explicit (crop_w, crop_h) reproduces the
    crop_data.py tool's fixed centered window (crop_data.py:23-46)."""
    path, sizes, crop_size = args
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    if crop_size is None:
        cw = ch = min(w, h)
    else:
        cw, ch = crop_size
    left, upper = (w - cw) // 2, (h - ch) // 2
    img = img.crop((left, upper, left + cw, upper + ch))
    return {
        size: np.asarray(img.resize((size, size), Image.LANCZOS))
        for size in sizes
    }


def _resized_stream(files, sizes, n_workers: int, crop_size=None):
    """Ordered stream of per-image {size: array} dicts, optionally through a
    multiprocessing pool (reference: prepare_data.py:69-80)."""
    if isinstance(crop_size, int):
        crop_size = (crop_size, crop_size)
    work = [(f, tuple(sizes), crop_size) for f in files]
    if n_workers and n_workers > 1:
        import multiprocessing

        with multiprocessing.Pool(n_workers) as pool:
            yield from pool.imap(_center_crop_resize, work, chunksize=8)
    else:
        yield from map(_center_crop_resize, work)


def prepare_images(
    src_dir: str,
    out_dir: str,
    sizes: Sequence[int] = (1024,),
    shard_size: int = 10_000,
    n_workers: int = 0,
    crop_size=None,
):
    """Native prepare tool (reference: prepare_data.py:23-80): center-crop to
    square (or to an explicit crop_size window, the crop_data.py tool),
    lanczos-resize to each size, write uint8 .npy shards. One pass
    over the sources produces every size."""
    os.makedirs(out_dir, exist_ok=True)
    files = _list_images(src_dir)
    shards = {size: [] for size in sizes}
    shard_idx = {size: 0 for size in sizes}

    def flush(size):
        if shards[size]:
            np.save(
                os.path.join(
                    out_dir, f"images-{size}-{shard_idx[size]:04d}.npy"
                ),
                np.stack(shards[size]),
            )
            shards[size] = []
            shard_idx[size] += 1

    for per_size in _resized_stream(files, sizes, n_workers, crop_size):
        for size, arr in per_size.items():
            shards[size].append(arr)
            if len(shards[size]) == shard_size:
                flush(size)
    for size in sizes:
        flush(size)
    return out_dir


def prepare_images_lmdb(
    src_dir: str,
    out_dir: str,
    sizes: Sequence[int] = (64, 128, 256, 512, 1024),
    n_workers: int = 0,
    quality: int = 100,
    map_size: int = 1 << 40,
    crop_size=None,
    codec: str = "png",
):
    """Multi-size LMDB builder byte-compatible with the reference's tool
    (exp/stylesdf/scripts/prepare_data.py:23-80): keys f"{size}-{idx:05d}"
    hold losslessly-encoded PNG bytes (prepare_data.py:44), plus a b"length"
    count written AFTER the image loop so a partial build is detectable.
    Readable by both the reference's MultiResolutionDataset (dataset.py:46-49)
    and LMDBDataset above. ``codec="jpeg"`` (with ``quality``) is an opt-in
    lossy alternative — NOT reference-compatible pixel-wise."""
    import lmdb  # optional dep; gate at use
    from PIL import Image

    files = _list_images(src_dir)
    env = lmdb.open(out_dir, map_size=map_size, readahead=False)
    save_kw = {"format": codec}
    if codec.lower() in ("jpeg", "jpg"):
        save_kw["quality"] = quality
    try:
        count = 0
        for idx, per_size in enumerate(
            _resized_stream(files, sizes, n_workers, crop_size)
        ):
            with env.begin(write=True) as txn:
                for size, arr in per_size.items():
                    buf = io.BytesIO()
                    Image.fromarray(arr).save(buf, **save_kw)
                    txn.put(
                        f"{size}-{idx:05d}".encode("utf-8"), buf.getvalue()
                    )
            count = idx + 1
        # length last: an interrupted build has no b"length" key and reads
        # as incomplete rather than crashing LMDBDataset on a None get.
        with env.begin(write=True) as txn:
            txn.put(b"length", str(count).encode("utf-8"))
    finally:
        env.close()
    return out_dir
