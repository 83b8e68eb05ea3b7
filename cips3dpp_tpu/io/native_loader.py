"""ctypes bindings for the native C++ data loader.

Drop-in alternative to dataset.data_iterator for .npy shard datasets: worker
threads decode/augment/normalize off the GIL and keep a ring of device-ready
batches. Falls back cleanly if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Sequence

import numpy as np


class NativeLoader:
    def __init__(
        self,
        shard_paths: Sequence[str],
        batch_size: int,
        seed: int = 0,
        hflip: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
        n_threads: int = 4,
        ring_size: int = 8,
    ):
        from ..native.build import build_native

        lib_path = build_native()
        lib = ctypes.CDLL(lib_path)
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.loader_height.restype = ctypes.c_long
        lib.loader_height.argtypes = [ctypes.c_void_p]
        lib.loader_width.restype = ctypes.c_long
        lib.loader_width.argtypes = [ctypes.c_void_p]
        lib.loader_size.restype = ctypes.c_long
        lib.loader_size.argtypes = [ctypes.c_void_p]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib

        paths = sorted(os.path.abspath(p) for p in shard_paths)
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.loader_create(
            arr, len(paths), batch_size, seed, int(hflip),
            shard_index, num_shards, n_threads, ring_size,
        )
        if not self._handle:
            raise RuntimeError(f"native loader failed to open shards: {paths}")
        self.batch_size = batch_size
        self.height = lib.loader_height(self._handle)
        self.width = lib.loader_width(self._handle)

    def __len__(self):
        return self._lib.loader_size(self._handle)

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty(
            (self.batch_size, self.height, self.width, 3), np.float32
        )
        rc = self._lib.loader_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise StopIteration
        return out

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def open_native_loader(path: str, batch_size: int, **kwargs):
    """Open a directory of .npy shards with the native loader, or raise."""
    shards = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".npy")
    ]
    if not shards:
        raise FileNotFoundError(f"no .npy shards in {path}")
    return NativeLoader(shards, batch_size, **kwargs)
