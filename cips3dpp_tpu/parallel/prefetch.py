"""Host→device input pipelining for the training loop.

The reference's DataLoader workers hand CPU tensors to the train loop,
which `.to(device)`s them synchronously every iteration
(exp/cips3d/scripts/train_v10.py:905-918). On TPU that per-iter blocking
transfer sits on the step's critical path. `jax.device_put` is async —
it returns immediately and the DMA overlaps device compute — so keeping
a small queue of batches already in flight removes host→device transfer
from the step time entirely. This is the NamedSharding-era equivalent of
`flax.jax_utils.prefetch_to_device` (which is pmap-only).
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import numpy as np
import jax


def prefetch_to_device(
    data: Iterable[np.ndarray],
    sharding=None,
    size: int = 2,
) -> Iterator[jax.Array]:
    """Yield batches from `data` already placed on device(s).

    `sharding`: a `jax.sharding.Sharding` (e.g. `data_sharding(mesh)`),
    or None for the default device. `size` batches are kept in flight;
    2 (double-buffering) hides a transfer that is shorter than a step.
    """
    assert size >= 1
    it = iter(data)
    queue: collections.deque[jax.Array] = collections.deque()

    def put(batch):
        batch = np.asarray(batch)
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    try:
        while len(queue) < size:
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
