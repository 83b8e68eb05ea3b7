"""Device-mesh helpers — the framework's entire distributed story.

The reference's distribution layer is DDP + hand-rolled NCCL helpers
(exp/stylesdf/models/distributed.py, tl2 ddp_utils.sync_gradients /
sync_models at train_v10.py:381,880): per-GPU processes, manual grad
all-reduce, weight broadcast, pickle all_gather. On TPU all of that
collapses into GSPMD: one process per host, a 1-axis `Mesh` over chips,
batch arrays sharded on the 'data' axis, params replicated. Writing losses
as global means makes XLA insert the psum that replaces
`ddp_utils.sync_gradients`; replicated params replace `sync_models`; there
is no separate communication layer to maintain. Collectives ride ICI
within a slice and DCN across slices automatically.

The same mesh generalises beyond DP: rays/samples (this model's "sequence
axis", SURVEY.md §2c) can shard over a second axis by constraining the ray
dimension — see `ray_sharding`.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
RAY_AXIS = "ray"


def make_mesh(n_devices: int | None = None, ray: int = 1) -> Mesh:
    """1- or 2-axis mesh: ('data',) or ('data', 'ray')."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devs = np.asarray(devices)
    if ray > 1:
        assert len(devs) % ray == 0
        return Mesh(devs.reshape(-1, ray), (DATA_AXIS, RAY_AXIS))
    return Mesh(devs, (DATA_AXIS,))


def data_sharding(mesh: Mesh, *rest_axes) -> NamedSharding:
    """Shard leading (batch) axis over 'data'; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *rest_axes))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """(B, R, ...) arrays: batch over 'data', rays over 'ray'."""
    return NamedSharding(mesh, P(DATA_AXIS, RAY_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree(mesh: Mesh, tree, spec: P | None = None):
    """Place a pytree on the mesh (replicated by default)."""
    sharding = NamedSharding(mesh, spec or P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def constrain_batch(x, mesh: Mesh | None):
    """with_sharding_constraint on the leading batch axis, no-op off-mesh."""
    if mesh is None:
        return x
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
