"""Device meshes and batch sharding.

The reference's only parallelism is single-process `nn.DataParallel`
(train.py:90) — replicate params, scatter the batch, gather per-sample
losses. The TPU-native equivalent is a 1-D `jax.sharding.Mesh` over a 'data'
axis: the batch axis of every input is sharded, params are replicated, and
the SAME jitted train step runs on 1 chip or a slice — XLA emits the gradient
all-reduce over ICI (SURVEY §2.6). The per-sample `_bs` loss convention is
exactly what makes this free: losses stay (B, ·) until the final sums.

A 'model' axis is reserved for tensor-parallel experiments; parity does not
require it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch_fn(mesh: Mesh, axis: str = "data"):
    """Returns a function placing a dict of host arrays batch-sharded on the
    mesh (leading axis split over `axis`, rest replicated)."""

    def shard(batch):
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            spec = P(axis, *([None] * (v.ndim - 1)))
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        return out

    return shard


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
