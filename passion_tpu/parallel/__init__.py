"""Parallelism: device meshes and sharding helpers."""

from passion_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch_fn,
)
