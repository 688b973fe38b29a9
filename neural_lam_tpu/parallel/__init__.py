"""Device-mesh parallelism: data-parallel sharding + spatial graph partitioning."""

from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
