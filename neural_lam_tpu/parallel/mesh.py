"""Device mesh + sharding helpers.

The reference's only training parallelism is DDP data-parallel via
Lightning/NCCL (ref: neural_lam/train_model.py:276-286). TPU-native
equivalent: a `jax.sharding.Mesh` with a `data` axis (batch-sharded inputs,
replicated params — XLA inserts the gradient psum) and a `space` axis for
spatial graph partitioning (see parallel/spatial.py). Multi-host: the same
mesh spans hosts; DCN-friendly axis order puts `data` outermost.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_space: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'space') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    assert n_data * n_space <= len(devices), (
        f"mesh {n_data}x{n_space} needs more than {len(devices)} devices"
    )
    dev_array = np.asarray(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(dev_array, ("data", "space"))


def best_data_axis(batch_size: int, n_devices: int | None = None) -> int:
    """Largest divisor of batch_size that fits on the available devices."""
    if n_devices is None:
        n_devices = len(jax.devices())
    for d in range(min(batch_size, n_devices), 0, -1):
        if batch_size % d == 0:
            return d
    return 1


def shard_batch(batch, mesh: Mesh):
    """Place a (leading-batch-dim) pytree sharded over the 'data' axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
