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


def _spans_processes(mesh: Mesh) -> bool:
    return jax.process_count() > 1 and mesh.devices.size > jax.local_device_count()


def shard_batch(batch, mesh: Mesh):
    """Place a (leading-batch-dim) pytree sharded over the 'data' axis.

    On a multi-host mesh the given pytree is this host's LOCAL slice of the
    batch; the returned global arrays have leading dim local_batch x n_hosts
    (DDP semantics: effective batch scales with the number of hosts,
    ref: neural_lam/train_model.py:279).
    """
    sharding = NamedSharding(mesh, P("data"))
    if _spans_processes(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh (multi-host: every process
    must already hold identical values — same seed or same checkpoint)."""
    sharding = NamedSharding(mesh, P())
    if _spans_processes(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
