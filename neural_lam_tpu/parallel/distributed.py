"""Multi-host initialization and DCN-aware meshes.

The reference's only multi-node story is SLURM-launched torch.distributed
with NCCL/Gloo (ref: neural_lam/datastore/npyfilesmeps/
compute_standardization_stats.py:53-91). TPU-native equivalent: one
`jax.distributed.initialize()` per host, a global mesh whose outermost axis
(`data`) spans hosts over DCN while `space` stays inside each ICI domain,
and per-host input sharding through `WeatherDataLoader(shard=...)`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_multihost(coordinator_address=None, num_processes=None,
                   process_id=None):
    """Initialize JAX's distributed runtime (no-op when single-host).

    On TPU pods the arguments are discovered from the environment; pass
    them explicitly for CPU/GPU clusters (mirrors SLURM-env handling in
    ref: compute_standardization_stats.py:53-58).
    """
    if num_processes is not None and num_processes > 1 or (
        coordinator_address is not None
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def make_global_mesh(n_space: int = 1) -> Mesh:
    """('data', 'space') mesh over ALL devices (all hosts).

    `space` (spatial graph sharding, heavy psums) is laid out within a
    host's ICI domain; `data` (one gradient all-reduce per step) spans
    hosts over DCN — the collective-to-bandwidth matching that makes
    multi-host weak scaling work.
    """
    devices = np.asarray(jax.devices())
    n_total = devices.size
    assert n_total % n_space == 0, (n_total, n_space)
    local = jax.local_device_count()
    assert local % n_space == 0, (
        f"space axis ({n_space}) must divide local device count ({local}) "
        "so its collectives stay on ICI"
    )
    return Mesh(devices.reshape(n_total // n_space, n_space),
                ("data", "space"))


def host_shard() -> tuple:
    """(num_shards, shard_id) for WeatherDataLoader: one shard per host."""
    return jax.process_count(), jax.process_index()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def local_value(x):
    """Full value of a fully-replicated (possibly multi-host global) array."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)


def local_scalar(x) -> float:
    return float(local_value(x))


def psum_across_hosts(tree):
    """Element-wise sum of a numpy pytree over all processes (eval metric
    merging: each host reduces its own shard of the eval set to fixed-shape
    sums/counts, then the sums are combined). Single-host: identity."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    def red(x):
        gathered = np.asarray(
            multihost_utils.process_allgather(np.asarray(x))
        )
        return gathered.reshape((jax.process_count(),) + np.shape(x)).sum(
            axis=0
        )

    return jax.tree_util.tree_map(red, tree)


def all_gather_metrics(local_values: np.ndarray) -> np.ndarray:
    """Gather per-host metric arrays to every host (eval aggregation,
    replacing ref ar_model.py:311-320 all_gather). Single-host: identity."""
    if jax.process_count() == 1:
        return np.asarray(local_values)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(local_values))
    ).reshape((-1,) + np.asarray(local_values).shape[1:])
