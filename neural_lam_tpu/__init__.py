"""neural_lam_tpu — TPU-native graph neural weather prediction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Neural-LAM
(graph-based limited-area weather modeling: encode-process-decode GNNs over
multiscale/hierarchical meshes with autoregressive rollout), built TPU-first:

- functional param pytrees + jit/scan instead of torch modules + python loops
- receiver-sorted static edge arrays + segment reductions instead of PyG scatter
- `jax.sharding.Mesh` + shard_map collectives instead of DDP/NCCL
- host-side numpy/zarr data plane (no torch DataLoader)

Reference capability map: see SURVEY.md at the repo root. Reference files are
cited in docstrings as ``ref: neural_lam/<file>:<lines>`` for parity checking.
"""

from . import config, metrics, loss_weighting  # noqa: F401
from .dataset import WeatherDataset  # noqa: F401

__version__ = "0.2.0"
