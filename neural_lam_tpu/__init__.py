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

import os as _os

if not _os.environ.get("NLT_NUMPY_HUGEPAGE"):
    # numpy madvises MADV_HUGEPAGE on >=4 MB buffers; with the kernel's
    # THP defrag policy at "madvise" every fresh batch-sized allocation
    # then pays synchronous huge-page compaction in its fault path —
    # measured 0.25 -> 3.4 s of kernel time per loader epoch (5x end-to-end
    # input-pipeline swings). 4 KB faults are cheap and predictable; opt
    # out via the runtime setter (the NUMPY_MADVISE_HUGEPAGE env var only
    # works when set before the interpreter starts). Set
    # NLT_NUMPY_HUGEPAGE=1 to keep numpy's default behavior. This is a
    # private numpy API and may be removed in a future numpy — the
    # hasattr guard below makes that a silent no-op (documented in
    # README "Input pipeline notes").
    try:
        from numpy._core import multiarray as _np_ma
    except ImportError:  # numpy < 2
        try:
            from numpy.core import multiarray as _np_ma
        except ImportError:
            _np_ma = None
    if _np_ma is not None and hasattr(_np_ma, "_set_madvise_hugepage"):
        _np_ma._set_madvise_hugepage(False)

from . import config, metrics, loss_weighting  # noqa: F401
from .dataset import WeatherDataset  # noqa: F401

__version__ = "0.2.0"
