"""Core numeric ops: MLPs, message passing, segment reductions, Pallas kernels."""

from .mlp import init_mlp, apply_mlp, mlp_blueprint  # noqa: F401
from .message_passing import (  # noqa: F401
    EdgeSet,
    init_interaction_net,
    apply_interaction_net,
)
from .segment import segment_sum, segment_mean, build_gather_table  # noqa: F401
