"""Model registry (ref: neural_lam/train_model.py:19-23)."""

from .graph_efm import GraphEFM, HiEFM
from .graph_lam import GraphLAM
from .hi_lam import HiLAM
from .hi_lam_parallel import HiLAMParallel

MODELS = {
    "graph_efm": GraphEFM,
    "graph_lam": GraphLAM,
    "hi_lam": HiLAM,
    "hi_lam_parallel": HiLAMParallel,
    "hi_efm": HiEFM,
}
