"""MDP (mllam-data-prep) zarr-backed datastore. Full implementation lands
with the native zarr reader; see npyfilesmeps for the file-based store."""

from __future__ import annotations

from .base import BaseRegularGridDatastore


class MDPDatastore(BaseRegularGridDatastore):
    """Zarr-backed training-ready datasets (ref: neural_lam/datastore/mdp.py)."""

    SHORT_NAME = "mdp"

    def __init__(self, config_path):
        raise NotImplementedError(
            "MDPDatastore: zarr reader not yet wired (work in progress)"
        )
