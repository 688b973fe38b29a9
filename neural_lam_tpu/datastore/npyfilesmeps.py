"""MEPS npy-files datastore. Full implementation follows the core pipeline."""

from __future__ import annotations

from .base import BaseRegularGridDatastore


class NpyFilesDatastoreMEPS(BaseRegularGridDatastore):
    """v0.1.0 MEPS npy-file format (ref: neural_lam/datastore/npyfilesmeps/)."""

    SHORT_NAME = "npyfilesmeps"

    def __init__(self, config_path):
        raise NotImplementedError(
            "NpyFilesDatastoreMEPS: implementation in progress"
        )
