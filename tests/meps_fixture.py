"""Synthetic on-disk MEPS npy-format dataset for tests (stands in for the
reference's S3-downloaded meps_example_reduced, ref: tests/conftest.py:25-45)."""

import numpy as np
import yaml

NX, NY = 12, 9  # dim_x, dim_y (>= 10 per side for a 1-level mesh)
N_T = 7
N_MEMBERS = 2
N_STATE_RAW = 5  # on-disk features; one gets removed
REMOVE_IDX = [3]
VAR_NAMES = [f"var_{i}" for i in range(N_STATE_RAW - len(REMOVE_IDX))]


def make_meps_dataset(root, seed=0):
    """Create a tiny synthetic MEPS-format dataset; returns config path."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    analysis_times = {
        "train": ["2022040100", "2022040112", "2022040200"],
        "val": ["2022060500"],
        "test": ["2022090100"],
    }
    for split, atimes in analysis_times.items():
        d = root / "samples" / split
        d.mkdir(parents=True, exist_ok=True)
        for at in atimes:
            for member in range(N_MEMBERS):
                arr = rng.normal(
                    size=(N_T, NY, NX, N_STATE_RAW)
                ).astype(np.float32)
                np.save(d / f"nwp_{at}_mbr{member:03d}.npy", arr)
            np.save(
                d / f"nwp_toa_downwelling_shortwave_flux_{at}.npy",
                rng.uniform(0, 100, size=(N_T, NY, NX)).astype(np.float32),
            )
            np.save(
                d / f"wtr_{at}.npy",
                rng.uniform(0, 1, size=(NY, NX)).astype(np.float32),
            )

    static = root / "static"
    static.mkdir(exist_ok=True)
    np.save(static / "surface_geopotential.npy",
            rng.normal(size=(NY, NX)).astype(np.float32))
    border = np.zeros((NY, NX), dtype=np.float32)
    border[0, :] = border[-1, :] = border[:, 0] = border[:, -1] = 1
    np.save(static / "border_mask.npy", border)
    x = np.arange(NX, dtype=np.float32) * 10000.0
    y = np.arange(NY, dtype=np.float32) * 10000.0
    xy = np.stack(np.meshgrid(x, y, indexing="xy"), axis=0)  # (2, NY, NX)
    np.save(static / "nwp_xy.npy", xy.astype(np.float32))

    n_state = N_STATE_RAW - len(REMOVE_IDX)
    config = {
        "dataset": {
            "name": "meps_tiny",
            "var_names": VAR_NAMES,
            "var_units": ["-"] * n_state,
            "var_longnames": [f"long {v}" for v in VAR_NAMES],
            "num_forcing_features": 6,
            "num_timesteps": N_T,
            "step_length": 1,
            "num_ensemble_members": N_MEMBERS,
            "remove_state_features_with_index": REMOVE_IDX,
        },
        "grid_shape_state": [NY, NX],
        "projection": {
            "class_name": "LambertConformal",
            "kwargs": {"central_longitude": 15.0, "central_latitude": 63.0},
        },
    }
    config_path = root / "data_config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    return config_path
