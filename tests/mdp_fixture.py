"""Synthetic MDP-format zarr dataset fixture (mimics mllam-data-prep output,
like the danra example config in ref: tests/datastore_examples/mdp/)."""

import numpy as np
import yaml

from neural_lam_tpu.datastore.zarr_reader import (
    consolidate_metadata,
    write_zarr_array,
)

NX, NY = 12, 10
N_T = 30
N_STATE, N_FORCING, N_STATIC = 3, 2, 1


def make_mdp_dataset(root, n_boundary_points=2, seed=0):
    """Write config yaml + zarr; returns config path."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    zarr_path = root / "danra.datastore.zarr"
    zarr_path.mkdir(parents=True, exist_ok=True)

    n_grid = NX * NY
    times = np.datetime64("2020-01-01T00", "ns") + np.arange(
        N_T
    ) * np.timedelta64(3, "h")

    # grid coords, x-major stacking (grid_index = ix*NY + iy)
    x = np.arange(NX, dtype=np.float64) * 2500.0
    y = np.arange(NY, dtype=np.float64) * 2500.0
    xx, yy = np.meshgrid(x, y, indexing="ij")

    state = rng.normal(size=(N_T, n_grid, N_STATE)).astype(np.float32)
    state = np.cumsum(state * 0.2, axis=0) + rng.normal(size=(1, n_grid, N_STATE))
    forcing = rng.normal(size=(N_T, n_grid, N_FORCING)).astype(np.float32)
    static = rng.normal(size=(n_grid, N_STATIC)).astype(np.float32)

    write_zarr_array(zarr_path, "time", times, dims=["time"])
    write_zarr_array(zarr_path, "x", xx.reshape(-1), dims=["grid_index"])
    write_zarr_array(zarr_path, "y", yy.reshape(-1), dims=["grid_index"])
    write_zarr_array(
        zarr_path, "state", state, dims=["time", "grid_index", "state_feature"],
        chunks=[7, n_grid, N_STATE],
    )
    write_zarr_array(
        zarr_path, "forcing", forcing,
        dims=["time", "grid_index", "forcing_feature"],
        chunks=[7, n_grid, N_FORCING],
    )
    write_zarr_array(
        zarr_path, "static", static, dims=["grid_index", "static_feature"]
    )
    for cat, n in [("state", N_STATE), ("forcing", N_FORCING),
                   ("static", N_STATIC)]:
        names = np.array([f"{cat}_var_{i}" for i in range(n)], dtype=object)
        write_zarr_array(zarr_path, f"{cat}_feature", names,
                         dims=[f"{cat}_feature"], compressor=None)
        write_zarr_array(zarr_path, f"{cat}_feature_units",
                         np.array(["-"] * n, dtype=object),
                         dims=[f"{cat}_feature"], compressor=None)
        write_zarr_array(zarr_path, f"{cat}_feature_long_name",
                         np.array([f"long {x}" for x in names], dtype=object),
                         dims=[f"{cat}_feature"], compressor=None)

    # splits: train 0..17, val 18..23, test 24..29
    def tstr(i):
        return str(times[i].astype("datetime64[s]"))

    splits = np.array(
        [[tstr(0), tstr(17)], [tstr(18), tstr(23)], [tstr(24), tstr(29)]],
        dtype=object,
    )
    write_zarr_array(zarr_path, "splits", splits,
                     dims=["split_name", "split_part"], compressor=None)
    write_zarr_array(zarr_path, "split_name",
                     np.array(["train", "val", "test"], dtype=object),
                     dims=["split_name"], compressor=None)
    write_zarr_array(zarr_path, "split_part",
                     np.array(["start", "end"], dtype=object),
                     dims=["split_part"], compressor=None)

    # precomputed stats over the train range
    train = state[:18]
    write_zarr_array(zarr_path, "state__train__mean",
                     train.mean(axis=(0, 1)), dims=["state_feature"])
    write_zarr_array(zarr_path, "state__train__std",
                     train.std(axis=(0, 1)), dims=["state_feature"])
    diffs = np.diff(train, axis=0)
    write_zarr_array(zarr_path, "state__train__diff_mean",
                     diffs.mean(axis=(0, 1)), dims=["state_feature"])
    write_zarr_array(zarr_path, "state__train__diff_std",
                     diffs.std(axis=(0, 1)), dims=["state_feature"])
    write_zarr_array(zarr_path, "forcing__train__mean",
                     forcing[:18].mean(axis=(0, 1)), dims=["forcing_feature"])
    write_zarr_array(zarr_path, "forcing__train__std",
                     forcing[:18].std(axis=(0, 1)), dims=["forcing_feature"])
    consolidate_metadata(zarr_path)

    config = {
        "schema_version": "v0.5.0",
        "dataset_version": "v0.1.0",
        "inputs": {
            "danra_surface": {
                "path": "unused://",
                "dims": ["time", "x", "y"],
                "dim_mapping": {
                    "grid_index": {"method": "stack", "dims": ["x", "y"]},
                },
            },
        },
        "extra": {
            "projection": {
                "class_name": "LambertConformal",
                "kwargs": {"central_longitude": 25.0, "central_latitude": 56.7},
            },
        },
    }
    config_path = root / "danra.datastore.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    # zarr must look newer than config (reference warns otherwise)
    return config_path
