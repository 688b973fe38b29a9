"""MDP dataset *creation* from raw zarr sources (native mllam-data-prep
equivalent; ref: neural_lam/datastore/mdp.py:70-72 + the danra example
config ref: tests/datastore_examples/mdp/danra_100m_winds/)."""

import numpy as np
import pytest
import yaml

from neural_lam_tpu.dataset import WeatherDataset
from neural_lam_tpu.datastore.create_dataset import create_dataset
from neural_lam_tpu.datastore.mdp import MDPDatastore
from neural_lam_tpu.datastore.zarr_reader import (
    ZarrGroup,
    consolidate_metadata,
    write_zarr_array,
)

NX, NY, N_T = 8, 6, 20
ALTS = [50.0, 100.0, 200.0]


def _write_sources(root, rng):
    """Raw source zarrs shaped like the danra example: height-level winds
    (u, v over altitude), a surface forcing field, and a static mask."""
    times = np.datetime64("2020-01-01T00", "ns") + np.arange(
        N_T
    ) * np.timedelta64(3, "h")
    x = np.arange(NX, dtype=np.float64) * 1000.0
    y = np.arange(NY, dtype=np.float64) * 1000.0

    hl = root / "height_levels.zarr"
    hl.mkdir(parents=True)
    write_zarr_array(hl, "time", times, dims=["time"])
    write_zarr_array(hl, "x", x, dims=["x"])
    write_zarr_array(hl, "y", y, dims=["y"])
    write_zarr_array(hl, "altitude", np.array(ALTS), dims=["altitude"])
    u = rng.normal(size=(N_T, NX, NY, len(ALTS))).astype(np.float32)
    v = rng.normal(size=(N_T, NX, NY, len(ALTS))).astype(np.float32)
    for name, arr in [("u", u), ("v", v)]:
        write_zarr_array(
            hl, name, arr, dims=["time", "x", "y", "altitude"],
            chunks=[5, NX, NY, len(ALTS)],
            attrs={"units": "m/s", "long_name": f"{name}-wind"},
        )
    consolidate_metadata(hl)

    sl = root / "single_levels.zarr"
    sl.mkdir(parents=True)
    write_zarr_array(sl, "time", times, dims=["time"])
    write_zarr_array(sl, "x", x, dims=["x"])
    write_zarr_array(sl, "y", y, dims=["y"])
    rad = rng.normal(size=(N_T, NX, NY)).astype(np.float32)
    write_zarr_array(sl, "swavr0m", rad, dims=["time", "x", "y"],
                     chunks=[5, NX, NY], attrs={"units": "W/m^2"})
    consolidate_metadata(sl)

    lsm_store = root / "lsm.zarr"
    lsm_store.mkdir(parents=True)
    write_zarr_array(lsm_store, "x", x, dims=["x"])
    write_zarr_array(lsm_store, "y", y, dims=["y"])
    lsm = (rng.uniform(size=(NX, NY)) > 0.5).astype(np.float32)
    write_zarr_array(lsm_store, "lsm", lsm, dims=["x", "y"],
                     attrs={"units": "-", "long_name": "land-sea mask"})
    consolidate_metadata(lsm_store)
    return times, u, v, rad, lsm


def _write_config(root, times):
    def tstr(i):
        return str(times[i].astype("datetime64[s]"))

    config = {
        "schema_version": "v0.5.0",
        "dataset_version": "v0.1.0",
        "output": {
            "variables": {
                "static": ["grid_index", "static_feature"],
                "state": ["time", "grid_index", "state_feature"],
                "forcing": ["time", "grid_index", "forcing_feature"],
            },
            "coord_ranges": {
                "time": {"start": tstr(2), "end": tstr(17), "step": "PT3H"},
            },
            "chunking": {"time": 4},
            "splitting": {
                "dim": "time",
                "splits": {
                    "train": {
                        "start": tstr(2), "end": tstr(11),
                        "compute_statistics": {
                            "ops": ["mean", "std", "diff_mean", "diff_std"],
                            "dims": ["grid_index", "time"],
                        },
                    },
                    "val": {"start": tstr(12), "end": tstr(14)},
                    "test": {"start": tstr(15), "end": tstr(17)},
                },
            },
        },
        "inputs": {
            "danra_height_levels": {
                "path": str(root / "height_levels.zarr"),
                "dims": ["time", "x", "y", "altitude"],
                "variables": {
                    "u": {"altitude": {"values": [100], "units": "m"}},
                    "v": {"altitude": {"values": [100], "units": "m"}},
                },
                "dim_mapping": {
                    "time": {"method": "rename", "dim": "time"},
                    "state_feature": {
                        "method": "stack_variables_by_var_name",
                        "dims": ["altitude"],
                        "name_format": "{var_name}{altitude}m",
                    },
                    "grid_index": {"method": "stack", "dims": ["x", "y"]},
                },
                "target_output_variable": "state",
            },
            "danra_surface": {
                "path": str(root / "single_levels.zarr"),
                "dims": ["time", "x", "y"],
                "variables": ["swavr0m"],
                "dim_mapping": {
                    "time": {"method": "rename", "dim": "time"},
                    "grid_index": {"method": "stack", "dims": ["x", "y"]},
                    "forcing_feature": {
                        "method": "stack_variables_by_var_name",
                        "name_format": "{var_name}",
                    },
                },
                "target_output_variable": "forcing",
            },
            "danra_lsm": {
                "path": str(root / "lsm.zarr"),
                "dims": ["x", "y"],
                "variables": ["lsm"],
                "dim_mapping": {
                    "grid_index": {"method": "stack", "dims": ["x", "y"]},
                    "static_feature": {
                        "method": "stack_variables_by_var_name",
                        "name_format": "{var_name}",
                    },
                },
                "target_output_variable": "static",
            },
        },
        "extra": {
            "projection": {
                "class_name": "LambertConformal",
                "kwargs": {"central_longitude": 25.0,
                           "central_latitude": 56.7},
            },
        },
    }
    config_path = root / "danra.datastore.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    return config_path


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("mdp_create")
    rng = np.random.default_rng(7)
    times, u, v, rad, lsm = _write_sources(root, rng)
    config_path = _write_config(root, times)
    out = create_dataset(config_path)
    return root, config_path, out, times, u, v, rad, lsm


def test_output_values_and_layout(built):
    """state = (u100, v100) stacked x-major, time-sliced to coord_ranges."""
    _, _, out, times, u, v, rad, lsm = built
    g = ZarrGroup(out)
    state = g["state"].read_full()
    # coord_ranges selects times[2..17]; altitude 100 m is index 1
    assert state.shape == (16, NX * NY, 2)
    exp_u = u[2:18, :, :, 1].reshape(16, NX * NY)  # x-major flatten
    exp_v = v[2:18, :, :, 1].reshape(16, NX * NY)
    np.testing.assert_allclose(state[..., 0], exp_u, atol=1e-6)
    np.testing.assert_allclose(state[..., 1], exp_v, atol=1e-6)
    assert [str(s) for s in g["state_feature"].read_full()] == \
        ["u100m", "v100m"]
    assert [str(s) for s in g["state_feature_units"].read_full()] == \
        ["m/s", "m/s"]
    forcing = g["forcing"].read_full()
    np.testing.assert_allclose(
        forcing[..., 0], rad[2:18].reshape(16, NX * NY), atol=1e-6
    )
    static = g["static"].read_full()
    np.testing.assert_allclose(static[:, 0], lsm.reshape(-1), atol=1e-6)
    # time chunking honored
    assert g["state"].chunks[0] == 4


def test_statistics_match_numpy(built):
    _, _, out, times, u, v, rad, _ = built
    g = ZarrGroup(out)
    # train split = times[2..11] -> rows 0..9 of the sliced arrays
    tr_u = u[2:12, :, :, 1].reshape(10, -1).astype(np.float64)
    np.testing.assert_allclose(
        g["state__train__mean"].read_full(),
        [tr_u.mean(), v[2:12, :, :, 1].astype(np.float64).mean()],
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        g["state__train__std"].read_full()[0], tr_u.std(), rtol=1e-5
    )
    diffs = np.diff(tr_u.reshape(10, -1), axis=0)
    np.testing.assert_allclose(
        g["state__train__diff_mean"].read_full()[0], diffs.mean(), rtol=1e-4,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        g["state__train__diff_std"].read_full()[0], diffs.std(), rtol=1e-5
    )
    assert "forcing__train__mean" in g


def test_mdp_datastore_over_created(built):
    _, config_path, _, _, _, _, _, _ = built
    ds = MDPDatastore(config_path=config_path, n_boundary_points=1)
    assert ds.grid_shape_state.x == NX and ds.grid_shape_state.y == NY
    assert ds.get_vars_names("state") == ["u100m", "v100m"]
    assert ds.step_length == 3
    da = ds.get_dataarray("state", "train")
    assert da.shape == (10, NX * NY, 2)
    stats = ds.get_standardization_dataarray("state")
    assert stats["state_mean"].shape == (2,)
    wds = WeatherDataset(ds, split="train", ar_steps=2)
    init_states, target_states, forcing, _ = wds[0]
    assert init_states.shape == (2, NX * NY, 2)
    assert np.isfinite(init_states).all()


def test_autocreate_on_first_use(built, tmp_path):
    """MDPDatastore creates the zarr from raw inputs when it is missing
    (the reference's first-use behavior, ref: mdp.py:70-72)."""
    root, config_path, _, times, *_ = built
    import shutil

    new_root = tmp_path / "store"
    shutil.copytree(root, new_root, ignore=shutil.ignore_patterns(
        "danra.datastore.zarr"
    ))
    # input paths in the copied config still point at the original root's
    # sources — rewrite them
    with open(new_root / "danra.datastore.yaml") as f:
        cfg = yaml.safe_load(f)
    for spec in cfg["inputs"].values():
        spec["path"] = spec["path"].replace(str(root), str(new_root))
    with open(new_root / "danra.datastore.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    ds = MDPDatastore(config_path=new_root / "danra.datastore.yaml")
    assert (new_root / "danra.datastore.zarr").exists()
    assert ds.get_vars_names("state") == ["u100m", "v100m"]


def test_compression_none_identical_values(built, tmp_path):
    """--compression none writes raw (training-ready) chunks with
    byte-identical array contents to the default lz4 output."""
    root, config_path, out, *_ = built
    import shutil

    new_root = tmp_path / "raw"
    shutil.copytree(root, new_root, ignore=shutil.ignore_patterns(
        "danra.datastore.zarr"
    ))
    with open(new_root / "danra.datastore.yaml") as f:
        cfg = yaml.safe_load(f)
    for spec in cfg["inputs"].values():
        spec["path"] = spec["path"].replace(str(root), str(new_root))
    with open(new_root / "danra.datastore.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    out_raw = create_dataset(new_root / "danra.datastore.yaml",
                             compression="none")
    g_lz4, g_raw = ZarrGroup(out), ZarrGroup(out_raw)
    for name in ["state", "forcing", "static", "state__train__mean"]:
        np.testing.assert_array_equal(
            g_raw[name].read_full(), g_lz4[name].read_full()
        )
    assert g_raw["state"].compressor is None
    assert g_lz4["state"].compressor is not None
    with pytest.raises(ValueError, match="unknown compression"):
        create_dataset(new_root / "danra.datastore.yaml",
                       compression="gzip9", force=True)


def test_remote_path_rejected(built, tmp_path):
    root, config_path, _, _, _, _, _, _ = built
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["inputs"]["danra_surface"]["path"] = "https://example.com/x.zarr"
    bad = tmp_path / "bad.datastore.yaml"
    with open(bad, "w") as f:
        yaml.safe_dump(cfg, f)
    with pytest.raises(ValueError, match="egress"):
        create_dataset(bad)
