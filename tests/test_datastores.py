"""Datastore contract tests, parametrized over every registered datastore
(ref: tests/test_datastores.py — one test per abstract method/property).

The expected interface:
- `root_path`, `config`, `step_length` properties
- `get_vars_units/names/long_names`, `get_num_data_vars` per category
- `get_standardization_dataarray` with {category}_mean/std (+ state diffs)
- `get_dataarray(category, split)` in expected_dim_order
- `boundary_mask` with values in {0, 1}
- `get_xy`, `get_xy_extent`, `num_grid_points`
- regular-grid stores: `grid_shape_state`, stack/unstack round-trip
"""

from pathlib import Path

import numpy as np
import pytest

from neural_lam_tpu.datastore import DATASTORES
from neural_lam_tpu.datastore.base import BaseRegularGridDatastore

from .mdp_fixture import make_mdp_dataset
from .meps_fixture import make_meps_dataset

DATASTORE_NAMES = sorted(DATASTORES.keys())


@pytest.fixture(scope="module")
def stores(tmp_path_factory):
    from neural_lam_tpu.datastore.compute_standardization_stats import (
        main as stats_main,
    )

    out = {}
    mdp_cfg = make_mdp_dataset(tmp_path_factory.mktemp("mdp"))
    out["mdp"] = DATASTORES["mdp"](config_path=mdp_cfg, n_boundary_points=2)
    meps_cfg = make_meps_dataset(tmp_path_factory.mktemp("meps"))
    stats_main(meps_cfg, step_length=2)
    out["npyfilesmeps"] = DATASTORES["npyfilesmeps"](config_path=meps_cfg)
    out["dummydata"] = DATASTORES["dummydata"](n_points_1d=10, n_timesteps=20)
    out["dummydata_global"] = DATASTORES["dummydata_global"](
        n_lon=12, n_lat=8, n_timesteps=20
    )
    return out


@pytest.mark.parametrize("datastore_name", DATASTORE_NAMES)
def test_root_path_and_config(stores, datastore_name):
    ds = stores[datastore_name]
    assert isinstance(ds.root_path, Path)
    assert ds.config is not None
    assert isinstance(ds.step_length, int) and ds.step_length > 0


@pytest.mark.parametrize("datastore_name", DATASTORE_NAMES)
@pytest.mark.parametrize("category", ["state", "forcing", "static"])
def test_vars_metadata(stores, datastore_name, category):
    ds = stores[datastore_name]
    names = ds.get_vars_names(category)
    units = ds.get_vars_units(category)
    long_names = ds.get_vars_long_names(category)
    assert len(names) == len(units) == len(long_names)
    assert ds.get_num_data_vars(category) == len(names)
    assert all(isinstance(n, str) for n in names)


@pytest.mark.parametrize("datastore_name", DATASTORE_NAMES)
def test_standardization(stores, datastore_name):
    ds = stores[datastore_name]
    for category in ("state", "forcing"):
        if ds.get_num_data_vars(category) == 0:
            continue
        stats = ds.get_standardization_dataarray(category)
        d = ds.get_num_data_vars(category)
        assert stats[f"{category}_mean"].shape == (d,)
        assert stats[f"{category}_std"].shape == (d,)
        if category == "state":
            assert stats["state_diff_mean"].shape == (d,)
            assert stats["state_diff_std"].shape == (d,)


@pytest.mark.parametrize("datastore_name", DATASTORE_NAMES)
@pytest.mark.parametrize("category", ["state", "forcing", "static"])
@pytest.mark.parametrize("split", ["train", "val", "test"])
def test_dataarrays(stores, datastore_name, category, split):
    ds = stores[datastore_name]
    da = ds.get_dataarray(
        category, split=None if category == "static" else split
    )
    if da is None:
        assert category == "forcing"
        return
    expected = ds.expected_dim_order(category)
    assert da.dims == expected
    assert da.shape[da.dims.index("grid_index")] == ds.num_grid_points
    assert da.shape[-1] == ds.get_num_data_vars(category)
    if "time" in da.dims:
        assert "time" in da.coords
        assert len(da.coords["time"]) == da.sizes()["time"]


@pytest.mark.parametrize("datastore_name", DATASTORE_NAMES)
def test_boundary_mask(stores, datastore_name):
    ds = stores[datastore_name]
    mask = ds.boundary_mask.values
    assert mask.reshape(-1).shape == (ds.num_grid_points,)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    if getattr(ds, "is_global", False):
        # global domains have no LAM boundary
        assert mask.sum() == 0
    else:
        assert 0 < mask.sum() < ds.num_grid_points


@pytest.mark.parametrize("datastore_name", DATASTORE_NAMES)
def test_xy_and_extent(stores, datastore_name):
    ds = stores[datastore_name]
    xy = ds.get_xy("state")
    assert xy.shape == (ds.num_grid_points, 2)
    xmin, xmax, ymin, ymax = ds.get_xy_extent("state")
    assert xmin < xmax and ymin < ymax


@pytest.mark.parametrize("datastore_name", DATASTORE_NAMES)
def test_regular_grid_semantics(stores, datastore_name):
    ds = stores[datastore_name]
    if not isinstance(ds, BaseRegularGridDatastore):
        pytest.skip("not a regular grid datastore")
    gs = ds.grid_shape_state
    assert gs.x * gs.y == ds.num_grid_points
    unstacked = ds.get_xy("state", stacked=False)
    assert unstacked.shape == (gs.x, gs.y, 2)
    stacked = ds.get_xy("state", stacked=True)
    np.testing.assert_array_equal(unstacked.reshape(-1, 2), stacked)
    # stack/unstack round-trip on arbitrary data
    rng = np.random.default_rng(0)
    arr2d = rng.normal(size=(gs.x, gs.y, 3))
    stacked_arr = ds.stack_grid_coords(arr2d)
    assert stacked_arr.shape == (ds.num_grid_points, 3)
    np.testing.assert_array_equal(ds.unstack_grid_coords(stacked_arr), arr2d)


@pytest.mark.parametrize("datastore_name", DATASTORE_NAMES)
def test_projection(stores, datastore_name):
    ds = stores[datastore_name]
    proj = ds.coords_projection
    assert isinstance(proj, dict) and "name" in proj
