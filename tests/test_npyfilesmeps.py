"""MEPS npy-files datastore: loading, forcing features, stats tool, and a
model forward on forecast-type ensemble data."""

import numpy as np
import pytest
import torch

from neural_lam_tpu.dataset import WeatherDataset
from neural_lam_tpu.datastore.compute_standardization_stats import main as stats_main
from neural_lam_tpu.datastore.npyfilesmeps import NpyFilesDatastoreMEPS

from .meps_fixture import (
    NX, NY, N_T, N_MEMBERS, REMOVE_IDX, VAR_NAMES, make_meps_dataset,
)


@pytest.fixture(scope="module")
def meps(tmp_path_factory):
    root = tmp_path_factory.mktemp("meps")
    config_path = make_meps_dataset(root)
    stats_main(config_path, step_length=2)
    return NpyFilesDatastoreMEPS(config_path=config_path)


def test_basic_properties(meps):
    assert meps.is_forecast and meps.is_ensemble
    assert meps.num_grid_points == NX * NY
    assert meps.grid_shape_state.x == NX
    assert meps.grid_shape_state.y == NY
    assert meps.get_vars_names("state") == VAR_NAMES
    assert meps.get_num_data_vars("forcing") == 6
    assert meps.get_num_data_vars("static") == 4
    assert meps.step_length == 1
    xy = meps.get_xy("state", stacked=True)
    assert xy.shape == (NX * NY, 2)
    # x-major stacking: consecutive entries share x, vary y
    assert xy[0, 0] == xy[1, 0]
    assert xy[0, 1] != xy[1, 1]


def test_state_dataarray(meps):
    da = meps.get_dataarray("state", "train")
    assert da.dims == ("analysis_time", "elapsed_forecast_duration",
                       "ensemble_member", "grid_index", "state_feature")
    A = len(da.coords["analysis_time"])
    assert A == 3
    d_state = len(VAR_NAMES)
    assert da.shape == (A, N_T, N_MEMBERS, NX * NY, d_state)
    block = da.isel(analysis_time=0)
    assert block.values.shape == (N_T, N_MEMBERS, NX * NY, d_state)
    # feature removal applied: check against the raw file
    raw = np.load(
        meps.root_path / "samples" / "train" / "nwp_2022040100_mbr000.npy"
    )
    keep = [i for i in range(raw.shape[-1]) if i not in REMOVE_IDX]
    # grid_index is x-major: grid g = ix*NY + iy <-> raw[t, iy, ix]
    np.testing.assert_allclose(
        block.values[0, 0, 3 * NY + 2, :], raw[0, 2, 3, keep], rtol=1e-6
    )


def test_forcing_features(meps):
    da = meps.get_dataarray("forcing", "val")
    assert da.dims == ("analysis_time", "elapsed_forecast_duration",
                       "grid_index", "forcing_feature")
    vals = da.isel(analysis_time=0).values
    assert vals.shape == (N_T, NX * NY, 6)
    # datetime features in [0, 1] and constant across grid
    dt_feats = vals[:, :, 2:]
    assert dt_feats.min() >= 0.0 and dt_feats.max() <= 1.0
    assert np.allclose(dt_feats[:, 0], dt_feats[:, -1])
    # analysis 2022060500: hour 0 -> sin=0.5, cos=1.0 rescaled
    np.testing.assert_allclose(dt_feats[0, 0, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(dt_feats[0, 0, 1], 1.0, atol=1e-6)
    # open water constant across time
    np.testing.assert_allclose(vals[0, :, 1], vals[-1, :, 1])


def test_static_and_boundary(meps):
    da = meps.get_dataarray("static", None)
    assert da.dims == ("grid_index", "static_feature")
    assert da.shape == (NX * NY, 4)
    # last two static features are x, y
    np.testing.assert_allclose(da.values[:, 2:], meps.get_xy("state", True))
    mask = meps.boundary_mask.values
    assert set(np.unique(mask)) == {0.0, 1.0}
    assert mask.sum() == 2 * NX + 2 * NY - 4


def test_standardization_stats(meps):
    stats = meps.get_standardization_dataarray("state")
    d = len(VAR_NAMES)
    for k in ("state_mean", "state_std", "state_diff_mean", "state_diff_std"):
        assert stats[k].shape == (d,)
    assert np.all(stats["state_std"] > 0)
    assert np.all(stats["state_diff_std"] > 0)
    # raw data is N(0,1) -> means near 0, stds near 1
    assert np.all(np.abs(stats["state_mean"]) < 0.2)
    assert np.all(np.abs(stats["state_std"] - 1.0) < 0.2)
    fstats = meps.get_standardization_dataarray("forcing")
    assert fstats["forcing_mean"].shape == (6,)
    assert fstats["forcing_std"][1] == 1.0  # open water unscaled


def test_weather_dataset_on_forecast_data(meps):
    with pytest.warns(UserWarning):
        ds = WeatherDataset(meps, split="train", ar_steps=3)
        n = len(ds)
    assert n == 3  # one sample per analysis time
    init_states, target_states, forcing, times = ds[0]
    assert init_states.shape == (2, NX * NY, len(VAR_NAMES))
    assert target_states.shape == (3, NX * NY, len(VAR_NAMES))
    assert forcing.shape == (3, NX * NY, 6 * 3)
    assert times.shape == (3,)
    assert np.all(np.isfinite(init_states))


def test_graph_and_model_on_meps(meps, tmp_path):
    import jax
    import jax.numpy as jnp

    from neural_lam_tpu.config import (
        DatastoreSelection, NeuralLAMConfig, TrainingConfig,
    )
    from neural_lam_tpu.dataset import collate
    from neural_lam_tpu.graph.build import create_graph
    from neural_lam_tpu.graph.storage import graph_from_bundle
    from neural_lam_tpu.models import MODELS
    from neural_lam_tpu.models.ar_model import ModelArgs

    graph = graph_from_bundle(create_graph(
        str(tmp_path / "g"), meps.get_xy("state", stacked=False),
        n_max_levels=1, hierarchical=False,
    ))
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="npyfilesmeps", config_path=""),
        training=TrainingConfig(),
    )
    args = ModelArgs(hidden_dim=4, processor_layers=1)
    model = MODELS["graph_lam"](args, config, meps, graph)
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.warns(UserWarning):
        ds = WeatherDataset(meps, split="train", ar_steps=2)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0]]))
    loss = model.training_loss(params, batch)
    assert np.isfinite(float(loss))


def test_stats_workers_identical(tmp_path):
    """--n_workers maps samples over a thread pool but reduces in sample
    order: outputs must be BIT-identical to the serial pass."""
    root_a = tmp_path / "a"
    root_b = tmp_path / "b"
    cfg_a = make_meps_dataset(root_a, seed=3)
    cfg_b = make_meps_dataset(root_b, seed=3)
    stats_main(cfg_a, step_length=2, n_workers=1)
    stats_main(cfg_b, step_length=2, n_workers=4)
    for name in ["parameter_mean.pt", "parameter_std.pt", "flux_stats.pt",
                 "diff_mean.pt", "diff_std.pt"]:
        a = torch.load(cfg_a.parent / "static" / name, weights_only=True)
        b = torch.load(cfg_b.parent / "static" / name, weights_only=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stats_sharded_matches_single(tmp_path):
    """Multi-node mode (--num_shards/--shard_id): strided shards reduce to
    float64 partials, the last shard merges — final stats match the
    single-process pass to fp tolerance (the float64 partial sums and the
    raw-diff/std reformulation reorder float ops)."""
    root_a = tmp_path / "a"
    root_b = tmp_path / "b"
    cfg_a = make_meps_dataset(root_a, seed=5)
    cfg_b = make_meps_dataset(root_b, seed=5)
    stats_main(cfg_a, step_length=2)
    for shard in (1, 0, 2):  # any completion order; last one merges
        stats_main(cfg_b, step_length=2, num_shards=3, shard_id=shard)
    for name in ["parameter_mean.pt", "parameter_std.pt", "flux_stats.pt",
                 "diff_mean.pt", "diff_std.pt"]:
        a = torch.load(cfg_a.parent / "static" / name, weights_only=True)
        b = torch.load(cfg_b.parent / "static" / name, weights_only=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6, err_msg=name)
