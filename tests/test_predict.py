"""Inference CLI (neural_lam_tpu.predict): checkpoint -> forecast zarr."""

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from neural_lam_tpu.checkpoint import save_checkpoint
from neural_lam_tpu.config import (
    DatastoreSelection, NeuralLAMConfig, TrainingConfig,
)
from neural_lam_tpu.dataset import WeatherDataset, collate
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.datastore.zarr_reader import ZarrGroup
from neural_lam_tpu.graph.build import create_graph
from neural_lam_tpu.models import MODELS
from neural_lam_tpu.models.ar_model import ModelArgs, jit_model_method
from neural_lam_tpu.predict import main as predict_main


def _setup(tmp_path, model_name="graph_lam", **margs):
    root = tmp_path / "ds"
    root.mkdir(exist_ok=True)
    with open(tmp_path / "dummy.yaml", "w") as f:
        yaml.safe_dump({"n_points_1d": 10, "n_timesteps": 40,
                        "root": str(root)}, f)
    cfg = tmp_path / "config.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump({"datastore": {"kind": "dummydata",
                                      "config_path": str(tmp_path / "dummy.yaml")}},
                       f)
    ds = DummyDatastore(config_path=tmp_path / "dummy.yaml")
    graph = create_graph(str(ds.root_path / "graph" / "g1"),
                         ds.get_xy("state", stacked=False), n_max_levels=1,
                         hierarchical=False)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata",
                                     config_path=str(tmp_path / "dummy.yaml")),
        training=TrainingConfig(),
    )
    args = ModelArgs(graph="g1", hidden_dim=8, processor_layers=1, **margs)
    model = MODELS[model_name](args, config, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "ckpt", "best", params, meta={"step": 7})
    return cfg, ds, model, params


def test_predict_cli_deterministic(tmp_path):
    cfg, ds, model, params = _setup(tmp_path)
    out = tmp_path / "forecast.zarr"
    predict_main([
        "--config_path", str(cfg), "--model", "graph_lam", "--graph", "g1",
        "--hidden_dim", "8", "--processor_layers", "1",
        "--load", str(tmp_path / "ckpt" / "best"),
        "--ar_steps", "3", "--split", "test", "--sample_idx", "0",
        "--out", str(out),
    ])
    g = ZarrGroup(out)
    pred = g["state"].read_full()
    n = ds.num_grid_points
    d = ds.get_num_data_vars("state")
    assert pred.shape == (3, n, d)
    assert np.all(np.isfinite(pred))
    names = list(g["state_feature"].read_full())
    assert names == list(ds.get_vars_names("state"))
    assert g["time"].read_full().shape == (3,)

    # values = un-standardized rollout of the same sample
    w = WeatherDataset(ds, split="test", ar_steps=3)
    batch = tuple(jnp.asarray(b) for b in collate([w[0]]))
    unroll = jit_model_method(model, "unroll_prediction")
    ref, _ = unroll(params, batch[0], batch[2], batch[1])
    stats = ds.get_standardization_dataarray(category="state")
    ref = np.asarray(ref[0]) * np.asarray(stats["state_std"]) \
        + np.asarray(stats["state_mean"])
    np.testing.assert_allclose(pred, ref, atol=1e-5)


def test_predict_cli_ensemble_npz(tmp_path):
    cfg, ds, model, params = _setup(tmp_path, model_name="graph_efm",
                                    latent_dim=4)
    out = tmp_path / "forecast.npz"
    predict_main([
        "--config_path", str(cfg), "--model", "graph_efm", "--graph", "g1",
        "--hidden_dim", "8", "--processor_layers", "1", "--latent_dim", "4",
        "--load", str(tmp_path / "ckpt" / "best"),
        "--ar_steps", "2", "--ensemble_members", "3",
        "--out", str(out),
    ])
    z = np.load(out, allow_pickle=True)
    n = ds.num_grid_points
    d = ds.get_num_data_vars("state")
    assert z["state"].shape == (3, 2, n, d)
    assert np.all(np.isfinite(z["state"]))
    # members differ in the interior
    assert z["state"].std(axis=0).max() > 0


def test_predict_times_not_truncated(tmp_path):
    """Valid-time stamps stay int64 ns (jnp.asarray would truncate them
    to int32 under the default x64-disabled config)."""
    cfg, ds, model, params = _setup(tmp_path)
    out = tmp_path / "f.zarr"
    predict_main([
        "--config_path", str(cfg), "--model", "graph_lam", "--graph", "g1",
        "--hidden_dim", "8", "--processor_layers", "1",
        "--load", str(tmp_path / "ckpt" / "best"),
        "--ar_steps", "3", "--split", "test", "--sample_idx", "0",
        "--out", str(out),
    ])
    t = ZarrGroup(out)["time"].read_full().astype("datetime64[ns]")
    w = WeatherDataset(ds, split="test", ar_steps=3)
    expected = w[0][3].astype("datetime64[ns]")
    np.testing.assert_array_equal(t, expected)
    assert t[0] > np.datetime64("2020-01-01"), t
    assert np.all(np.diff(t) > np.timedelta64(0, "ns"))


def test_export_roundtrip(tmp_path):
    """Exported StableHLO artifact reproduces predict_step exactly."""
    from neural_lam_tpu.export import load_exported, main as export_main

    cfg, ds, model, params = _setup(tmp_path)
    out = tmp_path / "model.jaxexp"
    export_main([
        "--config_path", str(cfg), "--model", "graph_lam", "--graph", "g1",
        "--hidden_dim", "8", "--processor_layers", "1",
        "--load", str(tmp_path / "ckpt" / "best"),
        "--batch_size", "2", "--out", str(out),
    ])
    assert out.exists() and out.with_suffix(".jaxexp.json").exists()
    import json as _json

    meta = _json.loads(out.with_suffix(".jaxexp.json").read_text())
    assert meta["n_grid"] == ds.num_grid_points
    step = load_exported(out)

    w = WeatherDataset(ds, split="test", ar_steps=2)
    batch = tuple(jnp.asarray(b) for b in collate([w[0], w[1]]))
    init_states, _, forcing, _ = batch
    got, _ = step(init_states[:, 1], init_states[:, 0], forcing[:, 0])
    ref, _ = jax.jit(model.predict_step)(
        params, init_states[:, 1], init_states[:, 0], forcing[:, 0]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
