"""End-to-end model tests: graph build + forward + rollout + grad for all
three model families on the dummy datastore (mirrors the reference's cheap
model-correctness test, ref: tests/test_datasets.py:161-222)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.config import (
    DatastoreSelection,
    NeuralLAMConfig,
    TrainingConfig,
)
from neural_lam_tpu.dataset import WeatherDataLoader, WeatherDataset, collate
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graph.build import create_graph
from neural_lam_tpu.graph.storage import graph_from_bundle
from neural_lam_tpu.models import MODELS
from neural_lam_tpu.models.ar_model import ModelArgs


@pytest.fixture(scope="module")
def datastore():
    return DummyDatastore(n_points_1d=30, n_timesteps=40)


@pytest.fixture(scope="module")
def nl_config():
    return NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )


def _graph(datastore, tmp_path, hierarchical):
    xy = datastore.get_xy("state", stacked=False)
    bundle = create_graph(
        str(tmp_path / ("hier" if hierarchical else "flat")),
        xy, n_max_levels=2 if hierarchical else None,
        hierarchical=hierarchical,
    )
    return graph_from_bundle(bundle)


@pytest.mark.parametrize("model_name", ["graph_lam", "hi_lam", "hi_lam_parallel"])
def test_model_forward_rollout_grad(model_name, datastore, nl_config, tmp_path):
    hierarchical = model_name != "graph_lam"
    graph = _graph(datastore, tmp_path, hierarchical)
    args = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=2)
    model = MODELS[model_name](args, nl_config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))

    ds = WeatherDataset(datastore, split="train", ar_steps=3)
    batch = collate([ds[0], ds[1]])
    batch = tuple(jnp.asarray(b) for b in batch)
    init_states, target_states, forcing, times = batch
    B, T, N, d = target_states.shape
    assert init_states.shape == (B, 2, N, d)

    # single predict step
    new_state, pred_std = model.predict_step(
        params, init_states[:, 1], init_states[:, 0], forcing[:, 0]
    )
    assert new_state.shape == (B, N, d)
    assert pred_std is None
    assert np.all(np.isfinite(np.asarray(new_state)))

    # full rollout under jit
    @jax.jit
    def loss(p, batch):
        return model.training_loss(p, batch)

    val = loss(params, batch)
    assert np.isfinite(float(val))

    g = jax.grad(loss)(params, batch)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_output_std_head(datastore, nl_config, tmp_path):
    graph = _graph(datastore, tmp_path, hierarchical=False)
    args = ModelArgs(hidden_dim=8, processor_layers=1, output_std=True,
                     loss="nll")
    model = MODELS["graph_lam"](args, nl_config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))
    ds = WeatherDataset(datastore, split="train", ar_steps=2)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0]]))
    prediction, target, pred_std, _ = model.common_step(params, batch)
    assert pred_std.shape == prediction.shape
    assert np.all(np.asarray(pred_std) > 0)
    val = model.training_loss(params, batch)
    assert np.isfinite(float(val))


def test_eval_step_metrics(datastore, nl_config, tmp_path):
    graph = _graph(datastore, tmp_path, hierarchical=False)
    args = ModelArgs(hidden_dim=8, processor_layers=1)
    model = MODELS["graph_lam"](args, nl_config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))
    ds = WeatherDataset(datastore, split="val", ar_steps=3)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0]]))
    out = jax.jit(model.eval_step_metrics)(params, batch)
    T, d = 3, datastore.get_num_data_vars("state")
    N = datastore.num_grid_points
    assert out["time_step_loss"].shape == (1, T)
    assert out["mse"].shape == (1, T, d)
    assert out["spatial_loss"].shape == (1, T, N)


def test_dataloader_shapes(datastore):
    ds = WeatherDataset(datastore, split="train", ar_steps=2)
    dl = WeatherDataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(dl)
    assert len(batches) == len(ds) // 2
    for init_states, target_states, forcing, times in batches:
        assert init_states.shape[0] == 2
        assert target_states.shape[1] == 2
    # sharded loaders partition batches disjointly
    dl0 = WeatherDataLoader(ds, batch_size=2, shard=(2, 0))
    dl1 = WeatherDataLoader(ds, batch_size=2, shard=(2, 1))
    assert len(dl0) == len(dl) // 2
    b0 = [b[3].tolist() for b in dl0]
    b1 = [b[3].tolist() for b in dl1]
    assert b0 != b1


def test_create_dataarray_round_trip(datastore):
    """tensor -> FieldArray inverse of __getitem__
    (ref: tests/test_datasets.py:84-156)."""
    ds = WeatherDataset(datastore, split="train", ar_steps=2)
    init_states, target_states, forcing, times = ds[0]
    da = ds.create_dataarray_from_tensor(
        target_states, times.astype("datetime64[ns]"), category="state"
    )
    assert da.dims == ("time", "grid_index", "state_feature")
    assert da.shape == target_states.shape
    np.testing.assert_array_equal(da.values, target_states)
    assert list(da.coords["state_feature"]) == datastore.get_vars_names("state")
    # single-time 2D variant
    da2 = ds.create_dataarray_from_tensor(
        target_states[0], times[0].astype("datetime64[ns]"), category="state"
    )
    assert da2.dims == ("grid_index", "state_feature")
    # unstack through the datastore to the 2D grid
    grid2d = datastore.unstack_grid_coords(da2.values[:, 0])
    assert grid2d.shape == (datastore.grid_shape_state.x,
                            datastore.grid_shape_state.y)


def test_graph_lam_predict_interpret_vs_off(datastore, nl_config, tmp_path):
    """The exact code path the TPU runs (fused Pallas kernels, interpreted)
    matches the plain XLA path through a full GraphLAM predict_step and
    training grad."""
    import neural_lam_tpu.ops.message_passing as mp

    graph = _graph(datastore, tmp_path, hierarchical=False)
    args = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=2)
    model = MODELS["graph_lam"](args, nl_config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(3))

    ds = WeatherDataset(datastore, split="train", ar_steps=2)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0], ds[1]]))
    init_states, _, forcing, _ = batch

    old_mode = mp._PALLAS_MODE
    try:
        mp._PALLAS_MODE = "off"
        out_off, _ = model.predict_step(
            params, init_states[:, 1], init_states[:, 0], forcing[:, 0]
        )
        loss_off = model.training_loss(params, batch)
        g_off = jax.grad(model.training_loss)(params, batch)

        mp._PALLAS_MODE = "interpret"
        out_int, _ = model.predict_step(
            params, init_states[:, 1], init_states[:, 0], forcing[:, 0]
        )
        loss_int = model.training_loss(params, batch)
        g_int = jax.grad(model.training_loss)(params, batch)
    finally:
        mp._PALLAS_MODE = old_mode

    np.testing.assert_allclose(np.asarray(out_int), np.asarray(out_off),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(loss_int), float(loss_off), rtol=1e-5)
    la, lb = jax.tree_util.tree_leaves(g_off), jax.tree_util.tree_leaves(g_int)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3,
                                   rtol=1e-3)


def test_bf16_rollout_tolerance(datastore, nl_config, tmp_path):
    """bf16 compute path (the TPU bench headline) stays within ~2% relative
    error of fp32 over a 4-step rollout."""
    graph = _graph(datastore, tmp_path, hierarchical=False)
    args32 = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=2)
    args16 = dataclasses.replace(args32, compute_dtype="bfloat16")
    model32 = MODELS["graph_lam"](args32, nl_config, datastore, graph)
    model16 = MODELS["graph_lam"](args16, nl_config, datastore, graph)
    params = model32.init_params(jax.random.PRNGKey(4))

    ds = WeatherDataset(datastore, split="train", ar_steps=4)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0], ds[1]]))

    pred32 = np.asarray(model32.common_step(params, batch)[0], np.float32)
    pred16 = np.asarray(model16.common_step(params, batch)[0], np.float32)
    assert pred32.shape[1] == 4
    assert np.all(np.isfinite(pred16))
    rel = np.abs(pred16 - pred32).mean() / np.abs(pred32).mean()
    assert rel < 2e-2, f"bf16 rollout diverges from fp32: rel={rel:.4f}"
    # per-step: error may grow with unroll depth but stays bounded
    for t in range(4):
        rel_t = (np.abs(pred16[:, t] - pred32[:, t]).mean()
                 / np.abs(pred32[:, t]).mean())
        assert rel_t < 2e-2, (t, rel_t)


def test_graph_autobuild_when_missing(tmp_path):
    """Constructing a graph model with a graph NAME that does not exist
    under the datastore root builds it automatically (archetype from the
    name), making the train CLI self-sufficient for per-process-root
    datastores (examples/README.md demo flow)."""
    from neural_lam_tpu.datastore.dummy import DummyDatastore

    ds = DummyDatastore(n_points_1d=10, n_timesteps=10,
                        root=str(tmp_path / "dsroot"))
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    args = ModelArgs(hidden_dim=4, hidden_layers=1, processor_layers=1,
                     graph="auto1level")
    model = MODELS["graph_lam"](args, config, ds)  # no graph passed
    assert (tmp_path / "dsroot" / "graph" / "auto1level" /
            "meta.json").exists()
    assert model.graph.num_grid_nodes == ds.num_grid_points
    # second construction loads the built graph (no temp dirs left over)
    MODELS["graph_lam"](args, config, ds)
    leftovers = [p for p in (tmp_path / "dsroot" / "graph").iterdir()
                 if p.name.startswith(".")]
    assert not leftovers, leftovers
