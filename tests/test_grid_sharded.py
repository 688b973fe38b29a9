"""Grid-sharded wrapper: every model family matches its unsharded self."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.config import (
    DatastoreSelection, NeuralLAMConfig, TrainingConfig,
)
from neural_lam_tpu.dataset import WeatherDataset, collate
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graph.build import create_graph
from neural_lam_tpu.graph.storage import graph_from_bundle
from neural_lam_tpu.models import MODELS
from neural_lam_tpu.models.ar_model import ModelArgs
from neural_lam_tpu.parallel.grid_sharded import spatialize
from neural_lam_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    datastore = DummyDatastore(grid_shape=(30, 28), n_timesteps=40)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    gd = tmp_path_factory.mktemp("graphs")
    flat = graph_from_bundle(create_graph(
        str(gd / "flat"), datastore.get_xy("state", stacked=False),
        n_max_levels=None, hierarchical=False,
    ))
    hier = graph_from_bundle(create_graph(
        str(gd / "hier"), datastore.get_xy("state", stacked=False),
        n_max_levels=2, hierarchical=True,
    ))
    return datastore, config, flat, hier


@pytest.mark.parametrize("model_name", ["graph_lam", "hi_lam",
                                        "hi_lam_parallel", "graph_lam:rs",
                                        "hi_lam:rs", "hi_lam_parallel:rs",
                                        "graph_lam:halo", "hi_lam:halo",
                                        "hi_lam_parallel:halo"])
def test_grid_sharded_matches(model_name, env):
    datastore, config, flat, hier = env
    model_name, _, variant = model_name.partition(":")
    graph = flat if model_name == "graph_lam" else hier
    args = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=2)
    model = MODELS[model_name](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=2, n_space=4)
    if variant:
        from neural_lam_tpu.parallel.grid_sharded import spatialize_rs

        sp = spatialize_rs(model, mesh, halo=variant == "halo")
    else:
        sp = spatialize(model, mesh)

    ds = WeatherDataset(datastore, split="train", ar_steps=3)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0], ds[1]]))
    init_states, target_states, forcing, _ = batch

    out_ref, _ = jax.jit(model.predict_step)(
        params, init_states[:, 1], init_states[:, 0], forcing[:, 0]
    )
    out_sp, _ = jax.jit(sp.predict_step)(
        params, init_states[:, 1], init_states[:, 0], forcing[:, 0]
    )
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_sp),
                               atol=2e-5, rtol=1e-5)

    l_ref = float(jax.jit(model.training_loss)(params, batch))
    l_sp = float(jax.jit(sp.training_loss)(params, batch))
    np.testing.assert_allclose(l_ref, l_sp, rtol=1e-5)

    g_ref = jax.jit(jax.grad(model.training_loss))(params, batch)
    g_sp = jax.jit(jax.grad(sp.training_loss))(params, batch)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=2e-3)
