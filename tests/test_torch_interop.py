"""Real-artifact interop: reference-format torch graph directories convert
to GraphBundles (incl. the y-major->x-major grid reorder), and a trained
Lightning-style .ckpt round-trips through load_torch_checkpoint into a
matching rollout (ref: neural_lam/utils.py:36-188, ar_model.py:698-721)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from neural_lam_tpu.config import (
    DatastoreSelection, NeuralLAMConfig, TrainingConfig,
)
from neural_lam_tpu.dataset import WeatherDataset, collate
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graph.build import create_graph
from neural_lam_tpu.graph.storage import graph_from_bundle
from neural_lam_tpu.graph.torch_io import (
    graph_from_torch_dir, torch_dir_from_bundle,
)
from neural_lam_tpu.models import MODELS
from neural_lam_tpu.models.ar_model import ModelArgs
from neural_lam_tpu.torch_compat import load_torch_checkpoint

from .torch_reference import TorchGraphLAM

NX, NY = 30, 28


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    datastore = DummyDatastore(grid_shape=(NX, NY), n_timesteps=40)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    gd = tmp_path_factory.mktemp("graphs")
    flat = create_graph(
        str(gd / "flat"), datastore.get_xy("state", stacked=False),
        n_max_levels=None, hierarchical=False,
    )
    hier = create_graph(
        str(gd / "hier"), datastore.get_xy("state", stacked=False),
        n_max_levels=2, hierarchical=True,
    )
    return datastore, config, flat, hier


@pytest.mark.parametrize("which", ["flat", "hier"])
def test_torch_graph_dir_roundtrip(which, env, tmp_path):
    """bundle -> reference .pt dir -> bundle is the identity (the two grid
    reorders are inverse permutations)."""
    _, _, flat, hier = env
    bundle = flat if which == "flat" else hier
    torch_dir_from_bundle(bundle, str(tmp_path / "g"), (NX, NY))
    back = graph_from_torch_dir(str(tmp_path / "g"), (NX, NY))
    assert back.hierarchical == bundle.hierarchical
    for a, b in [(back.g2m_edge_index, bundle.g2m_edge_index),
                 (back.m2g_edge_index, bundle.m2g_edge_index)]:
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(back.g2m_features, bundle.g2m_features)
    np.testing.assert_allclose(back.m2g_features, bundle.m2g_features)
    for lev in range(bundle.n_levels):
        np.testing.assert_array_equal(
            back.m2m_edge_index[lev], bundle.m2m_edge_index[lev]
        )
        np.testing.assert_allclose(
            back.mesh_static_features[lev], bundle.mesh_static_features[lev]
        )
    for lev in range(len(bundle.mesh_up_edge_index)):
        np.testing.assert_array_equal(
            back.mesh_up_edge_index[lev], bundle.mesh_up_edge_index[lev]
        )
        np.testing.assert_array_equal(
            back.mesh_down_edge_index[lev], bundle.mesh_down_edge_index[lev]
        )


def test_grid_reorder_is_y_major(env, tmp_path):
    """The written .pt dir uses the REFERENCE's y-major grid numbering:
    grid node (ix, iy) appears as num_mesh + iy*NX + ix."""
    _, _, flat, _ = env
    torch_dir_from_bundle(flat, str(tmp_path / "g"), (NX, NY))
    g2m_ref = torch.load(tmp_path / "g" / "g2m_edge_index.pt",
                         weights_only=True).numpy()
    num_mesh = sum(p.shape[0] for p in flat.mesh_static_features)
    ours = flat.g2m_edge_index[0] - num_mesh  # x-major ix*NY + iy
    ix, iy = ours // NY, ours % NY
    np.testing.assert_array_equal(g2m_ref[0] - num_mesh, iy * NX + ix)


def test_model_forward_on_converted_graph(env, tmp_path):
    """A GraphLAM forward on the converted graph equals the original."""
    datastore, config, flat, _ = env
    torch_dir_from_bundle(flat, str(tmp_path / "g"), (NX, NY))
    back = graph_from_torch_dir(str(tmp_path / "g"), (NX, NY))
    args = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=2)
    m1 = MODELS["graph_lam"](args, config, datastore, graph_from_bundle(flat))
    m2 = MODELS["graph_lam"](args, config, datastore, graph_from_bundle(back))
    params = m1.init_params(jax.random.PRNGKey(0))
    ds = WeatherDataset(datastore, split="train", ar_steps=1)
    init_states, _, forcing, _ = collate([ds[0]])
    o1, _ = m1.predict_step(params, jnp.asarray(init_states[:, 1]),
                            jnp.asarray(init_states[:, 0]),
                            jnp.asarray(forcing[:, 0]))
    o2, _ = m2.predict_step(params, jnp.asarray(init_states[:, 1]),
                            jnp.asarray(init_states[:, 0]),
                            jnp.asarray(forcing[:, 0]))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_lightning_ckpt_roundtrip(env, tmp_path):
    """Train the torch reference implementation a few steps, save a
    Lightning-layout .ckpt, load it through load_torch_checkpoint, and
    require rollout allclose — the BASELINE correctness target exercised
    end-to-end on a real checkpoint file."""
    datastore, config, flat, _ = env
    graph_exact = graph_from_bundle(flat, dense=False)
    graph_dense = graph_from_bundle(flat, dense=True)
    args = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=2)
    model = MODELS["graph_lam"](args, config, datastore, graph_dense)

    torch.manual_seed(0)
    tmodel = TorchGraphLAM(
        graph_exact, model.statics, model.grid_dim, model.grid_output_dim,
        hidden_dim=8, hidden_layers=1, n_proc=2,
    )
    ds = WeatherDataset(datastore, split="train", ar_steps=2)
    init_states, target_states, forcing, _ = collate([ds[0], ds[1]])
    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-3)
    for _ in range(3):
        opt.zero_grad()
        pred = tmodel.unroll_prediction(
            torch.tensor(init_states), torch.tensor(forcing),
            torch.tensor(target_states),
        )
        loss = torch.mean((pred - torch.tensor(target_states)) ** 2)
        loss.backward()
        opt.step()

    # Lightning checkpoint layout (the reference's ARModel IS the
    # LightningModule, so state-dict keys are unprefixed)
    ckpt_path = tmp_path / "min_val_loss.ckpt"
    torch.save(
        {
            "state_dict": tmodel.state_dict(),
            "epoch": 1,
            "global_step": 3,
            "pytorch-lightning_version": "2.2.0",
            "optimizer_states": [opt.state_dict()],
            "lr_schedulers": [],
            "hyper_parameters": {"args": vars(args)},
        },
        ckpt_path,
    )

    params = model.init_params(jax.random.PRNGKey(1))
    params = load_torch_checkpoint(str(ckpt_path), params, strict=True)

    eval_ds = WeatherDataset(datastore, split="val", ar_steps=4)
    init_states, target_states, forcing, _ = collate([eval_ds[0]])
    with torch.no_grad():
        pred_t = tmodel.unroll_prediction(
            torch.tensor(init_states), torch.tensor(forcing),
            torch.tensor(target_states),
        ).numpy()
    pred_j, _ = model.unroll_prediction(
        params, jnp.asarray(init_states), jnp.asarray(forcing),
        jnp.asarray(target_states),
    )
    np.testing.assert_allclose(np.asarray(pred_j), pred_t,
                               atol=1e-4, rtol=1e-3)
