"""Graph-EFM-style latent-variable ensemble model (models/graph_efm.py).

The reference repo has no latent-variable model; these tests pin down the
TPU-native design: ELBO training (recon + beta*KL with a reparametrized
posterior draw per unroll step), prior-mean deterministic eval through the
inherited metric paths, and prior-sampled ensemble members.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.config import (
    DatastoreSelection, NeuralLAMConfig, TrainingConfig,
)
from neural_lam_tpu.dataset import WeatherDataset, collate
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.ensemble import evaluate_ensemble, sample_rollout
from neural_lam_tpu.graph.build import create_graph
from neural_lam_tpu.graph.storage import graph_from_bundle
from neural_lam_tpu.models import MODELS
from neural_lam_tpu.models.ar_model import ModelArgs


@pytest.fixture(scope="module")
def efm_setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("efm")
    datastore = DummyDatastore(n_points_1d=10, n_timesteps=40)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    graph = graph_from_bundle(create_graph(
        str(tmp_path / "g"), datastore.get_xy("state", stacked=False),
        n_max_levels=1, hierarchical=False,
    ))
    args = ModelArgs(hidden_dim=8, processor_layers=1, latent_dim=4,
                     kl_beta=1e-2)
    model = MODELS["graph_efm"](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))
    ds = WeatherDataset(datastore, split="train", ar_steps=3)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0], ds[1]]))
    return model, params, batch


def test_elbo_training_loss_and_grads(efm_setup):
    model, params, batch = efm_setup
    rng = jax.random.PRNGKey(3)
    loss, grads = jax.value_and_grad(model.training_loss)(params, batch, rng)
    assert np.isfinite(float(loss))
    # every latent-path parameter group receives gradient signal
    for name in ("prior_gnn", "prior_head", "post_gnn", "post_head",
                 "post_g2m_gnn", "post_target_embedder", "latent_map"):
        leaves = jax.tree_util.tree_leaves(grads[name])
        total = sum(float(jnp.abs(g).sum()) for g in leaves)
        assert total > 0, f"no gradient reached params[{name!r}]"
    # different rng -> different (stochastic) loss; same rng -> identical
    l2 = float(model.training_loss(params, batch, jax.random.PRNGKey(4)))
    l3 = float(model.training_loss(params, batch, rng))
    assert l2 != float(loss)
    assert l3 == pytest.approx(float(loss), rel=1e-6)


def test_kl_positive_and_beta_scaling(efm_setup):
    model, params, batch = efm_setup
    rng = jax.random.PRNGKey(5)
    base = float(model.training_loss(params, batch, rng))
    import copy

    model_hi = copy.copy(model)
    model_hi.kl_beta = model.kl_beta + 1.0
    hi = float(model_hi.training_loss(params, batch, rng))
    # loss difference = delta_beta * mean KL  =>  mean KL > 0
    mean_kl = hi - base
    assert mean_kl > 0


def test_deterministic_eval_path(efm_setup):
    """Inherited eval uses the prior mean (no eps in ctx) — finite,
    deterministic, and shaped like any other model's metrics."""
    model, params, batch = efm_setup
    out1 = model.eval_step_metrics(params, batch)
    out2 = model.eval_step_metrics(params, batch)
    assert np.all(np.isfinite(np.asarray(out1["mean_loss"])))
    np.testing.assert_array_equal(np.asarray(out1["time_step_loss"]),
                                  np.asarray(out2["time_step_loss"]))


def test_latent_ensemble_sampling(efm_setup):
    model, params, batch = efm_setup
    init_states, target_states, forcing, _ = batch
    B, T, N, d = target_states.shape
    m = 4
    ens = sample_rollout(model, params, init_states, forcing, target_states,
                         jax.random.PRNGKey(1), n_members=m)
    assert ens.shape == (B, m, T, N, d)
    assert np.all(np.isfinite(np.asarray(ens)))
    interior = np.asarray(model.interior_mask_bool())
    spread = np.asarray(ens.std(axis=1))[:, :, interior]
    assert spread.max() > 0, "latent draws must spread the members"
    boundary_spread = np.asarray(ens.std(axis=1))[:, :, ~interior]
    np.testing.assert_allclose(boundary_spread, 0.0, atol=1e-6)

    out = evaluate_ensemble(model, params, batch, jax.random.PRNGKey(2),
                            n_members=m)
    for k in ("crps", "ens_rmse", "spread"):
        assert out[k].shape == (T,)
        assert np.all(np.isfinite(np.asarray(out[k])))


def test_train_cli_graph_efm(tmp_path):
    """One short epoch + latent-ensemble eval through the real CLI."""
    import yaml

    root = tmp_path / "ds"
    root.mkdir()
    with open(tmp_path / "dummy.yaml", "w") as f:
        yaml.safe_dump({"n_points_1d": 10, "n_timesteps": 40,
                        "root": str(root)}, f)
    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump({"datastore": {"kind": "dummydata",
                                      "config_path": "dummy.yaml"}}, f)

    def run(*extra):
        r = subprocess.run(
            [sys.executable, "-m", "neural_lam_tpu." + extra[0],
             "--config_path", str(tmp_path / "config.yaml"), *extra[1:]],
            capture_output=True, text=True, cwd=tmp_path,
            env={**os.environ,
                 "PYTHONPATH": REPO + os.pathsep
                 + os.environ.get("PYTHONPATH", "")},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r

    run("graph.build", "--name", "g1", "--levels", "1")
    run("train", "--model", "graph_efm", "--graph", "g1",
        "--hidden_dim", "8", "--processor_layers", "1", "--latent_dim", "4",
        "--epochs", "1", "--batch_size", "2", "--ar_steps_eval", "2",
        "--val_steps_to_log", "1", "2", "--save_dir", str(tmp_path / "m"),
        "--run_name", "efm")
    r = run("train", "--model", "graph_efm", "--graph", "g1",
            "--hidden_dim", "8", "--processor_layers", "1",
            "--latent_dim", "4", "--batch_size", "2",
            "--ar_steps_eval", "2", "--val_steps_to_log", "1", "2",
            "--eval", "test", "--ensemble_members", "3",
            "--load", str(tmp_path / "m" / "efm" / "last"),
            "--save_dir", str(tmp_path / "m"), "--run_name", "efm_eval",
            "--n_example_pred", "0")
    assert "crps" in r.stdout


def test_crps_finetune_loss(efm_setup):
    """--loss crps_ens: fair-CRPS over prior-sampled rollouts, no KL."""
    import copy

    model, params, batch = efm_setup
    # flip the training-stage flags on a copy (what the ctor does for
    # --loss crps_ens)
    m = copy.copy(model)
    m.crps_train = True
    m.crps_members = 3
    rng = jax.random.PRNGKey(11)
    loss, grads = jax.value_and_grad(m.training_loss)(params, batch, rng)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # gradient reaches the prior and processor but NOT the posterior
    # (prior-only sampling)
    for name in ("prior_gnn", "prior_head", "latent_map", "processor"):
        total = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(grads[name]))
        assert total > 0, f"no gradient reached params[{name!r}]"
    for name in ("post_gnn", "post_head", "post_target_embedder"):
        total = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(grads[name]))
        assert total == 0, f"posterior params[{name!r}] got gradient"


def test_hi_efm_elbo_and_sampling(tmp_path):
    """Hierarchical latent model: ELBO grads reach the latent params and
    prior-sampled members spread, on a 2-level mesh."""
    datastore = DummyDatastore(n_points_1d=27, n_timesteps=40)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    graph = graph_from_bundle(create_graph(
        str(tmp_path / "g"), datastore.get_xy("state", stacked=False),
        n_max_levels=2, hierarchical=True,
    ))
    args = ModelArgs(hidden_dim=8, processor_layers=1, latent_dim=4,
                     kl_beta=1e-2)
    model = MODELS["hi_efm"](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))
    ds = WeatherDataset(datastore, split="train", ar_steps=2)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0], ds[1]]))

    loss, grads = jax.value_and_grad(model.training_loss)(
        params, batch, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(loss))
    for name in ("prior_gnn", "post_gnn", "latent_map"):
        total = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(grads[name]))
        assert total > 0, f"no gradient reached params[{name!r}]"

    init_states, target_states, forcing, _ = batch
    ens = sample_rollout(model, params, init_states, forcing, target_states,
                         jax.random.PRNGKey(1), n_members=3)
    interior = np.asarray(model.interior_mask_bool())
    assert np.asarray(ens.std(axis=1))[:, :, interior].max() > 0
    assert np.all(np.isfinite(np.asarray(ens)))
