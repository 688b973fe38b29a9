"""Training integration test: short fit + checkpointing + test epoch on the
8-device CPU mesh (counterpart of ref: tests/test_training.py — which uses
Lightning DDP with devices=2; here the mesh exercises the multi-device
sharded train step + metric aggregation)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from neural_lam_tpu.config import (
    DatastoreSelection,
    NeuralLAMConfig,
    TrainingConfig,
)
from neural_lam_tpu.dataset import WeatherDataModule
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graph.build import create_graph
from neural_lam_tpu.graph.storage import graph_from_bundle
from neural_lam_tpu.models import MODELS
from neural_lam_tpu.models.ar_model import ModelArgs
from neural_lam_tpu.parallel.mesh import make_mesh
from neural_lam_tpu.train import Trainer, TrainFlags


def test_prefetch_matches_synchronous(tmp_path):
    """Device prefetch is order-preserving: final params identical to the
    synchronous loop (same seed, same batch order)."""
    datastore = DummyDatastore(n_points_1d=10, n_timesteps=30)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    bundle = create_graph(str(tmp_path / "graph"),
                          datastore.get_xy("state", stacked=False),
                          n_max_levels=1, hierarchical=False)
    graph = graph_from_bundle(bundle)
    args = ModelArgs(hidden_dim=4, hidden_layers=1, processor_layers=1,
                     val_steps_to_log=(1,))
    mesh = make_mesh(n_data=1, n_space=1)

    results = []
    for depth in (0, 2):
        model = MODELS["graph_lam"](args, config, datastore, graph)
        dm = WeatherDataModule(datastore, ar_steps_train=1, ar_steps_eval=2,
                               batch_size=2)
        flags = TrainFlags(epochs=1, batch_size=2, val_interval=10,
                           seed=3, prefetch_batches=depth)
        trainer = Trainer(model, flags, run_dir=tmp_path / f"run{depth}",
                          mesh=mesh)
        params, _ = trainer.fit(dm)
        results.append(jax.tree_util.tree_leaves(params))
    for x, y in zip(*results):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_auto_resumes_own_run(tmp_path):
    """--load auto: fresh start when no checkpoint, resume after one."""
    datastore = DummyDatastore(n_points_1d=10, n_timesteps=30)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    bundle = create_graph(str(tmp_path / "graph"),
                          datastore.get_xy("state", stacked=False),
                          n_max_levels=1, hierarchical=False)
    graph = graph_from_bundle(bundle)
    args = ModelArgs(hidden_dim=4, hidden_layers=1, processor_layers=1,
                     val_steps_to_log=(1,))
    model = MODELS["graph_lam"](args, config, datastore, graph)
    dm = WeatherDataModule(datastore, ar_steps_train=1, ar_steps_eval=2,
                           batch_size=2)
    mesh = make_mesh(n_data=1, n_space=1)
    run_dir = tmp_path / "run"

    flags = TrainFlags(epochs=1, batch_size=2, val_interval=1, seed=3,
                       load="auto")
    trainer = Trainer(model, flags, run_dir=run_dir, mesh=mesh)
    # no checkpoint yet -> fresh start (load resolved to None)
    trainer.fit(dm)
    assert trainer.flags.load is None
    assert (run_dir / "last").exists()
    step1 = trainer.global_step

    flags2 = TrainFlags(epochs=1, batch_size=2, val_interval=1, seed=3,
                        load="auto", restore_opt=True)
    trainer2 = Trainer(model, flags2, run_dir=run_dir, mesh=mesh)
    trainer2.init_state()
    assert trainer2.flags.load == str(run_dir / "last")
    assert trainer2.global_step == step1


def test_fit_and_test(tmp_path):
    datastore = DummyDatastore(n_points_1d=10, n_timesteps=40)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    bundle = create_graph(str(tmp_path / "graph"),
                          datastore.get_xy("state", stacked=False),
                          n_max_levels=1, hierarchical=False)
    graph = graph_from_bundle(bundle)

    args = ModelArgs(hidden_dim=4, hidden_layers=1, processor_layers=2,
                     val_steps_to_log=(1, 3))
    model = MODELS["graph_lam"](args, config, datastore, graph)

    datamodule = WeatherDataModule(
        datastore, ar_steps_train=2, ar_steps_eval=3, batch_size=2
    )
    mesh = make_mesh(n_data=2, n_space=1)
    flags = TrainFlags(epochs=2, batch_size=2, val_interval=1, seed=1)
    trainer = Trainer(model, flags, run_dir=tmp_path / "run", mesh=mesh)
    params, opt_state = trainer.fit(datamodule)

    # checkpoints written
    assert (tmp_path / "run" / "last").exists()
    assert (tmp_path / "run" / "min_val_loss").exists()
    assert (tmp_path / "run" / "metrics.jsonl").exists()

    # loss decreased from random init at least once across epochs
    # (just check logged train losses are finite)
    import json

    losses = [
        json.loads(line).get("train_loss")
        for line in open(tmp_path / "run" / "metrics.jsonl")
    ]
    losses = [l for l in losses if l is not None]
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)

    # restore from checkpoint
    flags2 = TrainFlags(epochs=1, batch_size=2, load=str(tmp_path / "run" / "last"),
                        restore_opt=True, seed=1)
    trainer2 = Trainer(model, flags2, run_dir=tmp_path / "run2", mesh=mesh)
    params2, opt2 = trainer2.init_state()
    # params equal to saved ones
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params2)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))

    # test epoch produces artifacts
    out = trainer.test(datamodule, params, make_plots=False)
    assert np.isfinite(out["test_mean_loss"])
    assert (tmp_path / "run" / "test_rmse.csv").exists()
    assert (tmp_path / "run" / "mean_spatial_loss.npy").exists()
    rmse = np.loadtxt(tmp_path / "run" / "test_rmse.csv", delimiter=",")
    assert rmse.shape == (3, datastore.get_num_data_vars("state"))

    # regression: the spatial-loss artifact for logged lead time t is the
    # map at unroll index t-1 of the full (T, N) mean map — with
    # val_steps_to_log=(1, 3) and ar_steps_eval=3, files exist for t=1 and
    # t=3 only, and t=3 holds row index 2
    spatial = np.load(tmp_path / "run" / "mean_spatial_loss.npy")
    assert spatial.shape[0] == 3
    np.testing.assert_array_equal(
        np.load(tmp_path / "run" / "spatial_loss_t1.npy"), spatial[0]
    )
    np.testing.assert_array_equal(
        np.load(tmp_path / "run" / "spatial_loss_t3.npy"), spatial[2]
    )
    assert not (tmp_path / "run" / "spatial_loss_t2.npy").exists()
