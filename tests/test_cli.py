"""CLI + import smoke tests (ref: tests/test_cli.py, tests/test_imports.py),
plus end-to-end CLI runs over a dummy-datastore config."""

import numpy as np
import yaml


def test_imports():
    import neural_lam_tpu
    from neural_lam_tpu import (  # noqa: F401
        config, dataset, metrics, loss_weighting, train, vis,
    )
    from neural_lam_tpu.graph import build, storage  # noqa: F401
    from neural_lam_tpu.models import MODELS

    assert neural_lam_tpu.__version__ is not None
    assert set(MODELS) == {"graph_lam", "hi_lam", "hi_lam_parallel",
                           "graph_efm", "hi_efm"}


def _write_dummy_config(tmp_path):
    ds_cfg = tmp_path / "dummy.yaml"
    with open(ds_cfg, "w") as f:
        yaml.safe_dump({"n_points_1d": 10, "n_timesteps": 40}, f)
    nl_cfg = tmp_path / "config.yaml"
    with open(nl_cfg, "w") as f:
        yaml.safe_dump(
            {"datastore": {"kind": "dummydata", "config_path": "dummy.yaml"}},
            f,
        )
    return nl_cfg


def test_create_graph_cli(tmp_path, monkeypatch):
    from neural_lam_tpu.config import load_config_and_datastore
    from neural_lam_tpu.graph.build import cli

    nl_cfg = _write_dummy_config(tmp_path)
    # note: dummy datastore root is a fresh tempdir each init; run the cli
    # then check via a datastore sharing the same config
    cli(["--config_path", str(nl_cfg), "--name", "testgraph", "--levels", "1"])


def test_train_cli_short(tmp_path):
    """One tiny epoch of training through the CLI, then eval."""
    from neural_lam_tpu import train

    nl_cfg = _write_dummy_config(tmp_path)
    save_dir = tmp_path / "models"

    # graph must exist under the datastore root; the dummy datastore uses a
    # fresh tempdir per instance, so train with an explicit pre-made graph is
    # exercised via the smaller API-level test in test_training.py. Here we
    # check the CLI wiring end-to-end by pointing --graph at a name we build
    # through the create_graph CLI within the same process lifetime.
    import neural_lam_tpu.datastore.dummy as dummy_mod

    # make DummyDatastore deterministic root per config so graph persists
    roots = {}
    orig_init = dummy_mod.DummyDatastore.__init__

    def patched_init(self, config_path=None, **kw):
        orig_init(self, config_path=config_path, **kw)
        if config_path is not None:
            key = str(config_path)
            if key in roots:
                # share root (and keep its tempdir alive)
                self._tempdir = roots[key]._tempdir
                self._root_path = roots[key]._root_path
            else:
                roots[key] = self

    dummy_mod.DummyDatastore.__init__ = patched_init
    try:
        from neural_lam_tpu.graph.build import cli as graph_cli

        graph_cli(["--config_path", str(nl_cfg), "--name", "g1",
                   "--levels", "1"])
        train.main([
            "--config_path", str(nl_cfg),
            "--model", "graph_lam",
            "--graph", "g1",
            "--epochs", "1",
            "--batch_size", "2",
            "--hidden_dim", "4",
            "--processor_layers", "1",
            "--ar_steps_train", "1",
            "--ar_steps_eval", "2",
            "--val_steps_to_log", "1",
            "--save_dir", str(save_dir),
            "--run_name", "cli_test",
        ])
        assert (save_dir / "cli_test" / "last").exists()
        metrics_file = save_dir / "cli_test" / "metrics.jsonl"
        assert metrics_file.exists()
        # eval from the checkpoint
        train.main([
            "--config_path", str(nl_cfg),
            "--model", "graph_lam",
            "--graph", "g1",
            "--hidden_dim", "4",
            "--processor_layers", "1",
            "--ar_steps_eval", "2",
            "--val_steps_to_log", "1",
            "--eval", "val",
            "--load", str(save_dir / "cli_test" / "last"),
            "--save_dir", str(save_dir),
            "--run_name", "cli_eval",
        ])
    finally:
        dummy_mod.DummyDatastore.__init__ = orig_init


def test_plot_clis(tmp_path):
    """plot_graph figure builder + datastore plot_example smoke."""
    from neural_lam_tpu.datastore.dummy import DummyDatastore
    from neural_lam_tpu.graph.build import create_graph
    from neural_lam_tpu.graph.storage import graph_from_bundle
    from neural_lam_tpu.plot_graph import make_graph_figure
    from neural_lam_tpu.datastore.plot_example import (
        plot_example_from_datastore,
    )
    from neural_lam_tpu import vis

    ds = DummyDatastore(n_points_1d=10, n_timesteps=20)
    graph = graph_from_bundle(create_graph(
        str(tmp_path / "g"), ds.get_xy("state", stacked=False),
        n_max_levels=1, hierarchical=False,
    ))
    fig = make_graph_figure(graph, ds.get_xy("state"))
    fig.savefig(tmp_path / "graph.png")
    assert (tmp_path / "graph.png").stat().st_size > 0

    fig = plot_example_from_datastore(
        "state", ds, col_dim="{category}_feature", split="train",
        index_selection={"time": 0},
    )
    fig.savefig(tmp_path / "example.png")

    # coord-value selection (the reference CLI's --selection):
    # FieldArray.sel matches a time coordinate value, incl. ISO strings
    da = ds.get_dataarray("state", split="train")
    t0 = np.asarray(da.coords["time"])[2]
    sel_by_value = da.sel(time=t0)
    np.testing.assert_array_equal(
        np.asarray(sel_by_value.values), np.asarray(da.isel(time=2).values)
    )
    fig = plot_example_from_datastore(
        "state", ds, col_dim="{category}_feature", split="train",
        selection={"time": t0},
    )
    fig.savefig(tmp_path / "example_sel.png")

    # vis functions
    errors = np.random.rand(3, ds.get_num_data_vars("state"))
    vis.plot_error_map(errors, ds).savefig(tmp_path / "err.png")
    field = np.random.rand(ds.num_grid_points)
    vis.plot_prediction(field, field, ds).savefig(tmp_path / "pred.png")
    vis.plot_spatial_error(field, ds).savefig(tmp_path / "sp.png")


def test_train_cli_spatial_shards(tmp_path):
    """--spatial_shards trains the grid-sharded model end-to-end."""
    from neural_lam_tpu import train
    import neural_lam_tpu.datastore.dummy as dummy_mod

    nl_cfg = _write_dummy_config(tmp_path)
    roots = {}
    orig_init = dummy_mod.DummyDatastore.__init__

    def patched_init(self, config_path=None, **kw):
        orig_init(self, config_path=config_path, **kw)
        if config_path is not None:
            key = str(config_path)
            if key in roots:
                self._tempdir = roots[key]._tempdir
                self._root_path = roots[key]._root_path
            else:
                roots[key] = self

    dummy_mod.DummyDatastore.__init__ = patched_init
    try:
        from neural_lam_tpu.graph.build import cli as graph_cli

        graph_cli(["--config_path", str(nl_cfg), "--name", "gs",
                   "--levels", "1"])
        train.main([
            "--config_path", str(nl_cfg), "--model", "graph_lam",
            "--graph", "gs", "--epochs", "1", "--batch_size", "2",
            "--hidden_dim", "4", "--processor_layers", "1",
            "--ar_steps_train", "1", "--ar_steps_eval", "2",
            "--val_steps_to_log", "1", "--spatial_shards", "4",
            "--save_dir", str(tmp_path / "runs"), "--run_name", "sp",
        ])
        assert (tmp_path / "runs" / "sp" / "last").exists()
        # cut-edge halo-exchange scheme end-to-end
        train.main([
            "--config_path", str(nl_cfg), "--model", "graph_lam",
            "--graph", "gs", "--epochs", "1", "--batch_size", "2",
            "--hidden_dim", "4", "--processor_layers", "1",
            "--ar_steps_train", "1", "--ar_steps_eval", "2",
            "--val_steps_to_log", "1", "--spatial_shards", "4",
            "--spatial_scheme", "mesh_halo",
            "--save_dir", str(tmp_path / "runs"), "--run_name", "sph",
        ])
        assert (tmp_path / "runs" / "sph" / "last").exists()
    finally:
        dummy_mod.DummyDatastore.__init__ = orig_init
