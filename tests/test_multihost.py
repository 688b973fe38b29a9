"""Multi-host training smoke test: two `jax.distributed` CPU processes
running the real train CLI produce the same parameter trajectory and eval
loss as a single process with the same global batch (counterpart of the
reference's DDP `num_nodes` support, ref: neural_lam/train_model.py:276-286
and eval gathering ar_model.py:311-320).

Construction: 32 train samples; single-process batch 8 over 4 virtual
devices vs 2 processes x per-host batch 4 over 2 virtual devices each.
The shuffled batch order is seed-deterministic and shards are strided, so
global step k consumes the exact same samples in both runs — train losses
must agree to fp tolerance, as must the cross-host-merged val loss.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _write_config(root: Path):
    with open(root / "dummy.yaml", "w") as f:
        # 80 timesteps -> 48 train / 16 val: 44 train samples (5 global
        # batches of 8) and 11 val samples (>= 1 full batch per host shard)
        yaml.safe_dump(
            {"n_points_1d": 10, "n_timesteps": 80, "root": "dsroot"}, f
        )
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(
            {"datastore": {"kind": "dummydata", "config_path": "dummy.yaml"}},
            f,
        )
    return root / "config.yaml"


def _env(n_devices: int):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    return env


def _train_args(cfg, run_name, save_dir, batch_size):
    return [
        sys.executable, "-m", "neural_lam_tpu.train",
        "--config_path", str(cfg), "--model", "graph_lam",
        "--graph", "mh", "--hidden_dim", "8", "--processor_layers", "1",
        "--epochs", "1", "--batch_size", str(batch_size),
        "--ar_steps_eval", "2", "--val_steps_to_log", "1",
        "--seed", "42", "--save_dir", str(save_dir), "--run_name", run_name,
    ]


def _read_metrics(run_dir: Path):
    out = {}
    for line in open(run_dir / "metrics.jsonl"):
        out.update(json.loads(line))
    return out


@pytest.mark.slow
def test_two_process_train_matches_single(tmp_path):
    cfg = _write_config(tmp_path)
    # build the graph once (persistent datastore root)
    subprocess.run(
        [sys.executable, "-m", "neural_lam_tpu.graph.build",
         "--config_path", str(cfg), "--name", "mh", "--levels", "1"],
        env=_env(1), check=True, timeout=300,
    )

    # single-process reference: global batch 8
    single = subprocess.run(
        _train_args(cfg, "single", tmp_path / "m1", 8),
        env=_env(4), check=True, timeout=600,
    )
    assert single.returncode == 0

    # two processes x per-host batch 4 = same global batch 8
    port = _free_port()
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            _train_args(cfg, "multi", tmp_path / "m2", 4)
            + ["--num_nodes", "2", "--node_rank", str(rank),
               "--coordinator_address", f"localhost:{port}"],
            env=_env(2),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    assert "process 0/2" in outs[0] or "process 0/2" in outs[1]

    m1 = _read_metrics(tmp_path / "m1" / "single")
    m2 = _read_metrics(tmp_path / "m2" / "multi")

    # same global batches in the same order -> same loss trajectory
    np.testing.assert_allclose(m2["train_loss"], m1["train_loss"], rtol=5e-5)
    # eval: disjoint per-host shards merged across hosts == single-process
    np.testing.assert_allclose(m2["val_mean_loss"], m1["val_mean_loss"],
                               rtol=5e-5)
    np.testing.assert_allclose(m2["val_loss_unroll1"], m1["val_loss_unroll1"],
                               rtol=5e-5)

    # rank 0 wrote checkpoints; exactly one metrics file exists
    assert (tmp_path / "m2" / "multi" / "last").exists()
    assert (tmp_path / "m2" / "multi" / "min_val_loss").exists()


@pytest.mark.slow
def test_zero_eval_batch_host_does_not_deadlock(tmp_path):
    """A host whose eval shard yields no full batch must contribute zero
    sums to the cross-host merge instead of raising pre-psum (which left
    the other hosts blocked in the collective). 40 timesteps -> ~5 val
    samples: one full batch of 4 (host 0 + leftovers), none for host 1."""
    with open(tmp_path / "dummy.yaml", "w") as f:
        yaml.safe_dump(
            {"n_points_1d": 10, "n_timesteps": 40, "root": "dsroot"}, f
        )
    cfg = tmp_path / "config.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(
            {"datastore": {"kind": "dummydata", "config_path": "dummy.yaml"}},
            f,
        )
    subprocess.run(
        [sys.executable, "-m", "neural_lam_tpu.graph.build",
         "--config_path", str(cfg), "--name", "mh", "--levels", "1"],
        env=_env(1), check=True, timeout=300,
    )
    single = subprocess.run(
        _train_args(cfg, "single", tmp_path / "m1", 4),
        env=_env(2), check=True, timeout=600,
    )
    assert single.returncode == 0

    # eval-only from the single-process checkpoint: identical params, so
    # the merged multi-host val loss must match exactly
    ckpt = tmp_path / "m1" / "single" / "last"
    port = _free_port()
    procs = [
        subprocess.Popen(
            _train_args(cfg, "multi", tmp_path / "m2", 4)
            + ["--eval", "val", "--load", str(ckpt),
               "--num_nodes", "2", "--node_rank", str(rank),
               "--coordinator_address", f"localhost:{port}"],
            env=_env(2),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    import re

    m1 = _read_metrics(tmp_path / "m1" / "single")
    # all val samples were consumed by host 0's shard; the merged result
    # (printed by the eval CLI) must equal the single-process evaluation
    out0 = outs[0] + outs[1]
    m = re.search(r"'val_mean_loss': ([0-9.eE+-]+)", out0)
    assert m, f"no val_mean_loss in output:\n{out0[-2000:]}"
    np.testing.assert_allclose(float(m.group(1)), m1["val_mean_loss"],
                               rtol=5e-5)


@pytest.mark.slow
def test_two_process_test_epoch_matches_single(tmp_path):
    """Full TEST-epoch exactness across hosts: error maps (rmse/mae csv),
    spatial loss maps and per-lead-time losses from a 2-process `--eval
    test` must match the single-process evaluation of the same
    checkpoint. This proves the padded-row-exact eval gather — the thing
    the reference's DDP eval gets wrong (duplicated padded samples, ref
    ar_model.py:610-644 + README 'Evaluate Models' warning) — also holds
    across processes: both host shards here end in a padded tail batch
    (11 test samples split 6/5 over per-host batch 4)."""
    cfg = _write_config(tmp_path)  # 80 timesteps -> 16 test steps
    subprocess.run(
        [sys.executable, "-m", "neural_lam_tpu.graph.build",
         "--config_path", str(cfg), "--name", "mh", "--levels", "1"],
        env=_env(1), check=True, timeout=300,
    )
    single = subprocess.run(
        _train_args(cfg, "single", tmp_path / "m1", 4),
        env=_env(2), check=True, timeout=600,
    )
    assert single.returncode == 0
    ckpt = tmp_path / "m1" / "single" / "last"

    eval_extra = ["--eval", "test", "--load", str(ckpt),
                  "--val_steps_to_log", "1", "2", "--n_example_pred", "0"]
    single_eval = subprocess.run(
        _train_args(cfg, "e1", tmp_path / "e1", 4) + eval_extra,
        env=_env(2), check=True, timeout=600,
    )
    assert single_eval.returncode == 0

    port = _free_port()
    procs = [
        subprocess.Popen(
            _train_args(cfg, "e2", tmp_path / "e2", 4) + eval_extra
            + ["--num_nodes", "2", "--node_rank", str(rank),
               "--coordinator_address", f"localhost:{port}"],
            env=_env(2),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    d1, d2 = tmp_path / "e1" / "e1", tmp_path / "e2" / "e2"
    # error maps: (T, d) rescaled rmse/mae written by rank 0
    for name in ("test_rmse.csv", "test_mae.csv"):
        a = np.loadtxt(d1 / name, delimiter=",")
        b = np.loadtxt(d2 / name, delimiter=",")
        np.testing.assert_allclose(b, a, rtol=5e-5)
    # spatial maps: mean over samples of the per-node loss
    for name in ("mean_spatial_loss.npy", "spatial_loss_t1.npy",
                 "spatial_loss_t2.npy"):
        np.testing.assert_allclose(np.load(d2 / name), np.load(d1 / name),
                                   rtol=5e-5)
    # per-lead-time summary losses from the merged metrics
    m1, m2 = _read_metrics(d1), _read_metrics(d2)
    for key in ("test_mean_loss", "test_loss_unroll1", "test_loss_unroll2"):
        np.testing.assert_allclose(m2[key], m1[key], rtol=5e-5)


@pytest.mark.slow
def test_two_process_spatial_halo_matches_single(tmp_path):
    """Multi-host data parallelism COMPOSED with intra-host spatial
    sharding (mesh_halo): 2 processes x (data=1, space=4) vs one process
    with the same global batch on (data=2, space=4) produce the same
    trajectory. Training runs lockstep on the global ('data','space')
    mesh; evaluation runs on each host's local spatialized twin."""
    cfg = _write_config(tmp_path)
    subprocess.run(
        [sys.executable, "-m", "neural_lam_tpu.graph.build",
         "--config_path", str(cfg), "--name", "mh", "--levels", "1"],
        env=_env(1), check=True, timeout=300,
    )
    spatial = ["--spatial_shards", "4", "--spatial_scheme", "mesh_halo"]

    single = subprocess.run(
        _train_args(cfg, "single", tmp_path / "s1", 8) + spatial,
        env=_env(8), check=True, timeout=900,
    )
    assert single.returncode == 0

    port = _free_port()
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            _train_args(cfg, "multi", tmp_path / "s2", 4) + spatial
            + ["--num_nodes", "2", "--node_rank", str(rank),
               "--coordinator_address", f"localhost:{port}"],
            env=_env(4),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    m1 = _read_metrics(tmp_path / "s1" / "single")
    m2 = _read_metrics(tmp_path / "s2" / "multi")
    np.testing.assert_allclose(m2["train_loss"], m1["train_loss"], rtol=5e-5)
    np.testing.assert_allclose(m2["val_mean_loss"], m1["val_mean_loss"],
                               rtol=5e-5)
