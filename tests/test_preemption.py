"""Preemption-safety e2e: SIGTERM mid-training saves "last" and exits
cleanly; a follow-up run resumes from the saved step.

The reference has no preemption handling at all (SURVEY.md §5 — recovery
is manual relaunch with --load); this covers the signal handler in
train.Trainer.fit (finish the current step, save, stop).
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]


def _run(args, cwd, env, timeout=600):
    return subprocess.run(
        [sys.executable, "-m", args[0], *args[1:]],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout,
    )


def test_sigterm_saves_last_and_resumes(tmp_path):
    # persistent-root dummy datastore so the graph and checkpoints are
    # shared across the separate train processes
    (tmp_path / "dummy.yaml").write_text(yaml.safe_dump(
        {"n_points_1d": 10, "n_timesteps": 40, "root": "dsroot"}
    ))
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(
        {"datastore": {"kind": "dummydata", "config_path": "dummy.yaml"}}
    ))
    env = {**os.environ, "PYTHONPATH": str(REPO)}

    r = _run(["neural_lam_tpu.graph.build", "--config_path", "config.yaml",
              "--name", "g1", "--levels", "1"], tmp_path, env)
    assert r.returncode == 0, r.stderr

    # epochs high enough that the run cannot finish on its own;
    # val_interval huge so the only "last" checkpoint is the preemption one
    proc = subprocess.Popen(
        [sys.executable, "-m", "neural_lam_tpu.train",
         "--config_path", "config.yaml", "--model", "graph_lam",
         "--graph", "g1", "--hidden_dim", "4", "--processor_layers", "1",
         "--epochs", "10000", "--batch_size", "2", "--ar_steps_eval", "2",
         "--val_steps_to_log", "1", "--val_interval", "1000000",
         "--save_dir", "models", "--run_name", "pre"],
        cwd=tmp_path, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait for the first completed epoch (compile included) so the
        # signal lands mid-training, not mid-startup
        metrics = tmp_path / "models" / "pre" / "metrics.jsonl"
        deadline = time.time() + 420
        while time.time() < deadline:
            if proc.poll() is not None:
                out, _ = proc.communicate()
                raise AssertionError(f"train exited early:\n{out}")
            if metrics.exists() and "train_loss" in metrics.read_text():
                break
            time.sleep(1.0)
        else:
            raise AssertionError("no training progress before deadline")

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert "Preemption signal received" in out

    meta_path = tmp_path / "models" / "pre" / "last.meta.json"
    assert meta_path.exists(), out
    meta = json.loads(meta_path.read_text())
    assert meta.get("preempted") is True
    assert meta["step"] > 0

    # resume: restores the saved step and trains one more epoch cleanly
    r2 = _run(["neural_lam_tpu.train",
               "--config_path", "config.yaml", "--model", "graph_lam",
               "--graph", "g1", "--hidden_dim", "4",
               "--processor_layers", "1", "--epochs", "1",
               "--batch_size", "2", "--ar_steps_eval", "2",
               "--val_steps_to_log", "1",
               "--load", "models/pre/last",
               "--save_dir", "models", "--run_name", "resumed"],
              tmp_path, env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert f"(step {meta['step']})" in r2.stdout
    meta2 = json.loads(
        (tmp_path / "models" / "resumed" / "last.meta.json").read_text()
    )
    assert meta2["step"] > meta["step"]
