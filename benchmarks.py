"""Multi-configuration benchmark suite (the BASELINE.json config list).

Runs the model families at MEPS scale on one chip and prints a table +
one JSON line per config to benchmarks.jsonl. `bench.py` remains the
single-headline driver benchmark; this covers the broader matrix:

  1. graph_lam  — flat multiscale mesh, ar_steps=4 rollout
  2. hi_lam     — hierarchical 3-level mesh
  3. hi_lam_parallel — fused hierarchical processor, long rollout (ar=19)
  4. graph_lam bf16 — reduced-precision compute path
  5. prob_model_global — BASELINE configs[4]: latent-variable
     hierarchical ensemble (hi_efm) on a global icosahedral mesh,
     0.7deg 512x256 grid (131k points), refinements=5 (10242-vertex
     finest level)

Timing: scan-K differencing (see neural_lam_tpu/profiling.py).
"""

import json
import sys
import time

import numpy as np


def run_config(name, model_name, hierarchical, n_max_levels, ar_steps,
               batch, compute_dtype=None, nx=268, ny=238):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model
    from neural_lam_tpu.models import MODELS
    from neural_lam_tpu.models.ar_model import ModelArgs
    from neural_lam_tpu.config import (
        DatastoreSelection, NeuralLAMConfig, TrainingConfig,
    )
    from neural_lam_tpu.datastore.dummy import DummyDatastore
    from neural_lam_tpu.graph.build import create_graph
    from neural_lam_tpu.graph.storage import graph_from_bundle
    import tempfile

    datastore = DummyDatastore(
        grid_shape=(nx, ny), n_timesteps=8,
        n_features={"state": 17, "forcing": 6, "static": 4},
    )
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    bundle = create_graph(
        tempfile.mkdtemp(), datastore.get_xy("state", stacked=False),
        n_max_levels=n_max_levels, hierarchical=hierarchical,
    )
    graph = graph_from_bundle(bundle)
    args = ModelArgs(hidden_dim=64, processor_layers=4,
                     compute_dtype=compute_dtype)
    model = MODELS[model_name](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))

    n = datastore.num_grid_points
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((batch, n, 17)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((batch, n, 17)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((batch, n, 18)), jnp.float32)

    from bench import measure_steps_ms

    ms = measure_steps_ms(model, params, prev, prevprev, forcing)
    steps_per_s = 1000.0 / ms
    rec = {
        "config": name,
        "model": model_name,
        "n_grid": n,
        "n_mesh": model.num_mesh_nodes,
        "batch": batch,
        "ar_steps": ar_steps,
        "ms_per_predict_step": round(ms, 3),
        "sample_steps_per_s": round(steps_per_s * batch, 2),
        "mesh_node_updates_per_s": model.num_mesh_nodes * 4 * steps_per_s
        * batch,
        "rollout_s": round(ms * ar_steps / 1000.0, 4),
        "ts": time.time(),
    }
    print(f"{name:32s} {ms:8.2f} ms/step  "
          f"{rec['sample_steps_per_s']:9.1f} sample-steps/s  "
          f"(N_mesh={model.num_mesh_nodes})", file=sys.stderr, flush=True)
    return rec


def run_global_config(name, model_name="hi_efm", refinements=5, n_levels=3,
                      ar_steps=4, batch=4, n_lon=512, n_lat=256):
    """BASELINE configs[4]: global probabilistic hierarchical ensemble on
    an icosahedral mesh (no LAM boundary). Measures the deterministic
    prior-mean predict step (the per-member ensemble rollout cost)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from neural_lam_tpu.config import (
        DatastoreSelection, NeuralLAMConfig, TrainingConfig,
    )
    from neural_lam_tpu.datastore.dummy_global import DummyGlobalDatastore
    from neural_lam_tpu.graph.global_mesh import create_global_graph
    from neural_lam_tpu.graph.storage import graph_from_bundle
    from neural_lam_tpu.models import MODELS
    from neural_lam_tpu.models.ar_model import ModelArgs

    datastore = DummyGlobalDatastore(
        n_lon=n_lon, n_lat=n_lat, n_timesteps=8,
        n_features={"state": 17, "forcing": 6, "static": 4},
    )
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata_global",
                                     config_path=""),
        training=TrainingConfig(),
    )
    latlon = datastore.get_xy("state", stacked=True)
    bundle = create_global_graph(
        tempfile.mkdtemp(), latlon, refinements=refinements,
        n_levels=n_levels, hierarchical=True,
    )
    graph = graph_from_bundle(bundle)
    args = ModelArgs(hidden_dim=64, processor_layers=4)
    model = MODELS[model_name](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))

    n = datastore.num_grid_points
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((batch, n, 17)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((batch, n, 17)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((batch, n, 18)), jnp.float32)

    from bench import measure_steps_ms

    ms = measure_steps_ms(model, params, prev, prevprev, forcing)
    steps_per_s = 1000.0 / ms
    rec = {
        "config": name,
        "model": model_name,
        "n_grid": n,
        "n_mesh": model.num_mesh_nodes,
        "batch": batch,
        "ar_steps": ar_steps,
        "ms_per_predict_step": round(ms, 3),
        "sample_steps_per_s": round(steps_per_s * batch, 2),
        "mesh_node_updates_per_s": model.num_mesh_nodes * 4 * steps_per_s
        * batch,
        "rollout_s": round(ms * ar_steps / 1000.0, 4),
        "ts": time.time(),
    }
    print(f"{name:32s} {ms:8.2f} ms/step  "
          f"{rec['sample_steps_per_s']:9.1f} sample-steps/s  "
          f"(N_grid={n}, N_mesh={model.num_mesh_nodes})",
          file=sys.stderr, flush=True)
    return rec


def main():
    configs = [
        ("graph_lam_meps_ar4", "graph_lam", False, None, 4, 4, None),
        ("graph_lam_meps_bf16", "graph_lam", False, None, 4, 4, "bfloat16"),
        ("hi_lam_meps_3level", "hi_lam", True, 3, 4, 4, None),
        ("hi_lam_parallel_meps_ar19", "hi_lam_parallel", True, 3, 19, 4, None),
        # latent ensemble family: deterministic prior-mean rollout cost
        ("graph_efm_meps_ar4", "graph_efm", False, None, 4, 4, None),
    ]
    records = []
    for name, model_name, hier, levels, ar, batch, cd in configs:
        try:
            records.append(run_config(name, model_name, hier, levels, ar,
                                      batch, cd))
        except Exception as e:  # keep the suite going
            print(f"{name}: FAILED ({e})", file=sys.stderr)
            records.append({"config": name, "error": str(e)})
    try:
        records.append(run_global_config("prob_model_global_0p7deg"))
    except Exception as e:
        print(f"prob_model_global_0p7deg: FAILED ({e})", file=sys.stderr)
        records.append({"config": "prob_model_global_0p7deg",
                        "error": str(e)})
    with open("benchmarks.jsonl", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    print(json.dumps(records, indent=2))


if __name__ == "__main__":
    main()
