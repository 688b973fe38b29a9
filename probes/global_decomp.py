"""Attribute the prob_model_global config's device time (round-5).

The global hi_efm config (131k grid, 13446-node icosahedral mesh) runs
52.7 ms/predict-step — 3.4x below the LAM configs in mesh-node
updates/s/chip (benchmarks.jsonl). This probe separates the candidate
causes with real measurements on the TPU:

  1. model-family overhead: hi_efm vs hi_lam vs graph_lam on the SAME
     global graph (latent prior head, hierarchical sweeps);
  2. per-op attribution: jax.profiler trace of K predict steps summarized
     with trace_summary (names the XLA gathers / Pallas kernels).

Usage: python probes/global_decomp.py [trace] [refinements] [n_levels]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def build(model_name="hi_efm", refinements=5, n_levels=3, n_lon=512,
          n_lat=256, hierarchical=True):
    import jax

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
        n_levels=n_levels, hierarchical=hierarchical,
    )
    graph = graph_from_bundle(bundle)
    args = ModelArgs(hidden_dim=64, processor_layers=4)
    model = MODELS[model_name](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params, datastore


def inputs(datastore, batch=4):
    import jax.numpy as jnp

    n = datastore.num_grid_points
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((batch, n, 17)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((batch, n, 17)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((batch, n, 18)), jnp.float32)
    return prev, prevprev, forcing


def main():
    from bench import measure_steps_ms

    do_trace = "trace" in sys.argv[1:]
    refinements = int(sys.argv[sys.argv.index("trace") + 1]) if False else 5

    results = {}
    for name in ("graph_lam", "hi_lam", "hi_efm"):
        t0 = time.time()
        model, params, ds = build(
            model_name=name,
            hierarchical=name != "graph_lam",
            n_levels=3 if name != "graph_lam" else None,
        )
        prev, prevprev, forcing = inputs(ds)
        build_s = time.time() - t0
        ms = measure_steps_ms(model, params, prev, prevprev, forcing)
        results[name] = round(ms, 2)
        print(f"[global_decomp] {name:10s} {ms:7.2f} ms/predict-step "
              f"(build {build_s:.0f}s, N_mesh={model.num_mesh_nodes})",
              flush=True)

        if do_trace and name == "hi_efm":
            import jax

            from neural_lam_tpu.trace_summary import summarize

            arrays = model.arrays()

            def make(K):
                import jax.numpy as jnp

                def many(arrays, params, a, b, c):
                    m = model.with_arrays(arrays)
                    init_states = jnp.stack([b, a], axis=1)
                    forc = jnp.broadcast_to(
                        c[:, None], (c.shape[0], K) + c.shape[1:])
                    true = jnp.broadcast_to(
                        a[:, None], (a.shape[0], K) + a.shape[1:])
                    pred, _ = m.unroll_prediction(params, init_states,
                                                  forc, true)
                    return pred[:, -1].sum()

                return jax.jit(many)

            f = make(10)
            float(f(arrays, params, prev, prevprev, forcing))  # compile
            tdir = tempfile.mkdtemp(prefix="global_trace_")
            jax.profiler.start_trace(tdir)
            float(f(arrays, params, prev, prevprev, forcing))
            jax.profiler.stop_trace()
            s = summarize(tdir, top=25)
            print(f"[global_decomp] trace total {s['total_ms']:.1f} ms "
                  f"({len(s['files'])} planes)")
            for row in s["top"]:
                print(f"  {row['ms']:9.3f} ms x{row['count']:<5d} "
                      f"{row['op']}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
