"""Benchmark: GraphLAM forward rollout at full-MEPS scale on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Configuration mirrors the reference's headline setting (MEPS 268x238 grid,
17 state / 6 forcing (x3 window) / 4 static features, hidden_dim 64,
4 processor layers — see BASELINE.md). The metric is mesh-node updates/s/chip
(N_mesh x processor_layers x predict-steps/s x batch); the reference
publishes no numbers (BASELINE.md), so vs_baseline is relative to the
recorded first measurement in bench_baseline.json (1.0 when absent).
"""

import json
import os
import sys
import time

import numpy as np

NX, NY = 268, 238
HIDDEN = 64
LAYERS = 4
BATCH = 4
N_WARMUP = 3
N_ITERS = 20
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
BASELINE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _build_model

    graph_dir = os.path.join(CACHE, f"graph_{NX}x{NY}")
    have_graph = os.path.exists(os.path.join(graph_dir, "graph.npz"))
    t0 = time.time()
    model, params, datastore = _build_model(
        nx=NX, ny=NY, hidden_dim=HIDDEN, processor_layers=LAYERS,
        n_features={"state": 17, "forcing": 6, "static": 4},
        graph_dir=None if not have_graph else None, n_timesteps=8,
    )
    print(f"[bench] model+graph built in {time.time() - t0:.1f}s "
          f"(N_grid={datastore.num_grid_points}, "
          f"N_mesh={model.num_mesh_nodes})", file=sys.stderr)

    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    d_f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(0)
    prev_state = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    prev_prev = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((BATCH, n, d_f)), jnp.float32)

    @jax.jit
    def step(params, prev_state, prev_prev, forcing):
        new_state, _ = model.predict_step(params, prev_state, prev_prev, forcing)
        return new_state

    t0 = time.time()
    out = step(params, prev_state, prev_prev, forcing)
    jax.block_until_ready(out)
    print(f"[bench] compile+first step {time.time() - t0:.1f}s", file=sys.stderr)

    for _ in range(N_WARMUP):
        out = step(params, out, prev_state, forcing)
    jax.block_until_ready(out)

    t0 = time.time()
    for _ in range(N_ITERS):
        out = step(params, out, prev_state, forcing)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / N_ITERS

    steps_per_s = 1.0 / dt
    mesh_updates_per_s = model.num_mesh_nodes * LAYERS * steps_per_s * BATCH
    print(
        f"[bench] {dt * 1e3:.2f} ms/predict-step (batch {BATCH}), "
        f"{steps_per_s * BATCH:.2f} rollout steps/s, "
        f"{mesh_updates_per_s:.3e} mesh-node updates/s/chip",
        file=sys.stderr,
    )

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f).get("mesh_node_updates_per_s")
        if base:
            vs_baseline = mesh_updates_per_s / base
    else:
        os.makedirs(os.path.dirname(BASELINE_FILE), exist_ok=True)
        with open(BASELINE_FILE, "w") as f:
            json.dump({"mesh_node_updates_per_s": mesh_updates_per_s,
                       "recorded": time.time()}, f)

    print(json.dumps({
        "metric": "mesh_node_updates_per_s_per_chip",
        "value": mesh_updates_per_s,
        "unit": "updates/s",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
