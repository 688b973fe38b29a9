"""Where does the g2m stage's time go? (bf16 composed delta is ~1.17 ms
vs an ~0.3 ms traffic floor — the worst relative gap in the step.)

Builds the MEPS graph and times cumulative variants of the g2m GNN on a
fixed flat grid table, scan-K differenced:

  tf        : sender transform over the (N_grid, B*h) table
  +gather   : + jnp.take of the 110592 g2m edge rows
  +slice    : control — same row count as a contiguous slice (random
              access removed); gather cost = (+gather) - (+slice) rows
  +kernel   : + the Pallas edge tail (messages, fold, aggr MLP,
              residual) — the full _apply_inet_flat g2m round

Usage: python probes/g2m_breakdown.py [fp32]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NX, NY, HIDDEN, LAYERS, BATCH = 268, 238, 64, 4, 4
K_BIG, N_TRIALS = 20, 5


def timed_ms(make, *args):
    res = {}
    for K in (1, K_BIG):
        f = make(K)
        float(f(*args))
        ts = []
        for _ in range(N_TRIALS):
            t0 = time.time()
            float(f(*args))
            ts.append(time.time() - t0)
        res[K] = float(np.median(ts))
    return (res[K_BIG] - res[1]) / (K_BIG - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model
    from neural_lam_tpu.models.base_graph_model import expand_to_batch
    from neural_lam_tpu.ops.message_passing import (
        _apply_inet_flat,
        embed_edge_features,
        node_transform_from_flat,
    )

    fp32 = "fp32" in sys.argv[1:]
    cd = None if fp32 else jnp.bfloat16
    t0 = time.time()
    model, params, ds = _build_model(
        nx=NX, ny=NY, hidden_dim=HIDDEN, processor_layers=LAYERS,
        n_features={"state": 17, "forcing": 6, "static": 4}, n_timesteps=8,
    )
    model.compute_dtype = cd
    print(f"built in {time.time() - t0:.1f}s", file=sys.stderr)
    g2m = model.graph.g2m
    n = ds.num_grid_points
    h = HIDDEN
    W = BATCH * h
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((n, W)),
                        jnp.bfloat16 if cd else jnp.float32)
    mesh_emb0 = jnp.asarray(rng.standard_normal((model.num_mesh_nodes, h)),
                            jnp.float32)
    w0 = params["g2m_gnn"]["edge_mlp"]["layers"][0]["w"]
    h_ = w0.shape[0] // 3
    w_j = w0[h_:2 * h_]
    ew = embed_edge_features(params["g2m_embedder"], g2m,
                             compute_dtype=cd)
    senders = g2m.senders
    m_edges = int(senders.shape[0])

    def scanned(body):
        def make(K):
            @jax.jit
            def f(x):
                def step(c, _):
                    out = body(x * (1.0 + c * 1e-30))
                    return out.sum().astype(jnp.float32), ()

                s, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
                return s

            return f

        return make

    def v_tf(x):
        t = node_transform_from_flat(x, w_j, BATCH, cd)
        return t.astype(cd) if cd else t

    def v_gather(x):
        return jnp.take(v_tf(x), senders, axis=0)

    def v_slice(x):
        t = v_tf(x)
        reps = -(-m_edges // t.shape[0])
        return jnp.concatenate([t] * reps, axis=0)[:m_edges]

    def v_kernel(x):
        rec = expand_to_batch(mesh_emb0, BATCH)
        out = _apply_inet_flat(
            params["g2m_gnn"], g2m, x, rec, update_edges=False,
            aggr="sum", compute_dtype=cd, ew=ew,
        )
        return out

    rows = {}
    for name, body in (("tf", v_tf), ("tf+gather", v_gather),
                       ("tf+slice", v_slice), ("full_g2m", v_kernel)):
        ms = timed_ms(scanned(body), table)
        rows[name] = round(ms, 3)
        print(f"{name:12s} {ms:7.3f} ms", file=sys.stderr, flush=True)
    import json

    print(json.dumps({"dtype": "fp32" if fp32 else "bf16",
                      "edges": m_edges, **rows}))


if __name__ == "__main__":
    main()
