"""Single-chip overhead of the sharded predict-step bodies.

Multi-chip is unavailable here, but the per-shard COMPUTE cost of each
sharding scheme is measurable on one chip with n_space=1 (collectives
degenerate to identity): any slowdown vs the unsharded step is pure
scheme overhead (padding, chunk layouts, shard_map).

Usage: python probes/rs_overhead.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NX, NY, HIDDEN, LAYERS, BATCH = 268, 238, 64, 4, 4
K_BIG, N_TRIALS = 20, 5


def measure(model, params, a, b, c):
    import jax
    import jax.numpy as jnp

    arrays = model.arrays()

    def make(K):
        def many(arrays, params, a, b, c):
            m = model.with_arrays(arrays)
            ctx = m.precompute_rollout_ctx(params)

            def body(carry, _):
                prev, prevprev = carry
                out, _ = m.predict_step(params, prev, prevprev, c, ctx=ctx)
                return (out, prev), None

            (fin, _), _ = jax.lax.scan(body, (a, b), None, length=K)
            return fin.sum()

        return jax.jit(many)

    def run(K):
        f = make(K)
        best = np.inf
        for _ in range(N_TRIALS):
            t0 = time.perf_counter()
            float(f(arrays, params, a, b, c))
            best = min(best, time.perf_counter() - t0)
        return best

    run(1)
    run(K_BIG)
    return (run(K_BIG) - run(1)) / (K_BIG - 1) * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model
    from neural_lam_tpu.parallel.grid_sharded import spatialize, spatialize_rs
    from neural_lam_tpu.parallel.mesh import make_mesh

    model, params, datastore = _build_model(
        nx=NX, ny=NY, hidden_dim=HIDDEN, processor_layers=LAYERS,
        n_features={"state": 17, "forcing": 6, "static": 4}, n_timesteps=8,
    )
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    d_f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((BATCH, n, d_f)), jnp.float32)

    base = measure(model, params, a, b, c)
    print(f"unsharded:            {base:.3f} ms/predict-step")

    mesh = make_mesh(n_data=1, n_space=1)
    for name, fn in (("grid (S=1)", spatialize),
                     ("mesh_rs (S=1)", spatialize_rs)):
        sp = fn(model, mesh)
        ms = measure(sp, params, a, b, c)
        print(f"{name:20s}  {ms:.3f} ms/predict-step "
              f"({100 * (ms / base - 1):+.1f}% vs unsharded)")


if __name__ == "__main__":
    main()
