"""A/B: rollout scan with ctx-hoisted widened kernel consts vs without.

Measures the full flat predict step in the same scan harness as
probes/compose_gap.py, with `precompute_rollout_ctx(params)` (consts
re-widened inside every scan iteration unless XLA hoists them) vs
`precompute_rollout_ctx(params, batch_size=B)` (consts precomputed
outside the scan and threaded through ctx).

Usage: python probes/consts_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NX, NY, HIDDEN, LAYERS, BATCH = 268, 238, 64, 4, 4
K_BIG, N_TRIALS = 20, 7


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model

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
    arrays = model.arrays()

    def make(K, with_bs):
        def many(arrays, params, a, b, c):
            m = model.with_arrays(arrays)
            ctx = m.precompute_rollout_ctx(
                params, batch_size=BATCH if with_bs else None
            )

            def body(carry, _):
                prev, prevprev = carry
                out, _ = m.predict_step(params, prev, prevprev, c, ctx=ctx)
                return (out, prev), None

            (fin, _), _ = jax.lax.scan(body, (a, b), None, length=K)
            return fin.sum()

        return jax.jit(many)

    for label, with_bs in (("no consts ", False), ("ctx consts", True)):
        per = {}
        for K in (1, K_BIG):
            f = make(K, with_bs)
            float(f(arrays, params, a, b, c))
            best = np.inf
            for _ in range(N_TRIALS):
                t0 = time.perf_counter()
                float(f(arrays, params, a, b, c))
                best = min(best, time.perf_counter() - t0)
            per[K] = best
        ms = (per[K_BIG] - per[1]) / (K_BIG - 1) * 1000.0
        print(f"{label}: {ms:.3f} ms/step")


if __name__ == "__main__":
    main()
