"""Decisive probes for the composed-vs-isolated decode gap (~0.7 ms).

Hypotheses (docs/ROADMAP.md "Remaining fwd step headroom"):
  H1  the kron-widening of the decode/edge kernel params
      (`_prep_consts` inside `grid_update_flat`) re-runs every scan
      iteration because XLA's while-loop LICM declines to hoist the
      multi-MB widened buffers;
  H2  plain scan scheduling overhead (test: unroll=2).

Probe A times a scan whose body is ONLY `_prep_consts` + an epsilon fold
into the carry: if ~0 ms/step XLA hoists it and H1 is dead; if ~the gap,
H1 is confirmed and the fix is to thread precomputed consts through the
rollout ctx. Probe B times the full predict step with scan unroll=2.

Usage: python probes/compose_gap.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NX, NY, HIDDEN, LAYERS, BATCH = 268, 238, 64, 4, 4
K_BIG, N_TRIALS = 20, 5


def timed(make, arrays, params, a, b, c):
    import jax

    def run(K):
        f = jax.jit(make(K))
        best = np.inf
        for _ in range(N_TRIALS):
            t0 = time.perf_counter()
            float(f(arrays, params, a, b, c))
            best = min(best, time.perf_counter() - t0)
        return best

    run(1)      # compile both
    run(K_BIG)
    return (run(K_BIG) - run(1)) / (K_BIG - 1) * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model
    from neural_lam_tpu.ops.pallas_grid_update import (
        _prep_consts, pack_grid_update_params,
    )

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

    # --- probe A: prep-consts-only scan body ---
    def make_prep(K):
        def many(arrays, params, a, b, c):
            pp = pack_grid_update_params(params)

            def body(carry, _):
                consts = _prep_consts(pp, BATCH)
                eps = sum(jnp.sum(v) for v in consts.values()
                          if hasattr(v, "dtype")) * 1e-30
                return carry * (1.0 + eps), None

            fin, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=K)
            return fin

        return many

    ms = timed(make_prep, arrays, params, a, b, c)
    print(f"A: _prep_consts in scan body: {ms:.3f} ms/step "
          f"(~0 => hoisted, H1 dead)")

    # --- probe B: full predict step, unroll=1 vs 2 ---
    def make_full(K, unroll):
        def many(arrays, params, a, b, c):
            m = model.with_arrays(arrays)
            ctx = m.precompute_rollout_ctx(params)

            def body(carry, _):
                prev, prevprev = carry
                out, _ = m.predict_step(params, prev, prevprev, c, ctx=ctx)
                return (out, prev), None

            (fin, _), _ = jax.lax.scan(body, (a, b), None, length=K,
                                       unroll=unroll)
            return fin.sum()

        return many

    for unroll in (1, 2):
        ms = timed(lambda K, u=unroll: make_full(K, u),
                   arrays, params, a, b, c)
        print(f"B: full step scan unroll={unroll}: {ms:.3f} ms/step")


if __name__ == "__main__":
    main()
