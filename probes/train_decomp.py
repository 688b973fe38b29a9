"""Backward-pass stage decomposition: fwd+bwd cost of truncated predict
steps, measured in composed context (same scan harness as stage_decomp,
but each stage's scalar output is differentiated wrt params and states,
and the grads are folded into the carry).

Stage deltas = incremental fwd+bwd cost of each stage. Compare against
probes/stage_decomp.py (fwd only) to see each stage's bwd multiplier.

Usage: python probes/train_decomp.py [bf16]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from stage_decomp import FLAT_STAGES, flat_variant_step

NX, NY, HIDDEN, LAYERS, BATCH = 268, 238, 64, 4, 4
K_BIG, N_TRIALS = 10, 5


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model

    bf16 = "bf16" in sys.argv[1:]
    t0 = time.time()
    model, params, ds = _build_model(
        nx=NX, ny=NY, hidden_dim=HIDDEN, processor_layers=LAYERS,
        n_features={"state": 17, "forcing": 6, "static": 4}, n_timesteps=8,
    )
    if bf16:
        model.compute_dtype = jnp.bfloat16
    n = ds.num_grid_points
    d = ds.get_num_data_vars("state")
    d_f = ds.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((BATCH, n, d_f)), jnp.float32)

    dummy_ctx = model.precompute_rollout_ctx(params)
    assert model._flat_grid_eligible(params, dummy_ctx, BATCH), \
        "probe expects the flat fused path"
    print(f"built in {time.time()-t0:.1f}s", file=sys.stderr)

    def make(K, stage):
        def many(arrays, params, a, b, c):
            m = model.with_arrays(arrays)

            def loss_of(p, a_, b_):
                ctx = m.precompute_rollout_ctx(p)
                out = flat_variant_step(m, p, ctx, a_, b_, c, stage)
                return out.sum()

            def body(carry, _):
                p_st, a_, b_ = carry
                val, grads = jax.value_and_grad(loss_of, argnums=(0, 1, 2))(
                    params, a_, b_
                )
                gp, ga, gb = grads
                gsum = sum(
                    x.sum().astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves(gp)
                ) + ga.sum() + gb.sum() + val
                new_a = a_ * (1.0 + gsum * 1e-30)
                return (p_st + gsum, new_a, b_), ()

            (s, fin, _), _ = jax.lax.scan(
                body, (jnp.float32(0.0), a, b), None, length=K)
            return s + fin.sum()

        return jax.jit(many)

    arrays = model.arrays()
    results = {}
    for stage, name in enumerate(FLAT_STAGES):
        per = {}
        for K in (1, K_BIG):
            f = make(K, stage)
            float(f(arrays, params, prev, prevprev, forcing))
            ts = []
            for _ in range(N_TRIALS):
                t1 = time.time()
                float(f(arrays, params, prev, prevprev, forcing))
                ts.append(time.time() - t1)
            per[K] = float(np.median(ts))
        ms = (per[K_BIG] - per[1]) / (K_BIG - 1) * 1e3
        results[name] = round(ms, 3)
        prev_ms = list(results.values())[-2] if stage else 0.0
        print(f"stage {stage} {name:16s}: {ms:7.3f} ms fwd+bwd "
              f"(delta {ms - prev_ms:+7.3f})", file=sys.stderr)
    print(json.dumps({"mode": "bf16" if bf16 else "fp32",
                      "fwdbwd_composed_ms": results}))


if __name__ == "__main__":
    main()
