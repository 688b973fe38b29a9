"""Full TRAIN-step cost (fwd + bwd + AdamW) at the bench configuration.

bench.py's headline is the forward predict step; training throughput is
what actually gates a run. The flat Pallas kernels carry custom VJPs that
recompute the forward through plain-XLA flat math, so the bwd:fwd ratio
is not the usual ~2x — this probe measures it.

Scan-K differencing with (params, opt_state) as the scan carry: every
iteration performs a real optimizer update, so no loop-invariant code
motion can hollow the measurement out.

Usage: python probes/train_step.py [bf16] [ar=N]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NX, NY, HIDDEN, LAYERS, BATCH = 268, 238, 64, 4, 4
K_BIG, N_TRIALS = 10, 5


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_model

    bf16 = "bf16" in sys.argv[1:]
    ar_steps = 1
    for a in sys.argv[1:]:
        if a.startswith("ar="):
            ar_steps = int(a.split("=")[1])

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
    print(f"built in {time.time()-t0:.1f}s ar_steps={ar_steps} "
          f"mode={'bf16' if bf16 else 'fp32'}", file=sys.stderr)

    rng = np.random.default_rng(0)
    init_states = jnp.asarray(
        rng.standard_normal((BATCH, 2, n, d)), jnp.float32)
    target = jnp.asarray(
        rng.standard_normal((BATCH, ar_steps, n, d)), jnp.float32)
    forcing = jnp.asarray(
        rng.standard_normal((BATCH, ar_steps, n, d_f)), jnp.float32)
    times = jnp.zeros((BATCH, ar_steps), jnp.int64) \
        if False else jnp.zeros((BATCH, ar_steps), jnp.float32)
    batch = (init_states, target, forcing, times)

    optimizer = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.01)
    opt_state = optimizer.init(params)
    arrays = model.arrays()

    def make(K):
        def many(arrays, params, opt_state, batch):
            m = model.with_arrays(arrays)

            def body(carry, _):
                p, o = carry
                loss, grads = jax.value_and_grad(m.training_loss)(p, batch)
                updates, o = optimizer.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o), loss

            (p, _), losses = jax.lax.scan(
                body, (params, opt_state), None, length=K)
            return losses.sum() + sum(
                x.sum().astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(p)
                if jnp.issubdtype(x.dtype, jnp.floating)
            )

        return jax.jit(many)

    results = {}
    for K in (1, K_BIG):
        f = make(K)
        t0 = time.time()
        float(f(arrays, params, opt_state, batch))
        print(f"K={K} compile+run {time.time()-t0:.1f}s", file=sys.stderr)
        ts = []
        for _ in range(N_TRIALS):
            t1 = time.time()
            float(f(arrays, params, opt_state, batch))
            ts.append(time.time() - t1)
        results[K] = float(np.median(ts))
    ms = (results[K_BIG] - results[1]) / (K_BIG - 1) * 1e3
    print(json.dumps({
        "mode": "bf16" if bf16 else "fp32", "ar_steps": ar_steps,
        "train_step_ms": round(ms, 2),
        "train_ms_per_predict_step": round(ms / ar_steps, 2),
        "samples_per_s": round(BATCH * 1000.0 / ms, 2),
    }))


if __name__ == "__main__":
    main()
