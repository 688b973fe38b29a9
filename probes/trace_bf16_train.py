"""Trace the bf16 TRAIN step (fwd+bwd+AdamW, ar=1) at bench scale and
summarize per-op device time — names the real backward costs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_model

    model, params, datastore = _build_model(
        nx=268, ny=238, hidden_dim=64, processor_layers=4,
        n_features={"state": 17, "forcing": 6, "static": 4}, n_timesteps=8,
    )
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    d_f = datastore.get_num_data_vars("forcing") * 3
    B = 4
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((B, n, d)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((B, n, d)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((B, n, d_f)), jnp.float32)
    model.compute_dtype = jnp.bfloat16
    arrays = model.arrays()

    init_states = jnp.stack([prevprev, prev], axis=1)
    target = jnp.broadcast_to(prev[:, None], (B, 1, n, d))
    forc = jnp.broadcast_to(forcing[:, None], (B, 1) + forcing.shape[1:])
    batch = (init_states, target, forc, jnp.zeros((B, 1), jnp.float32))
    optimizer = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.01)
    opt_state = optimizer.init(params)
    K = 10

    def many(arrays, params, opt_state, batch):
        m = model.with_arrays(arrays)

        def body(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(m.training_loss)(p, batch)
            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), loss

        (p, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=K)
        return losses.sum() + sum(
            x.sum().astype(jnp.float32)
            for x in jax.tree_util.tree_leaves(p)
            if jnp.issubdtype(x.dtype, jnp.floating)
        )

    f = jax.jit(many)
    float(f(arrays, params, opt_state, batch))

    tdir = "/tmp/nlt_trace_bf16_train"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        float(f(arrays, params, opt_state, batch))
    time.sleep(1)

    from neural_lam_tpu.trace_summary import summarize

    res = summarize(tdir, line_filter="xla op", top=250)
    rows = [r for r in res["top"]
            if r["op"].startswith(("fusion", "custom-call", "while",
                                   "dynamic", "convolution", "convert",
                                   "broadcast", "bitcast", "scatter",
                                   "reduce", "select"))]
    print(f"=== bf16 train, {K} steps scanned ===")
    tot = 0.0
    for r in rows[:45]:
        print(f"  {r['ms'] / K * 1e3:9.1f} us/step  x{r['count']:5d}  "
              f"{r['op'][:110]}")
        if not r["op"].startswith("while"):
            tot += r["ms"] / K
    print(f"  sum (excl while): {tot:.3f} ms/step")


if __name__ == "__main__":
    main()
