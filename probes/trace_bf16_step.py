"""Trace the bf16 predict step and the bf16 train step at bench scale,
then summarize per-op device time via trace_summary.

Names the real top costs of the current composed steps so optimization
targets come from the device, not from the analytic model alone.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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

    K = 20

    def many(arrays, params, a, b, c):
        m = model.with_arrays(arrays)
        init_states = jnp.stack([b, a], axis=1)
        forc = jnp.broadcast_to(c[:, None], (c.shape[0], K) + c.shape[1:])
        true_states = jnp.broadcast_to(a[:, None], (a.shape[0], K) + a.shape[1:])
        pred, _ = m.unroll_prediction(params, init_states, forc, true_states)
        return pred[:, -1].sum()

    f = jax.jit(many)
    float(f(arrays, params, prev, prevprev, forcing))  # compile + warm

    tdir = "/tmp/nlt_trace_bf16"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        float(f(arrays, params, prev, prevprev, forcing))
    time.sleep(1)

    from neural_lam_tpu.trace_summary import summarize

    res = summarize(tdir, line_filter="xla op")
    print(f"=== bf16 predict, {K} steps scanned; per-step = ms/{K} ===")
    print(f"    total {res['total_ms']:.2f} ms "
          f"({res['total_ms'] / K:.3f} ms/step)")
    for row in res["top"][:28]:
        print(f"  {row['ms'] / K * 1e3:9.1f} us/step  x{row['count']:5d}  "
              f"{row['op']}")


if __name__ == "__main__":
    main()
