"""A/B: fused in-kernel windowed m2g sender gather vs XLA gather + decode.

Bench-scale GraphLAM predict step, scan-K differencing (see bench.py).
Usage: python probes/win_gather.py [bf16]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NX, NY, HIDDEN, LAYERS, BATCH = 268, 238, 64, 4, 4


def main():
    import jax.numpy as jnp

    from __graft_entry__ import _build_model
    from bench import measure_steps_ms

    t0 = time.time()
    model, params, ds = _build_model(
        nx=NX, ny=NY, hidden_dim=HIDDEN, processor_layers=LAYERS,
        n_features={"state": 17, "forcing": 6, "static": 4}, n_timesteps=8,
    )
    print(f"built in {time.time()-t0:.1f}s win_static={model._m2g_win_static}",
          file=sys.stderr)
    if "bf16" in sys.argv:
        model.compute_dtype = jnp.bfloat16
    n = ds.num_grid_points
    d = ds.get_num_data_vars("state")
    d_f = ds.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    forc = jnp.asarray(rng.standard_normal((BATCH, n, d_f)), jnp.float32)

    ms_win = measure_steps_ms(model, params, prev, prevprev, forc)
    print(f"win-gather : {ms_win:.3f} ms/predict-step", file=sys.stderr)

    model_off = model.with_arrays(model.arrays())
    model_off.m2g_win = None
    ms_off = measure_steps_ms(model_off, params, prev, prevprev, forc)
    print(f"xla-gather : {ms_off:.3f} ms/predict-step", file=sys.stderr)
    print(f"delta: {ms_off - ms_win:+.3f} ms", file=sys.stderr)

    # numerics check on device
    o1, _ = model.predict_step(params, prev, prevprev, forc)
    o2, _ = model_off.predict_step(params, prev, prevprev, forc)
    print("max abs diff:", float(jnp.max(jnp.abs(o1 - o2))), file=sys.stderr)


if __name__ == "__main__":
    main()
