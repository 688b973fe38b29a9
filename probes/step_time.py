"""Minimal full-predict-step timer at bench scale (fp32 [+ bf16]).

Usage: [NLT_FLAT_ROWS=N] python probes/step_time.py [bf16]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax.numpy as jnp

    from __graft_entry__ import _build_model
    from bench import measure_steps_ms

    model, params, ds = _build_model(
        nx=268, ny=238, hidden_dim=64, processor_layers=4,
        n_features={"state": 17, "forcing": 6, "static": 4}, n_timesteps=8,
    )
    n = ds.num_grid_points
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((4, n, 17)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((4, n, 17)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((4, n, 18)), jnp.float32)
    if "bf16" in sys.argv[1:]:
        model.compute_dtype = jnp.bfloat16
    ms = measure_steps_ms(model, params, prev, prevprev, forcing)
    print(f"rows={os.environ.get('NLT_FLAT_ROWS', '1024')} "
          f"mode={'bf16' if 'bf16' in sys.argv[1:] else 'fp32'}: "
          f"{ms:.2f} ms/predict-step", file=sys.stderr)


if __name__ == "__main__":
    main()
