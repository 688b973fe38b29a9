"""Sweep the m2m window tile size on the chip: bf16/fp32 predict and the
bf16 train step, per NLT_WIN_ROWS target. The one-hot reconstruct MAC
cost is M*wrows (shrinks with the tile: span ~ tile_v/81 mesh rows + a
2-row halo at MEPS bench scale) while smaller tiles add grid steps and
window-take rows — measure, don't guess."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench as B
    from __graft_entry__ import _build_model

    rows = int(os.environ.get("NLT_WIN_ROWS", "0")) or None
    model, params, datastore = _build_model(
        nx=268, ny=238, hidden_dim=64, processor_layers=4,
        n_features={"state": 17, "forcing": 6, "static": 4}, n_timesteps=8,
    )
    print("win static:", model._m2m_win_static, flush=True)
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    d_f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((4, n, d)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((4, n, d)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((4, n, d_f)), jnp.float32)
    model.compute_dtype = jnp.bfloat16
    ms_bf = B.measure_steps_ms(model, params, prev, prevprev, forcing)
    ms_tr = B.measure_train_step_ms(model, params, prev, prevprev, forcing)
    model.compute_dtype = None
    ms_fp = B.measure_steps_ms(model, params, prev, prevprev, forcing)
    print(f"NLT_WIN_ROWS={rows}: bf16 predict {ms_bf:.2f} ms, "
          f"bf16 train {ms_tr:.2f} ms, fp32 predict {ms_fp:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
