"""Dump the optimized HLO of the bf16 train step and print the named
fusions' internals (identify slow fusions from trace_summary)."""
import os
import sys

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

    txt = jax.jit(many).lower(arrays, params, opt_state, batch).compile().as_text()
    with open("/tmp/train_bf16_hlo.txt", "w") as f:
        f.write(txt)
    print("bytes:", len(txt))


if __name__ == "__main__":
    main()
