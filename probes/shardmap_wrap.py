"""Does a trivial shard_map wrapper change the unsharded step's schedule?

probes/rs_overhead.py found the grid-sharded body at S=1 runs ~11% FASTER
than the plain unsharded predict step despite identical edge-set layouts.
The only structural difference is the shard_map scope. This probe times
the UNSHARDED predict step (a) plain, (b) wrapped in shard_map over a
1x1 ('data','space') mesh with fully-replicated specs, (c) wrapped with
batch sharded over 'data' only — isolating whether the shard_map scope
itself (manual-sharding compilation) is responsible.

Usage: python probes/shardmap_wrap.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NX, NY, HIDDEN, LAYERS, BATCH = 268, 238, 64, 4, 4
K_BIG, N_TRIALS = 20, 5


def main():
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from __graft_entry__ import _build_model
    from neural_lam_tpu.parallel.mesh import make_mesh

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
    mesh = make_mesh(n_data=1, n_space=1)

    def measure(step):
        def make(K):
            def many(arrays, params, a, b, c):
                m = model.with_arrays(arrays)
                ctx = m.precompute_rollout_ctx(params)

                def body(carry, _):
                    prev, prevprev = carry
                    out = step(m, params, prev, prevprev, c, ctx)
                    return (out, prev), None

                (fin, _), _ = jax.lax.scan(body, (a, b), None, length=K)
                return fin.sum()

            return jax.jit(many)

        def run(K):
            f = make(K)
            best = np.inf
            for _ in range(N_TRIALS):
                t0 = time.perf_counter()
                float(f(arrays, params, a, b, c))
                best = min(best, time.perf_counter() - t0)
            return best

        run(1)
        run(K_BIG)
        return (run(K_BIG) - run(1)) / (K_BIG - 1) * 1000.0

    def plain(m, params, prev, prevprev, c, ctx):
        out, _ = m.predict_step(params, prev, prevprev, c, ctx=ctx)
        return out

    def wrapped_repl(m, params, prev, prevprev, c, ctx):
        def fn(params, prev, prevprev, c, ctx):
            out, _ = m.predict_step(params, prev, prevprev, c, ctx=ctx)
            return out

        return shard_map(fn, mesh=mesh, in_specs=(P(),) * 5,
                         out_specs=P(), check_vma=False)(
            params, prev, prevprev, c, ctx)

    def wrapped_data(m, params, prev, prevprev, c, ctx):
        def fn(params, prev, prevprev, c, ctx):
            out, _ = m.predict_step(params, prev, prevprev, c, ctx=ctx)
            return out

        return shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data"), P()),
            out_specs=P("data"), check_vma=False,
        )(params, prev, prevprev, c, ctx)

    for label, step in (("plain", plain), ("shardmap repl", wrapped_repl),
                        ("shardmap data", wrapped_data)):
        print(f"{label:14s}: {measure(step):.3f} ms/step")

    # fwd+bwd variant: grads of a scalar of the step output wrt params
    def measure_bwd(step):
        def make(K):
            def many(arrays, params, a, b, c):
                m = model.with_arrays(arrays)

                def loss(p, a_, b_):
                    ctx = m.precompute_rollout_ctx(p)
                    return step(m, p, a_, b_, c, ctx).sum()

                def body(carry, _):
                    s, a_, b_ = carry
                    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                        params, a_, b_
                    )
                    gp, ga, gb = grads
                    gsum = sum(
                        x.sum().astype(jnp.float32)
                        for x in jax.tree_util.tree_leaves(gp)
                    ) + ga.sum() + gb.sum() + val
                    return (s + gsum, a_ * (1 + gsum * 1e-30), b_), None

                (s, fin, _), _ = jax.lax.scan(
                    body, (jnp.float32(0.0), a, b), None, length=K)
                return s + fin.sum()

            return jax.jit(many)

        def run(K):
            f = make(K)
            best = np.inf
            for _ in range(N_TRIALS):
                t0 = time.perf_counter()
                float(f(arrays, params, a, b, c))
                best = min(best, time.perf_counter() - t0)
            return best

        run(1)
        run(K_BIG)
        return (run(K_BIG) - run(1)) / (K_BIG - 1) * 1000.0

    for label, step in (("plain bwd", plain), ("shardmap data bwd",
                                               wrapped_data)):
        print(f"{label:18s}: {measure_bwd(step):.3f} ms/step")


if __name__ == "__main__":
    main()
