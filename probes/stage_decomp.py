"""Composed-step stage decomposition on the real TPU.

Times truncated variants of the GraphLAM predict step inside the same
K-step scan harness bench.py uses, so per-stage costs are measured in
COMPOSED context (earlier knockout/isolated-stage profiling was
non-additive). Each variant folds its last intermediate into the carry
via a *(1 + sum*1e-30) scalar so nothing is DCE'd or hoisted while the
added cost (one read+write of the state array) is identical across
variants and cancels in differences.

Usage: python probes/stage_decomp.py [bf16]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NX, NY, HIDDEN, LAYERS, BATCH = 268, 238, 64, 4, 4
K_BIG, N_TRIALS = 20, 5

STAGES = [
    "harness-floor",      # 0: carry update only
    "+grid_embed",        # 1
    "+g2m",               # 2
    "+enc_grid_mlp",      # 3
    "+processor",         # 4
    "+m2g",               # 5
    "full-step",          # 6
]

# flat-grid fused path (the path the TPU actually runs since the fused
# decoder landed): grid embed emits flat, enc+m2g+output are one kernel
FLAT_STAGES = [
    "harness-floor",      # 0
    "+grid_embed_flat",   # 1
    "+g2m_flat",          # 2
    "+processor",         # 3
    "+m2g_gather",        # 4: mesh send transform + edge gather
    "+decode_kernel",     # 5: fused grid-update kernel (flat out)
    "full-step",          # 6: + slice/unflatten/rescale/residual
]


def flat_variant_step(m, params, ctx, prev_state, prev_prev_state, forcing,
                      stage):
    import jax.numpy as jnp

    from neural_lam_tpu.models.base_graph_model import expand_to_batch
    from neural_lam_tpu.ops.message_passing import (
        _apply_inet_flat,
        apply_mlp_concat_flat,
        node_transform_flat,
    )

    cd = m.compute_dtype
    B = prev_state.shape[0]
    h = m.args.hidden_dim

    def out_of(*xs):
        s = sum(x.sum().astype(jnp.float32) for x in xs)
        return prev_state * (1.0 + s * 1e-30)

    if stage == 0:
        return out_of(prev_state)
    ge_f = apply_mlp_concat_flat(
        params["grid_embedder"],
        [prev_state, prev_prev_state, forcing,
         m.statics.grid_static_features],
        compute_dtype=cd,
    )
    if stage == 1:
        return out_of(ge_f)
    mesh_rep = _apply_inet_flat(
        params["g2m_gnn"], m.graph.g2m, ge_f,
        expand_to_batch(ctx["mesh_emb"], B),
        update_edges=False, aggr="sum", compute_dtype=cd,
        ew=ctx["g2m"]["ew"],
    )
    if stage == 2:
        return out_of(mesh_rep, ge_f)
    mesh_rep = m.process_step(params, mesh_rep, B, ctx=ctx)
    if stage == 3:
        return out_of(mesh_rep, ge_f)
    w0m = params["m2g_gnn"]["edge_mlp"]["layers"][0]["w"]
    send_tf = node_transform_flat(mesh_rep, w0m[h:2 * h], cd)
    if cd is not None:
        send_tf = send_tf.astype(cd)
        ge_f = ge_f.astype(cd)
    gathered = jnp.take(send_tf, m.graph.m2g.senders, axis=0)
    if stage == 4:
        return out_of(gathered, ge_f)
    if stage == 5:
        from neural_lam_tpu.ops.pallas_grid_update import (
            grid_update_flat,
            pack_grid_update_params,
        )

        m2g = m.graph.m2g
        net_f = grid_update_flat(
            gathered, ctx["m2g"]["ew"], ge_f,
            m2g.mask.reshape(m2g.num_virt, m2g.dense_k),
            pack_grid_update_params(params), m2g.dense_k, False,
        )
        return out_of(net_f)
    out, _ = m._predict_step_flat_grid(
        params, prev_state, prev_prev_state, forcing, ctx, B
    )
    return out


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model
    from neural_lam_tpu.models.base_graph_model import expand_to_batch
    from neural_lam_tpu.ops.mlp import apply_mlp, apply_mlp_concat

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
    print(f"built in {time.time()-t0:.1f}s N_grid={n} "
          f"N_mesh={model.num_mesh_nodes}", file=sys.stderr)
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((BATCH, n, d_f)), jnp.float32)
    statics_b = None  # built under jit from model arrays

    def variant_step(m, params, ctx, prev_state, prev_prev_state, forcing,
                     stage):
        cd = m.compute_dtype
        B = prev_state.shape[0]

        def out_of(*xs):
            s = sum(x.sum().astype(jnp.float32) for x in xs)
            return prev_state * (1.0 + s * 1e-30)

        if stage == 0:
            return out_of(prev_state)
        grid_emb = apply_mlp_concat(
            params["grid_embedder"],
            [prev_state, prev_prev_state, forcing,
             expand_to_batch(m.statics.grid_static_features, B)],
            compute_dtype=cd,
        )
        if stage == 1:
            return out_of(grid_emb)
        mesh_rep = m._inet_static(
            params["g2m_gnn"], m.graph.g2m, grid_emb,
            expand_to_batch(ctx["mesh_emb"], B), ctx["g2m"], B,
        )
        if stage == 2:
            return out_of(mesh_rep, grid_emb)
        grid_rep = grid_emb + apply_mlp(
            params["encoding_grid_mlp"], grid_emb, compute_dtype=cd
        )
        if stage == 3:
            return out_of(mesh_rep, grid_rep)
        mesh_rep = m.process_step(params, mesh_rep, B, ctx=ctx)
        if stage == 4:
            return out_of(mesh_rep, grid_rep)
        grid_rep = m._inet_static(
            params["m2g_gnn"], m.graph.m2g, mesh_rep, grid_rep, ctx["m2g"], B,
        )
        if stage == 5:
            return out_of(grid_rep)
        net_output = apply_mlp(params["output_map"], grid_rep,
                               compute_dtype=cd)
        rescaled = net_output * m.statics.diff_std + m.statics.diff_mean
        return prev_state + rescaled

    dummy_ctx = model.precompute_rollout_ctx(params)
    use_flat = model._flat_grid_eligible(params, dummy_ctx, BATCH)
    stages = FLAT_STAGES if use_flat else STAGES
    step_fn = flat_variant_step if use_flat else variant_step
    print(f"path: {'flat-grid fused' if use_flat else 'batched'}",
          file=sys.stderr)

    def make(K, stage):
        def many(arrays, params, a, b, c):
            m = model.with_arrays(arrays)
            ctx = m.precompute_rollout_ctx(params)

            def body(carry, _):
                p, pp = carry
                new = step_fn(m, params, ctx, p, pp, c, stage)
                return (new, p), ()

            (fin, _), _ = jax.lax.scan(body, (a, b), None, length=K)
            return fin.sum()

        return jax.jit(many)

    arrays = model.arrays()
    results = {}
    for stage, name in enumerate(stages):
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
        print(f"stage {stage} {name:16s}: {ms:7.3f} ms/step "
              f"(delta {ms - prev_ms:+7.3f})", file=sys.stderr)
    print(json.dumps({"mode": "bf16" if bf16 else "fp32",
                      "composed_ms": results}))


if __name__ == "__main__":
    main()
