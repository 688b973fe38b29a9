"""Isolated fwd+bwd cost of each flat-path sub-op at MEPS bench scale.

Maps probes/train_decomp.py's composed stage deltas onto individual ops
(real graph EdgeSets, real param shapes), each timed in the scan harness
with value_and_grad wrt its tensor inputs and params:

  g2m_gather    - gather_send_flat from the (N_grid, W) table over g2m
                  (transposed-dense VJP dominates: d_out scatter -> gather)
  g2m_tail      - edge_tail_sum_flat kernel on g2m (analytic bwd kernel)
  m2g_gather    - gather_send_flat from the (N_mesh, W) table over m2g
                  (skewed sender degrees -> transposed padding traffic)
  proc_gather   - gather_send_flat from the (N_mesh, W) table over m2m
  proc_layer    - edge_layer_flat kernel on m2m (analytic bwd kernel)
  decode_kernel - grid_update_flat on m2g (analytic bwd kernel)
  node_tf       - node_transform_flat of the grid table (w_j matmul)
  aggr_mlp      - _aggr_mlp_mixed over mesh receivers + virt fold

Usage: python probes/bwd_breakdown.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NX, NY, HIDDEN, BATCH = 268, 238, 64, 4
K_BIG, N_TRIALS = 10, 5


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model
    from neural_lam_tpu.ops import pallas_edge_flat as pef
    from neural_lam_tpu.ops import pallas_grid_update as pgu
    from neural_lam_tpu.ops.message_passing import (
        _aggr_mlp_mixed,
        _fold_virt_flat,
        gather_send_flat,
        node_transform_flat,
    )

    model, params, ds = _build_model(
        nx=NX, ny=NY, hidden_dim=HIDDEN, processor_layers=4,
        n_features={"state": 17, "forcing": 6, "static": 4}, n_timesteps=8,
    )
    g = model.graph
    h, B = HIDDEN, BATCH
    W = B * h
    rng = np.random.default_rng(0)

    def arr(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)

    n_grid = g.g2m.num_send
    n_mesh = g.m2g.num_send
    grid_tbl = arr(n_grid, W)
    mesh_tbl = arr(n_mesh, W)
    for name, es in (("g2m", g.g2m), ("m2m", g.m2m[0]), ("m2g", g.m2g)):
        t = es.transposed
        real = float(np.asarray(es.mask).sum())
        print(f"{name}: M_pad={es.num_edges} real={int(real)} "
              f"K={es.dense_k} n_virt={es.num_virt} | transposed: "
              f"{'none' if t is None else f'K_T={t.dense_k} n_virt_T={t.num_virt} M_T={t.num_edges}'}",
              file=sys.stderr)

    def timed(loss_fn, *args):
        def make(K):
            def many(*a):
                def body(carry, _):
                    s, xs = carry
                    val, grads = jax.value_and_grad(
                        lambda xs_: loss_fn(*xs_))(xs)
                    gsum = sum(x.sum().astype(jnp.float32)
                               for x in jax.tree_util.tree_leaves(grads))
                    # fold grads back into the inputs so no iteration can
                    # be hoisted out of the loop
                    xs = jax.tree_util.tree_map(
                        lambda x: x * (1.0 + gsum * 1e-30), xs
                    )
                    return (s + val + gsum, xs), None

                (s, _), _ = jax.lax.scan(body, (jnp.float32(0.0), a), None,
                                         length=K)
                return s

            return jax.jit(many)

        per = {}
        for K in (1, K_BIG):
            f = make(K)
            float(f(*args))
            best = np.inf
            for _ in range(N_TRIALS):
                t0 = time.perf_counter()
                float(f(*args))
                best = min(best, time.perf_counter() - t0)
            per[K] = best
        return (per[K_BIG] - per[1]) / (K_BIG - 1) * 1000.0

    results = {}

    def run(name, loss_fn, *args):
        ms = timed(loss_fn, *args)
        results[name] = round(ms, 3)
        print(f"{name:14s}: {ms:7.3f} ms fwd+bwd", file=sys.stderr)

    w2, b2 = arr(h, h), arr(h)
    ls, lb = 1.0 + arr(h) * 0.1, arr(h)
    w_e, b0 = arr(h, h), arr(h)
    w_j = arr(h, h)

    # --- gathers (loss touches output; grads flow to the table) ---
    run("g2m_gather", lambda t: (gather_send_flat(t, g.g2m) ** 2).sum(),
        grid_tbl)
    run("m2g_gather", lambda t: (gather_send_flat(t, g.m2g) ** 2).sum(),
        mesh_tbl)
    run("proc_gather", lambda t: (gather_send_flat(t, g.m2m[0]) ** 2).sum(),
        mesh_tbl)

    # --- kernels ---
    g2m_gathered = jax.lax.stop_gradient(gather_send_flat(grid_tbl, g.g2m))
    g2m_ew = arr(g.g2m.num_edges, h)
    g2m_rec = arr(g.g2m.num_virt, W)
    mask_g2m = g.g2m.mask.reshape(g.g2m.num_virt, g.g2m.dense_k)

    def tail_loss(gathered, rec, w2_, b2_):
        _, v = pef.edge_tail_sum_flat(gathered, g2m_ew, rec, w2_, b2_, ls,
                                      lb, mask_g2m, g.g2m.dense_k)
        return (v ** 2).sum()

    run("g2m_tail", tail_loss, g2m_gathered, g2m_rec, w2, b2)

    m2m = g.m2m[0]
    m2m_gathered = jax.lax.stop_gradient(gather_send_flat(mesh_tbl, m2m))
    m2m_edge = arr(m2m.num_edges, W)
    m2m_rec = arr(m2m.num_virt, W)
    mask_m2m = m2m.mask.reshape(m2m.num_virt, m2m.dense_k)

    def layer_loss(e, gathered, rec, we_, w2_):
        eo, v = pef.edge_layer_flat(e, gathered, rec, mask_m2m, we_, b0,
                                    w2_, b2, ls, lb, m2m.dense_k)
        return (eo ** 2).sum() + (v ** 2).sum()

    run("proc_layer", layer_loss, m2m_edge, m2m_gathered, m2m_rec, w_e, w2)

    m2g = g.m2g
    m2g_gathered = jax.lax.stop_gradient(gather_send_flat(mesh_tbl, m2g))
    m2g_ew = arr(m2g.num_edges, h)
    ge_f = arr(m2g.num_rec, W)
    mask_m2g = m2g.mask.reshape(m2g.num_virt, m2g.dense_k)
    pp = pgu.pack_grid_update_params(params)

    def dec_loss(gathered, ge, p):
        o = pgu.grid_update_flat(gathered, m2g_ew, ge, mask_m2g, p,
                                 m2g.dense_k)
        return (o[:m2g.num_rec] ** 2).sum()

    run("decode_kernel", dec_loss, m2g_gathered, ge_f, pp)

    # --- dense matmul pieces ---
    run("node_tf", lambda t, w: (node_transform_flat(
        t.reshape(n_grid, B, h).transpose(1, 0, 2), w, None) ** 2).sum(),
        grid_tbl, w_j)

    aggr_p = params["g2m_gnn"]["aggr_mlp"]
    mesh_rec_b = arr(B, n_mesh, h)
    g2m_virt = arr(g.g2m.num_virt, W)

    def aggr_loss(rec_b, virt, p):
        agg = _fold_virt_flat(g.g2m, virt)
        return (_aggr_mlp_mixed(p, rec_b, agg) ** 2).sum()

    run("aggr_mlp", aggr_loss, mesh_rec_b, g2m_virt, aggr_p)

    print(json.dumps({"fwdbwd_isolated_ms": results}))


if __name__ == "__main__":
    main()
