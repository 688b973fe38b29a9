"""Device-time measurement utilities (the profiling story the reference
lacks — SURVEY.md §5: "no profiler hooks ... anywhere").

`block_until_ready` does not reliably block on every PJRT runtime (the
tunneled TPU backend used here returns early), so naive wall-clock loops
measure dispatch latency, not device time. `device_time_ms` instead jits K
iterations of the op inside one `lax.scan` whose carry threads a scalar
through every iteration (preventing loop-invariant hoisting), reduces the
output to a scalar, and forces a host transfer; per-iteration time is the
(K_big - K_small) difference — immune to dispatch/transfer latency.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _make_scanned(fn, args, K):
    """Jitted program running fn K times with a data-dependence chain."""

    def scalarize(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        return sum(
            jnp.sum(x).astype(jnp.float32) for x in leaves
            if jnp.issubdtype(x.dtype, jnp.floating)
        )

    def perturb(args, c):
        # every float leaf must depend on the carry, otherwise XLA hoists
        # the subgraphs that don't out of the scan loop
        def f(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x + c * 1e-30
            return x

        return jax.tree_util.tree_map(f, args)

    @jax.jit
    def many(args):
        def body(c, _):
            out = fn(*perturb(args, c))
            return scalarize(out) * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    return many


def device_time_ms(fn, *args, k_big: int = 10, trials: int = 5) -> float:
    """True device milliseconds per invocation of fn(*args)."""
    totals = {}
    for K in (1, k_big):
        many = _make_scanned(fn, args, K)
        float(many(args))  # compile + warm
        times = []
        for _ in range(trials):
            t0 = time.time()
            float(many(args))
            times.append(time.time() - t0)
        totals[K] = float(np.median(times))
    return max((totals[k_big] - totals[1]) / (k_big - 1) * 1e3, 0.0)


def profile_model(model, params, batch_size=4, k_big=10, printer=print):
    """Per-component device-time breakdown of a GraphLAM-family model."""
    from .ops.mlp import apply_mlp
    from .ops.message_passing import apply_interaction_net

    rng = np.random.default_rng(0)
    n = model.num_grid_nodes
    d = model.num_state_vars
    d_f = model.grid_dim - 2 * d - model.grid_static_dim
    h = model.args.hidden_dim
    B = batch_size
    g = model.graph

    prev = jnp.asarray(rng.standard_normal((B, n, d)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((B, n, d)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((B, n, d_f)), jnp.float32)
    grid_emb = jnp.asarray(rng.standard_normal((B, n, h)), jnp.float32)
    mesh_emb = jnp.asarray(
        rng.standard_normal((B, model.num_mesh_nodes, h)), jnp.float32
    )

    rows = {}

    def bench(name, fn, *args):
        rows[name] = device_time_ms(fn, *args, k_big=k_big)
        printer(f"{name:42s} {rows[name]:8.3f} ms")

    arrays = model.arrays()
    bench("full predict_step",
          lambda arrays, p, a, b, c: model.with_arrays(arrays).predict_step(
              p, a, b, c)[0],
          arrays, params, prev, prevprev, forcing)
    bench("grid_embedder",
          lambda p, a, b, c: apply_mlp(p["grid_embedder"], jnp.concatenate(
              [a, b, c], axis=-1)),
          {"grid_embedder": params["grid_embedder"]}, prev, prevprev,
          jnp.concatenate([forcing, jnp.broadcast_to(
              model.statics.grid_static_features[None],
              (B, n, model.grid_static_dim))], axis=-1))
    bench("encoding_grid_mlp",
          lambda p, x: apply_mlp(p, x), params["encoding_grid_mlp"], grid_emb)
    if hasattr(model, "m2m"):  # flat model components
        g2m_emb = jnp.asarray(
            rng.standard_normal((B, g.g2m.num_edges, h)), jnp.float32)
        bench("g2m interaction",
              lambda p, es, a, b, c: apply_interaction_net(
                  p, es, a, b, c, update_edges=False),
              params["g2m_gnn"], g.g2m, grid_emb, mesh_emb, g2m_emb)
        m2m_emb = jnp.asarray(
            rng.standard_normal((B, model.m2m.num_edges, h)), jnp.float32)
        bench("processor layer",
              lambda p, es, a, b: apply_interaction_net(p, es, a, a, b),
              params["processor"][0], model.m2m, mesh_emb, m2m_emb)
        m2g_emb = jnp.asarray(
            rng.standard_normal((B, g.m2g.num_edges, h)), jnp.float32)
        bench("m2g interaction",
              lambda p, es, a, b, c: apply_interaction_net(
                  p, es, a, b, c, update_edges=False),
              params["m2g_gnn"], g.m2g, mesh_emb, grid_emb, m2g_emb)
    bench("output_map", lambda p, x: apply_mlp(p, x),
          params["output_map"], grid_emb)
    return rows


def measure_copy_bandwidth_gbps(mib: int = 256, k_big: int = 64,
                                trials: int = 5) -> float:
    """Achievable HBM streaming bandwidth (GB/s): a jitted y = y*a + b
    scan moves read N + write N bytes per iteration; the multiply-add is
    free next to the DMA. This is the practical speed of light the
    roofline fraction is measured against (not the spec-sheet number)."""
    n = mib * (1 << 20) // 4
    x = jnp.ones((n,), jnp.float32)

    def make(K):
        @jax.jit
        def run(x):
            def body(y, _):
                return y * 1.0000001 + 1e-9, ()

            y, _ = jax.lax.scan(body, x, None, length=K)
            return y.sum()

        return run

    results = {}
    for K in (1, k_big):
        f = make(K)
        float(f(x))
        ts = []
        for _ in range(trials):
            t0 = time.time()
            float(f(x))
            ts.append(time.time() - t0)
        results[K] = float(np.median(ts))
    ms = (results[k_big] - results[1]) / (k_big - 1) * 1e3
    return 2.0 * n * 4 / (ms * 1e-3) / 1e9


def analytic_step_bytes(model, batch: int) -> dict:
    """Per-stage LOWER BOUND on the HBM bytes one predict step must
    stream, from the graph's edge counts: every live array read once and
    written once at fusion boundaries, edge-row gathers read exactly
    their gathered rows, fused kernels materialize no (M, W) message
    matrix. An implementation cannot move less, so
    pct_of_hbm_roofline computed from this is conservative. (XLA's
    compiled cost_analysis "bytes accessed" counts every fusion
    boundary including rematerialized reads and pessimistic gather
    costs — it lands ABOVE the measured copy roofline and is not a
    usable denominator; see probes/roofline.py.)"""
    g = model.graph
    B = batch
    h = model.args.hidden_dim
    cb = 2 if model.compute_dtype == jnp.bfloat16 else 4
    N = model.num_grid_nodes
    Nm = model.num_mesh_nodes
    d = model.grid_output_dim
    d_in = model.grid_dim

    def edges(es):
        n = int(np.asarray(es.senders).shape[-1])
        if getattr(es, "frontier", None) is not None:
            n += int(np.asarray(es.frontier.senders).shape[-1])
        return n

    m_g2m, m_m2g = edges(g.g2m), edges(g.m2g)
    m_m2m = sum(edges(e) for e in g.m2m)  # flat graphs: 1-entry tuple
    P = model.args.processor_layers

    node = B * Nm * h * cb  # one batched mesh-node array
    grid = B * N * h * cb   # one batched grid array (hidden width)
    stages = {
        # read raw fp32 inputs + write the flat grid rep
        "embed": B * N * d_in * 4 + grid,
        # sender tf r+w over the grid rep, edge-row gather, edge statics,
        # rec tf + aggr-MLP writes over mesh nodes
        "g2m": 2 * grid + m_g2m * B * h * cb + m_g2m * h * cb + 3 * node,
        # per layer: sender tf r+w, rec tf r+w, edge-row gather, edge
        # statics, aggr-MLP out, residual r+w (m_m2m totals one full
        # sweep of all m2m sets)
        "processor": P * (7 * node + m_m2m * B * h * cb + m_m2m * h * cb),
        # sender tf r+w, windowed gather rows, grid rep read, edge
        # statics, output write + residual read (fp32, d vars)
        "m2g": 2 * node + m_m2g * B * h * cb + grid + m_m2g * h * cb
        + 2 * B * N * d * 4,
    }
    stages["total"] = float(sum(stages.values()))
    return stages


# Public spec bf16 matmul peak for TPU v5e (v5litepod), TFLOP/s per chip.
# f32 jnp.dot lowers to single-pass bf16 MXU matmuls on this part
# (probes/fused_decode.py), so the same peak applies to both precisions.
# Override with NLT_PEAK_TFLOPS on other chip generations (v4: 275,
# v5p: 459, v6e: 918).
PEAK_TFLOPS_DEFAULT = 197.0


def peak_tflops() -> float:
    import os

    return float(os.environ.get("NLT_PEAK_TFLOPS", PEAK_TFLOPS_DEFAULT))


def analytic_step_flops(model, batch: int) -> dict:
    """Per-stage MODEL matmul FLOPs of one predict step (flat graph
    models): the useful arithmetic a perfect implementation performs,
    for MFU accounting — NOT the executed hardware FLOPs (the flat-lane
    kernels' kron-widened weights and the windowed decoder's one-hot
    reconstruct multiply real MXU work by up to B; MFU is conventionally
    model FLOPs / peak). Elementwise work (SiLU, LN, residuals) is
    omitted: at h=64 it is <2% of the matmul count.

    Conventions match `analytic_step_bytes`: rollout-invariant products
    (static edge embeddings e@We, mesh-static embeddings) are hoisted
    into `precompute_rollout_ctx` and excluded; the m2m edge
    representation is dynamic (update_edges threads it through the
    processor stack, ref: neural_lam/models/graph_lam.py:73-91), so each
    processor layer pays the full per-edge first-layer term. Counting
    rule: matmul of (rows, a) @ (a, b) = 2*rows*a*b FLOPs, batched by B.
    """
    g = model.graph
    B = batch
    h = model.args.hidden_dim
    hl = getattr(model.args, "hidden_layers", 1)
    N = model.num_grid_nodes
    Nm = model.num_mesh_nodes
    d = model.grid_output_dim
    d_in = model.grid_dim

    def edges(es):
        n = int(np.asarray(es.senders).shape[-1])
        if getattr(es, "frontier", None) is not None:
            n += int(np.asarray(es.frontier.senders).shape[-1])
        return n

    m_g2m, m_m2g = edges(g.g2m), edges(g.m2g)
    m_m2m = sum(edges(e) for e in g.m2m)
    P = model.args.processor_layers
    hh = 2 * h * h  # FLOPs per row of one h->h linear

    def inet(S, R, M, dyn_edge):
        """One InteractionNet: sender/receiver first-layer terms on node
        rows, remaining edge-MLP layers per edge, aggr MLP (2h->h->h) on
        receivers; +per-edge first-layer edge term when the edge rep is
        dynamic."""
        f = S * hh + R * hh + M * hl * hh + R * (2 * hh + hh)
        if dyn_edge:
            f += M * hh
        return f

    stages = {
        "embed": 2 * N * (d_in * h + hl * h * h),
        # g2m InteractionNet + the residual encoding_grid_mlp (h->h->h)
        "g2m": inet(N, Nm, m_g2m, dyn_edge=False),
        "processor": P * inet(Nm, Nm, m_m2m, dyn_edge=True),
        # m2g InteractionNet + encoding_grid_mlp + output_map (h->..->d)
        "m2g": inet(Nm, N, m_m2g, dyn_edge=False)
        + N * (1 + hl) * hh
        + 2 * N * (hl * h * h + h * d),
    }
    stages = {k: float(B * v) for k, v in stages.items()}
    stages["total"] = float(sum(stages.values()))
    return stages


def analytic_train_step_bytes(model, batch: int, params) -> dict:
    """Lower bound on the HBM bytes one fwd+bwd+AdamW training step must
    stream (ar=1). Backward convention for the analytic kernels: each
    stage re-reads its forward inputs (per-tile recompute in VMEM — no
    saved (M, W) intermediates), reads its output cotangent and writes
    its input cotangents; cotangent arrays mirror the forward
    activations, so bwd ~= 2x the forward stage bytes and fwd+bwd ~= 3x
    per stage. The loss adds one read of prediction+target+cotangent
    (3 * B*N*d fp32). AdamW streams read(p, g, m, v) + write(p, m, v) =
    7 param-sized fp32 arrays. Parameter-gradient accumulators ride VMEM
    revisited blocks and are negligible (h x h per kernel)."""
    fwd = analytic_step_bytes(model, batch)
    stages = {k: 3.0 * v for k, v in fwd.items() if k != "total"}
    B = batch
    N = model.num_grid_nodes
    d = model.grid_output_dim
    stages["loss"] = 3.0 * B * N * d * 4
    n_params = sum(
        int(np.prod(np.asarray(x).shape))
        for x in jax.tree_util.tree_leaves(params)
    )
    stages["adamw"] = 7.0 * n_params * 4
    stages["total"] = float(sum(stages.values()))
    return stages
