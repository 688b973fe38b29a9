"""Benchmark: GraphLAM forward rollout at full-MEPS scale on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Configuration mirrors the reference's headline setting (MEPS 268x238 grid,
17 state / 6 forcing (x3 window) / 4 static features, hidden_dim 64,
4 processor layers — see BASELINE.md). Metric: mesh-node updates/s/chip
(N_mesh x processor_layers x predict-steps/s x batch).

Timing methodology: `block_until_ready` does not reliably block on this
TPU runtime, so each measurement jits K rollout steps inside one lax.scan
returning a scalar sum (forcing full execution before host transfer), and
per-step time is the K=K_BIG vs K=1 difference — immune to dispatch and
transfer latency. vs_baseline is relative to bench_baseline.json (1.0 when
first recorded).
"""

import json
import os
import sys
import time

import numpy as np
# numpy's MADV_HUGEPAGE + THP defrag=madvise causes multi-second kernel
# compaction stalls on fresh batch-sized allocations; the package opts out
import neural_lam_tpu  # noqa: F401  (runtime hugepage opt-out)

NX, NY = 268, 238
HIDDEN = 64
LAYERS = 4
BATCH = 4
K_BIG = 20
N_TRIALS = 5
BASELINE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
)


def measure_steps_ms(model, params, prev, prevprev, forcing):
    """Per-predict-step device ms via scan-K differencing."""
    import jax

    arrays = model.arrays()

    def make(K):
        def many(arrays, params, a, b, c):
            m = model.with_arrays(arrays)
            import jax.numpy as jnp

            init_states = jnp.stack([b, a], axis=1)  # (B, 2, N, d)
            forcing = jnp.broadcast_to(
                c[:, None], (c.shape[0], K) + c.shape[1:]
            )
            true_states = jnp.broadcast_to(
                a[:, None], (a.shape[0], K) + a.shape[1:]
            )
            pred, _ = m.unroll_prediction(params, init_states, forcing,
                                          true_states)
            return pred[:, -1].sum()

        return jax.jit(many)

    results = {}
    for K in (1, K_BIG):
        f = make(K)
        float(f(arrays, params, prev, prevprev, forcing))  # compile + warm
        times = []
        for _ in range(N_TRIALS):
            t0 = time.time()
            float(f(arrays, params, prev, prevprev, forcing))
            times.append(time.time() - t0)
        results[K] = float(np.median(times))
    return (results[K_BIG] - results[1]) / (K_BIG - 1) * 1e3


def measure_train_step_ms(model, params, prev, prevprev, forcing,
                          k_big=10, n_trials=5):
    """Full training-step (fwd + bwd + AdamW) ms via scan-K differencing;
    (params, opt_state) ride the scan carry so every iteration performs a
    real optimizer update and nothing is hoisted."""
    import jax
    import jax.numpy as jnp
    import optax

    B, n, d = prev.shape
    ar_steps = 1
    init_states = jnp.stack([prevprev, prev], axis=1)
    target = jnp.broadcast_to(prev[:, None], (B, ar_steps, n, d))
    forc = jnp.broadcast_to(
        forcing[:, None], (B, ar_steps) + forcing.shape[1:]
    )
    times_arr = jnp.zeros((B, ar_steps), jnp.float32)
    batch = (init_states, target, forc, times_arr)
    optimizer = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.01)
    opt_state = optimizer.init(params)
    arrays = model.arrays()

    def make(K):
        def many(arrays, params, opt_state, batch):
            m = model.with_arrays(arrays)

            def body(carry, _):
                p, o = carry
                loss, grads = jax.value_and_grad(m.training_loss)(p, batch)
                updates, o = optimizer.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o), loss

            (p, _), losses = jax.lax.scan(
                body, (params, opt_state), None, length=K)
            return losses.sum() + sum(
                x.sum().astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(p)
                if jnp.issubdtype(x.dtype, jnp.floating)
            )

        return jax.jit(many)

    results = {}
    for K in (1, k_big):
        f = make(K)
        float(f(arrays, params, opt_state, batch))
        ts = []
        for _ in range(n_trials):
            t0 = time.time()
            float(f(arrays, params, opt_state, batch))
            ts.append(time.time() - t0)
        results[K] = float(np.median(ts))
    return (results[k_big] - results[1]) / (k_big - 1) * 1e3


def _backend_reachable(timeout_s=600.0):
    """Probe backend init in a daemon thread.

    The tunneled TPU runtime can wedge such that `jax.devices()` blocks
    forever (pool claim held by a dead process); without this watchdog the
    whole bench hangs instead of reporting."""
    import threading

    ok = []

    def probe():
        import jax

        jax.devices()
        ok.append(True)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    if not _backend_reachable():
        print(json.dumps({
            "metric": "mesh_node_updates_per_s_per_chip",
            "value": None,
            "unit": "updates/s",
            "vs_baseline": None,
            "error": "device backend unreachable (init timed out; "
                     "wedged TPU tunnel)",
        }), flush=True)
        sys.exit(1)

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _build_model

    t0 = time.time()
    model, params, datastore = _build_model(
        nx=NX, ny=NY, hidden_dim=HIDDEN, processor_layers=LAYERS,
        n_features={"state": 17, "forcing": 6, "static": 4}, n_timesteps=8,
    )
    print(f"[bench] model+graph built in {time.time() - t0:.1f}s "
          f"(N_grid={datastore.num_grid_points}, "
          f"N_mesh={model.num_mesh_nodes})", file=sys.stderr)

    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    d_f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((BATCH, n, d_f)), jnp.float32)

    ms_per_step = measure_steps_ms(model, params, prev, prevprev, forcing)
    steps_per_s = 1000.0 / ms_per_step
    mesh_updates_per_s = model.num_mesh_nodes * LAYERS * steps_per_s * BATCH
    print(
        f"[bench] {ms_per_step:.2f} ms/predict-step (batch {BATCH}), "
        f"{steps_per_s * BATCH:.2f} rollout sample-steps/s, "
        f"{mesh_updates_per_s:.3e} mesh-node updates/s/chip",
        file=sys.stderr,
    )

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f).get("mesh_node_updates_per_s")
        if base:
            vs_baseline = mesh_updates_per_s / base
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"mesh_node_updates_per_s": mesh_updates_per_s,
                       "recorded": time.time()}, f)

    # model-FLOP accounting (MFU = model FLOPs / time / MXU peak; the
    # step is HBM-bound by design, so MFU is expected to be low — the
    # companion number is pct_of_hbm_roofline below)
    tflops = mfu = None
    flops = None
    try:
        from neural_lam_tpu.profiling import analytic_step_flops, peak_tflops

        flops = analytic_step_flops(model, BATCH)
        tflops = flops["total"] / (ms_per_step * 1e-3) / 1e12
        mfu = tflops / peak_tflops()
        print(f"[bench] model FLOPs {flops['total'] / 1e9:.2f} GFLOP/step "
              f"(embed {flops['embed'] / 1e9:.2f} / g2m "
              f"{flops['g2m'] / 1e9:.2f} / proc "
              f"{flops['processor'] / 1e9:.2f} / m2g "
              f"{flops['m2g'] / 1e9:.2f}); achieved {tflops:.2f} TFLOP/s "
              f"= {100 * mfu:.2f}% MFU of {peak_tflops():.0f} TFLOP/s peak",
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] FLOP accounting failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "mesh_node_updates_per_s_per_chip",
        "value": mesh_updates_per_s,
        "unit": "updates/s",
        "vs_baseline": vs_baseline,
        "tflops": tflops,
        "mfu": mfu,
    }), flush=True)

    # optional extra measurements AFTER the headline line (a driver timeout
    # must not lose the metric)
    copy_gbps = None
    try:
        # HBM roofline audit: analytic minimal traffic / measured copy
        # speed-of-light (see probes/roofline.py for methodology; the
        # pct is a conservative lower bound on achieved bandwidth)
        from neural_lam_tpu.profiling import (
            analytic_step_bytes,
            measure_copy_bandwidth_gbps,
        )

        copy_gbps = measure_copy_bandwidth_gbps()
        stages = analytic_step_bytes(model, BATCH)
        gbps = stages["total"] / (ms_per_step * 1e-3) / 1e9
        print(f"[bench] roofline: step streams >= "
              f"{stages['total'] / 1e6:.0f} MB "
              f"(embed {stages['embed'] / 1e6:.0f} / g2m "
              f"{stages['g2m'] / 1e6:.0f} / proc "
              f"{stages['processor'] / 1e6:.0f} / m2g "
              f"{stages['m2g'] / 1e6:.0f}), achieves >= {gbps:.0f} GB/s "
              f"= {100 * gbps / copy_gbps:.0f}% of the measured "
              f"{copy_gbps:.0f} GB/s HBM copy roofline", file=sys.stderr)
    except Exception as e:
        print(f"[bench] roofline audit failed: {e}", file=sys.stderr)

    try:
        import jax.numpy as _jnp

        model.compute_dtype = _jnp.bfloat16
        ms_bf16 = measure_steps_ms(model, params, prev, prevprev, forcing)
        extra = ""
        if copy_gbps:
            from neural_lam_tpu.profiling import analytic_step_bytes

            st_bf = analytic_step_bytes(model, BATCH)
            gbps_bf = st_bf["total"] / (ms_bf16 * 1e-3) / 1e9
            extra = (f" (>= {gbps_bf:.0f} GB/s, "
                     f"{100 * gbps_bf / copy_gbps:.0f}% of HBM roofline)")
        if flops is not None:
            from neural_lam_tpu.profiling import peak_tflops

            tf_bf = flops["total"] / (ms_bf16 * 1e-3) / 1e12
            extra += (f" [{tf_bf:.2f} TFLOP/s, "
                      f"{100 * tf_bf / peak_tflops():.2f}% MFU]")
        print(f"[bench] bf16 compute path: {ms_bf16:.2f} ms/predict-step"
              + extra, file=sys.stderr)
        model.compute_dtype = None
        ms_b1 = measure_steps_ms(
            model, params, prev[:1], prevprev[:1], forcing[:1]
        )
        print(f"[bench] batch-1 latency: {ms_b1:.2f} ms/predict-step",
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] extra measurements failed: {e}", file=sys.stderr)
    finally:
        model.compute_dtype = None  # never leak bf16 into later blocks

    ms_train = ms_train_bf16 = None
    try:
        import jax.numpy as _jnp

        def train_audit(ms, label):
            """Roofline + MFU line for a measured train step. Bytes from
            the analytic fwd+bwd+AdamW lower bound; model train FLOPs use
            the standard 3x-forward convention (bwd ~= 2x fwd matmuls;
            the kernels' in-VMEM forward recompute is hardware overhead,
            not model work)."""
            try:
                from neural_lam_tpu.profiling import (
                    analytic_train_step_bytes,
                    peak_tflops,
                )

                tb = analytic_train_step_bytes(model, BATCH, params)
                gbps_t = tb["total"] / (ms * 1e-3) / 1e9
                parts = (f"streams >= {tb['total'] / 1e6:.0f} MB "
                         f"(3x stage bytes + loss "
                         f"{tb['loss'] / 1e6:.1f} + adamw "
                         f"{tb['adamw'] / 1e6:.1f})")
                if copy_gbps:
                    parts += (f", >= {gbps_t:.0f} GB/s = "
                              f"{100 * gbps_t / copy_gbps:.0f}% of HBM "
                              f"roofline")
                if flops is not None:
                    tf_t = 3 * flops["total"] / (ms * 1e-3) / 1e12
                    parts += (f", {tf_t:.2f} TFLOP/s = "
                              f"{100 * tf_t / peak_tflops():.2f}% MFU")
                print(f"[bench] {label} train roofline: {parts}",
                      file=sys.stderr)
            except Exception as e:
                print(f"[bench] train roofline audit failed: {e}",
                      file=sys.stderr)

        ms_train = measure_train_step_ms(model, params, prev, prevprev,
                                         forcing)
        print(f"[bench] train step (fwd+bwd+AdamW, ar=1): "
              f"{ms_train:.2f} ms, {BATCH * 1000.0 / ms_train:.1f} "
              f"samples/s/chip", file=sys.stderr)
        train_audit(ms_train, "fp32")
        model.compute_dtype = _jnp.bfloat16
        ms_train_bf16 = measure_train_step_ms(model, params, prev, prevprev,
                                              forcing)
        print(f"[bench] bf16 train step: {ms_train_bf16:.2f} ms, "
              f"{BATCH * 1000.0 / ms_train_bf16:.1f} samples/s/chip",
              file=sys.stderr)
        train_audit(ms_train_bf16, "bf16")
    except Exception as e:
        print(f"[bench] train-step measurement failed: {e}", file=sys.stderr)
    finally:
        model.compute_dtype = None

    try:
        # host-side input pipeline vs the device step budget (CPU only).
        # ar=1 is the reference default training config and the hardest
        # rate (shortest samples, fastest steps); the bf16 train step is
        # the binding budget. headroom_x_measured is the COLD first-epoch
        # rate over the budget; headroom_x_cached the steady state;
        # max_chips_per_host_cached how many chips one host can feed.
        from bench_input import measure_pipeline

        budget = ms_train_bf16 if ms_train_bf16 else ms_train
        for ar in (1, 3):
            pipe = measure_pipeline(
                ar_steps=ar, device_step_ms=ms_per_step, quick=True,
                train_step_ms=budget,
            )
            print(f"[bench] input pipeline (ar={ar}, bf16 budget): "
                  f"{json.dumps(pipe)}", file=sys.stderr)
    except Exception as e:
        print(f"[bench] input-pipeline measurement failed: {e}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
