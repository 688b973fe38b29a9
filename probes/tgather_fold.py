"""Variants of the transposed-gather fold (the sender-gather VJP's core).

The bwd regroups d_out (M, W) rows to senders via the transposed dense
layout: take(d_out, t_slots) -> (n_virt_T, K_T, W) -> mask -> sum(k).
Hypothesis: XLA materializes the (M_T, W) take output in HBM before the
fold; folding per-k gathers into the accumulation avoids it.

  a_take_fold   - current formulation (one big take, reshape, mask, sum)
  b_perk_sum    - sum_k take(d_out, t_slots[:, k]) * mask[:, k, None]
  c_perk_bf16   - b with the d_out rows cast to bf16 before gathering

Sizes: m2g at MEPS bench scale (M=256000, W=256, K_T=8, n_virt_T=33280).
Usage: python probes/tgather_fold.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

NX, NY, HIDDEN, BATCH = 268, 238, 64, 4
K_BIG, N_TRIALS = 16, 5


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model

    model, params, ds = _build_model(
        nx=NX, ny=NY, hidden_dim=HIDDEN, processor_layers=1,
        n_features={"state": 17, "forcing": 6, "static": 4}, n_timesteps=8,
    )
    g = model.graph
    W = BATCH * HIDDEN
    rng = np.random.default_rng(0)

    for name, es in (("g2m", g.g2m), ("m2g", g.m2g)):
        t = es.transposed
        M = es.num_edges
        d_out = jnp.asarray(rng.standard_normal((M, W)) * 0.3, jnp.float32)
        t_slots = t.senders.reshape(t.num_virt, t.dense_k)
        t_mask = t.mask.reshape(t.num_virt, t.dense_k)

        def a_take_fold(d):
            gth = jnp.take(d, t_slots.reshape(-1), axis=0)
            return (gth.reshape(t.num_virt, t.dense_k, W)
                    * t_mask[..., None]).sum(axis=1)

        def b_perk_sum(d):
            acc = None
            for k in range(t.dense_k):
                part = jnp.take(d, t_slots[:, k], axis=0) \
                    * t_mask[:, k][:, None]
                acc = part if acc is None else acc + part
            return acc

        def c_perk_bf16(d):
            db = d.astype(jnp.bfloat16)
            acc = None
            for k in range(t.dense_k):
                part = jnp.take(db, t_slots[:, k], axis=0).astype(
                    jnp.float32) * t_mask[:, k][:, None]
                acc = part if acc is None else acc + part
            return acc

        for label, fn in (("a_take_fold", a_take_fold),
                          ("b_perk_sum", b_perk_sum),
                          ("c_perk_bf16", c_perk_bf16)):
            def make(K, fn=fn):
                def many(d):
                    def body(carry, _):
                        s, dd = carry
                        v = fn(dd).sum()
                        return (s + v, dd * (1.0 + v * 1e-30)), None

                    (s, _), _ = jax.lax.scan(body, (jnp.float32(0.0), d),
                                             None, length=K)
                    return s

                return jax.jit(many)

            per = {}
            for K in (1, K_BIG):
                f = make(K)
                float(f(d_out))
                best = np.inf
                for _ in range(N_TRIALS):
                    t0 = time.perf_counter()
                    float(f(d_out))
                    best = min(best, time.perf_counter() - t0)
                per[K] = best
            ms = (per[K_BIG] - per[1]) / (K_BIG - 1) * 1000.0
            gb = M * W * 4 / 1e9
            print(f"{name} {label}: {ms:7.3f} ms  "
                  f"(~{gb / (ms / 1e3):.0f} GB/s vs d_out bytes)")


if __name__ == "__main__":
    main()
