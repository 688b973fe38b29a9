"""Kernel block-size vs DMA rate for the tail kernel's fold pattern.

FINDINGS (round 4, idle host, K=8-vs-64 differencing):
1. The masked K-fold passthrough runs at the HBM roofline at EVERY
   block size once the harness's own traffic is counted: the anti-hoist
   perturbation (g * (1+c*1e-30)) is an XLA elementwise pass that
   re-reads and re-writes the full input each scan iteration, so total
   per-iter traffic is 2x input + kernel traffic — 851 MB f32 /
   1.37 ms = 621 GB/s ~= the 630 GB/s copy roofline. Raw "kernel-only"
   GB/s figures from this harness UNDERCOUNT by that copy; the printed
   rate below includes it.
2. A plane-major fold layout ((K, Nv, W) planes summed instead of the
   strided (Nv*K, W) reshape) measures IDENTICAL — the fold itself is
   not a bottleneck, so re-ordering EdgeSet rows for contiguous-plane
   folds would buy nothing.
Conclusion: the composed decode/layer kernels' gap to their DMA floor
comes from in-kernel compute (one-hot reconstruct, MLP matmuls, LN) and
pipeline serialization, not from fold layout or block size.

Run on an OTHERWISE IDLE host — concurrent CPU load corrupts the
differencing baseline (earlier contaminated runs showed 160-1200 GB/s
scatter for identical configs).

Usage: python probes/block_dma.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_SMALL, K_BIG, N_TRIALS = 8, 64, 7


def timed_ms(make, *args):
    # K=8 vs K=64 differencing: a K=1 baseline is dominated by dispatch
    # jitter for sub-ms kernels and can exceed the K_BIG run entirely
    res = {}
    for K in (K_SMALL, K_BIG):
        f = make(K)
        float(f(*args))
        ts = []
        for _ in range(N_TRIALS):
            t0 = time.time()
            float(f(*args))
            ts.append(time.time() - t0)
        res[K] = float(np.median(ts))
    return (res[K_BIG] - res[K_SMALL]) / (K_BIG - K_SMALL) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, h, K = 4, 64, 4
    Nv = 64000
    M = Nv * K
    W = B * h
    rng = np.random.default_rng(0)
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        g = jnp.asarray(rng.standard_normal((M, W)) * 0.1, dtype)
        mask = jnp.asarray((rng.random((M, 1)) < 0.97).astype(np.float32))
        in_bytes = M * W * g.dtype.itemsize

        for tile_v in (128, 256, 512, 1000, 2000, 4000):
            if Nv % tile_v:
                continue
            tile_e = tile_v * K

            def kern(g_ref, mask_ref, out_ref):
                x = g_ref[...].astype(jnp.float32)
                tv = x.shape[0] // K
                folded = (x.reshape(tv, K, W)
                          * mask_ref[...].reshape(tv, K, 1)).sum(axis=1)
                out_ref[...] = folded

            def run(g, mask, tile_v=tile_v, tile_e=tile_e):
                return pl.pallas_call(
                    kern,
                    grid=(Nv // tile_v,),
                    in_specs=[
                        pl.BlockSpec((tile_e, W), lambda v: (v, 0)),
                        pl.BlockSpec((tile_e, 1), lambda v: (v, 0)),
                    ],
                    out_specs=pl.BlockSpec((tile_v, W), lambda v: (v, 0)),
                    out_shape=jax.ShapeDtypeStruct((Nv, W), jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024),
                )(g, mask)

            def make(K_):
                @jax.jit
                def f(g, mask):
                    def body(c, _):
                        out = run(g * (1.0 + c * 1e-30).astype(g.dtype),
                                  mask)
                        return out.sum().astype(jnp.float32), ()

                    s, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=K_)
                    return s

                return f

            ms = timed_ms(make, g, mask)
            # 2x in_bytes: the anti-hoist perturbation pass re-reads and
            # re-writes the input outside the kernel every iteration
            gbps = (3 * in_bytes + Nv * W * 4) / (ms * 1e-3) / 1e9
            print(f"{name} TILE_V={tile_v:5d} (TILE_E={tile_e:5d}): "
                  f"{ms:7.3f} ms  {gbps:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
