"""Microbenchmarks: Pallas DMA bandwidth vs lane width, XLA gather layouts,
and in-kernel vectorized gather feasibility (Mosaic jnp.take on VMEM).

Each measurement uses the scan-differencing methodology (see
neural_lam_tpu/profiling.py): K iterations inside one lax.scan with the
carry perturbing the input, timed at K=1 vs K_BIG.

Usage: python probes/lane_bw.py [copy|gather|take]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_BIG, N_TRIALS = 16, 5


def timed_ms(make):
    """make(K) -> jitted f(x); returns per-iteration ms via differencing."""
    import jax

    res = {}
    for K in (1, K_BIG):
        f = make(K)
        float(f())
        ts = []
        for _ in range(N_TRIALS):
            t0 = time.time()
            float(f())
            ts.append(time.time() - t0)
        res[K] = float(np.median(ts))
    return (res[K_BIG] - res[1]) / (K_BIG - 1) * 1e3


def bench_copy():
    """Pallas copy kernel bandwidth at various (rows, lanes) block shapes."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0000001

    def run(rows, lanes, tile_r, dtype):
        nbytes = rows * lanes * np.dtype(dtype).itemsize
        x0 = jnp.asarray(
            np.random.default_rng(0).standard_normal((rows, lanes)), dtype
        )

        copy = pl.pallas_call(
            copy_kernel,
            grid=(rows // tile_r,),
            in_specs=[pl.BlockSpec((tile_r, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile_r, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, lanes), dtype),
        )

        def make(K):
            def f():
                def body(c, _):
                    return copy(c), ()

                out, _ = jax.lax.scan(body, x0, None, length=K)
                return out.sum()

            g = jax.jit(f)
            return lambda: g()

        ms = timed_ms(make)
        gbs = 2 * nbytes / (ms * 1e-3) / 1e9  # read + write
        print(f"copy rows={rows} lanes={lanes} tile_r={tile_r} "
              f"{np.dtype(dtype).name}: {ms:6.3f} ms  {gbs:6.1f} GB/s",
              file=sys.stderr)

    MB = 256 * 1024 * 1024 // 4  # elements for 256MB fp32... too big; use 64MB
    for lanes, tile_r in ((64, 8192), (128, 4096), (256, 2048), (512, 1024)):
        rows = (16 * 1024 * 1024) // lanes  # 64 MB fp32 total
        run(rows, lanes, tile_r, jnp.float32)
    for lanes, tile_r in ((64, 8192), (256, 2048)):
        rows = (16 * 1024 * 1024) // lanes
        run(rows, lanes, tile_r, jnp.bfloat16)


def bench_gather():
    """XLA row-gather bandwidth: (B,N,h) per-batch vs (N,B*h) flat."""
    import jax
    import jax.numpy as jnp

    B, h = 4, 64
    for N, M in ((6561, 255136), (63784, 131072)):
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, N, size=M), jnp.int32
        )
        src_b = jnp.asarray(
            np.random.default_rng(1).standard_normal((B, N, h)), jnp.float32
        )
        src_f = jnp.transpose(src_b, (1, 0, 2)).reshape(N, B * h)

        out_bytes = M * B * h * 4

        def make_batched(K):
            def f():
                def body(c, _):
                    g = jnp.take(c, idx, axis=-2)
                    return c * (1 + g.sum() * 1e-30), ()

                out, _ = jax.lax.scan(body, src_b, None, length=K)
                return out.sum()

            return jax.jit(f)

        def make_flat(K):
            def f():
                def body(c, _):
                    g = jnp.take(c, idx, axis=0)
                    return c * (1 + g.sum() * 1e-30), ()

                out, _ = jax.lax.scan(body, src_f, None, length=K)
                return out.sum()

            return jax.jit(f)

        for name, mk in (("(B,N,h) batched", make_batched),
                         ("(N,B*h) flat  ", make_flat)):
            ms = timed_ms(mk)
            gbs = out_bytes / (ms * 1e-3) / 1e9
            print(f"gather N={N:6d} M={M}: {name}: {ms:6.3f} ms "
                  f"{gbs:6.1f} GB/s-written", file=sys.stderr)


def bench_take():
    """In-kernel vectorized gather from VMEM-resident src via jnp.take."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M, W = 6561, 262144, 256  # mesh-sized source, m2g-sized edges, flat
    Npad = 6656  # 52 * 128
    TILE = 2048
    src0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((Npad, W)), jnp.float32
    )
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, N, size=M), jnp.int32
    )

    def kernel(idx_ref, src_ref, o_ref):
        ids = idx_ref[...]  # (TILE,) int32 in VMEM? try
        o_ref[...] = jnp.take(src_ref[...], ids, axis=0)

    take = pl.pallas_call(
        kernel,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Npad, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
    )

    def make(K):
        def f():
            def body(c, _):
                out = take(idx, c)
                return c * (1 + out.sum() * 1e-30), ()

            out, _ = jax.lax.scan(body, src0, None, length=K)
            return out.sum()

        return jax.jit(f)

    try:
        ms = timed_ms(make)
        gbs = M * W * 4 / (ms * 1e-3) / 1e9
        print(f"in-kernel take N={N} M={M} W={W}: {ms:6.3f} ms "
              f"{gbs:6.1f} GB/s-written", file=sys.stderr)
    except Exception as e:
        print(f"in-kernel take FAILED: {type(e).__name__}: "
              f"{str(e)[:500]}", file=sys.stderr)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("copy", "all"):
        bench_copy()
    if which in ("gather", "all"):
        bench_gather()
    if which in ("take", "all"):
        bench_take()
    print("done")
