"""In-kernel vectorized gather variants: which lowers on Mosaic, how fast.

Variant A: jnp.take_along_axis(src, ids broadcast to (TILE, W), axis=0)
Variant B: jnp.take(src, ids (TILE,), axis=0) [failed before, re-check msg]
Variant C: one-hot matmul gather (always lowers; MXU cost)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_BIG, N_TRIALS = 16, 5


def timed_ms(make):
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


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M, W = 6561, 262144, 256
    Npad = 6656
    TILE = 2048
    src0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((Npad, W)), jnp.float32
    )
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, N, size=M), jnp.int32
    )

    def run(name, kernel, idx_arg):
        take = pl.pallas_call(
            kernel,
            grid=(M // TILE,),
            in_specs=[
                pl.BlockSpec(
                    (TILE,) if idx_arg.ndim == 1 else (TILE, 1),
                    (lambda i: (i,)) if idx_arg.ndim == 1
                    else (lambda i: (i, 0)),
                    memory_space=pltpu.VMEM),
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
                    out = take(idx_arg, c)
                    return c * (1 + out.sum() * 1e-30), ()

                out, _ = jax.lax.scan(body, src0, None, length=K)
                return out.sum()

            return jax.jit(f)

        try:
            ms = timed_ms(make)
            gbs = M * W * 4 / (ms * 1e-3) / 1e9
            print(f"{name}: {ms:6.3f} ms  {gbs:6.1f} GB/s-written",
                  file=sys.stderr)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)

    def kern_a(idx_ref, src_ref, o_ref):
        ids = idx_ref[...]  # (TILE,)
        ids2 = jnp.broadcast_to(ids[:, None], (TILE, W))
        o_ref[...] = jnp.take_along_axis(src_ref[...], ids2, axis=0)

    run("A take_along_axis bcast", kern_a, idx)

    def kern_b(idx_ref, src_ref, o_ref):
        o_ref[...] = jnp.take(src_ref[...], idx_ref[...], axis=0)

    run("B jnp.take vec", kern_b, idx)

    print("done")


if __name__ == "__main__":
    main()
