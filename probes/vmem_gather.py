"""Can Mosaic's same-shape dynamic_gather do the m2g sender gather
in-kernel from a VMEM-resident table?

The m2g/m2m sender tables are mesh-sized ((6561, 256) f32 = 6.7 MB), so
padding the table rows to TILE_E=8192 makes table/idx/output shapes
match: out[r, l] = tbl[idx[r, l], l] with idx broadcast per edge row.
If this lowers and runs fast, the (M, W) gather materialization
(262 MB write + read at m2g scale) disappears.

Measures: XLA take baseline; in-kernel gather-only; fused gather+tail.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_BIG, N_TRIALS = 16, 5


def timed_ms(make, *args):
    res = {}
    for K in (1, K_BIG):
        f = make(K)
        float(f(*args))
        ts = []
        for _ in range(N_TRIALS):
            t0 = time.time()
            float(f(*args))
            ts.append(time.time() - t0)
        res[K] = float(np.median(ts))
    return (res[K_BIG] - res[1]) / (K_BIG - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 256
    N_tbl = 6561
    TILE_E = 8192
    M = 262144  # 32 tiles
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.standard_normal((N_tbl, W)) * 0.1, jnp.float32)
    tbl_pad = jnp.pad(tbl, ((0, TILE_E - N_tbl), (0, 0)))
    senders = jnp.asarray(rng.integers(0, N_tbl, M), jnp.int32)
    senders2d = senders.reshape(M, 1)

    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def scan_time(fn, *arrs):
        def make(KK):
            def many(*a):
                def body(c, _):
                    o = fn(*[x * c if x.dtype == jnp.float32 else x
                             for x in a])
                    return 1.0 + o * 1e-30, ()

                fin, _ = jax.lax.scan(body, 1.0, None, length=KK)
                return fin

            return jax.jit(many)

        return timed_ms(make, *arrs)

    # XLA take baseline
    def xla_take(t, tp, s):
        return jnp.take(t, senders, axis=0).sum()

    print(f"xla take      : {scan_time(xla_take, tbl, tbl_pad, senders):7.3f} ms",
          file=sys.stderr)

    # in-kernel gather only
    def gk(tbl_ref, s_ref, out_ref):
        idx = jnp.broadcast_to(s_ref[...], (TILE_E, W))
        out_ref[...] = jnp.take_along_axis(tbl_ref[...], idx, axis=0)

    gcall = pl.pallas_call(
        gk,
        grid=(M // TILE_E,),
        in_specs=[
            pl.BlockSpec((TILE_E, W), lambda v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, 1), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_E, W), lambda v: (v, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
        compiler_params=cp,
    )

    def kern_gather(t, tp, s):
        return gcall(tp, senders2d).sum()

    try:
        ms = scan_time(kern_gather, tbl, tbl_pad, senders)
        # verify
        out = jax.jit(lambda: gcall(tbl_pad, senders2d))()
        ref = jnp.take(tbl, senders, axis=0)
        err = float(jnp.abs(out - ref).max())
        print(f"kernel gather : {ms:7.3f} ms (max err {err:.1e})",
              file=sys.stderr)
    except Exception as e:
        print(f"kernel gather FAILED: {type(e).__name__}: "
              f"{str(e)[:500]}", file=sys.stderr)

    # gather + sum-only tail (DMA floor analogue: no (M, W) HBM array at all)
    K = 4
    TILE_V = TILE_E // K
    Nv = M // K

    def gtk(tbl_ref, s_ref, out_ref):
        idx = jnp.broadcast_to(s_ref[...], (TILE_E, W))
        g = jnp.take_along_axis(tbl_ref[...], idx, axis=0)
        out_ref[...] = g.reshape(TILE_V, K, W).sum(axis=1)

    gtcall = pl.pallas_call(
        gtk,
        grid=(M // TILE_E,),
        in_specs=[
            pl.BlockSpec((TILE_E, W), lambda v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, 1), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_V, W), lambda v: (v, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nv, W), jnp.float32),
        compiler_params=cp,
    )

    def kern_gather_sum(t, tp, s):
        return gtcall(tp, senders2d).sum()

    try:
        ms = scan_time(kern_gather_sum, tbl, tbl_pad, senders)
        print(f"gather+sum    : {ms:7.3f} ms", file=sys.stderr)
    except Exception as e:
        print(f"gather+sum FAILED: {type(e).__name__}: {str(e)[:300]}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
