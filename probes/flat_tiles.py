"""DMA-floor (passthrough+reduce) flat kernel vs tile size + packed mask.

Finds the achievable streaming bandwidth for the edge-tail data flow:
in (M, W) fp32, mask (Nv, K) packed, out (Nv, W). Scans TILE_V.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_BIG, N_TRIALS = 16, 5


def timed_ms(make, *args):
    import jax

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

    B, h, K = 4, 64, 4
    Nv = 64000
    M = Nv * K
    W = B * h
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((M, W)) * 0.1, jnp.float32)
    maskp = jnp.asarray((rng.random((Nv, K)) < 0.97).astype(np.float32))

    def make_pallas(TILE_V, with_mask):
        TILE_E = TILE_V * K

        def kern(*refs):
            if with_mask:
                g_ref, m_ref, virt_ref = refs
            else:
                g_ref, virt_ref = refs
            x = g_ref[...].astype(jnp.float32)
            te = x.shape[0]
            x3 = x.reshape(te // K, K, W)
            if with_mask:
                x3 = x3 * m_ref[...][..., None]
            virt_ref[...] = x3.sum(axis=1)

        in_specs = [pl.BlockSpec((TILE_E, W), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        if with_mask:
            in_specs.append(pl.BlockSpec((TILE_V, K), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
        return pl.pallas_call(
            kern,
            grid=(M // TILE_E,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TILE_V, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Nv, W), jnp.float32),
        )

    for with_mask in (False, True):
        for TILE_V in (128, 256, 512, 1024, 2000):
            if Nv % TILE_V:
                continue
            fl = make_pallas(TILE_V, with_mask)

            def mk(Kn, fl=fl, with_mask=with_mask):
                def f(gg):
                    def body(c, _):
                        v = fl(c, maskp) if with_mask else fl(c)
                        return c * (1 + v.sum() * 1e-30), ()

                    out, _ = jax.lax.scan(body, gg, None, length=Kn)
                    return out.sum()

                return jax.jit(f)

            try:
                ms = timed_ms(mk, g)
                gbs = (M * W + Nv * W) * 4 / (ms * 1e-3) / 1e9
                print(f"mask={int(with_mask)} TILE_V={TILE_V:5d}: "
                      f"{ms:6.3f} ms  {gbs:6.1f} GB/s", file=sys.stderr)
            except Exception as e:
                print(f"mask={int(with_mask)} TILE_V={TILE_V} FAILED: "
                      f"{type(e).__name__} {str(e)[:150]}", file=sys.stderr)
    print("done")


if __name__ == "__main__":
    main()
