"""VPU throughput of the kernels' elementwise chains (silu, LN scale,
residual) on (rows, 256) f32 tiles — the decode kernel's non-MXU,
non-DMA floor component.

Methodology: a pallas kernel running CH silu passes per tile vs CH=1,
scan-differenced; the delta isolates the VPU chain from DMA.
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
    from neural_lam_tpu.ops.pallas_edge_flat import _compiler_params

    W, rows, TILE = 256, 262144, 4096
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((rows, W)), jnp.float32)

    def make_kern(ch):
        def kern(x_ref, o_ref):
            x = x_ref[...].astype(jnp.float32)
            for _ in range(ch):
                x = jax.nn.silu(x)
            o_ref[...] = x
        return kern

    def build(ch):
        f = pl.pallas_call(
            make_kern(ch), grid=(rows // TILE,),
            in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, W), jnp.float32),
            compiler_params=_compiler_params(),
        )

        def make(K):
            def run(x):
                def body(c, _):
                    return f(c), ()
                out, _ = jax.lax.scan(body, x, None, length=K)
                return out.sum()
            g = jax.jit(run)
            return lambda: g(x0)
        return make

    ms1 = timed_ms(build(1))
    ms9 = timed_ms(build(9))
    per_silu = (ms9 - ms1) / 8
    elems = rows * W
    print(f"copy+1silu: {ms1:.3f} ms; +8 silu: {ms9:.3f} ms -> "
          f"{per_silu:.4f} ms per silu pass over {elems/1e6:.0f}M elems "
          f"({elems / (per_silu * 1e-3) / 1e9:.0f} Gelem/s)")


if __name__ == "__main__":
    main()
