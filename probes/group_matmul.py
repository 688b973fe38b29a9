"""Is per-128-lane-group matmul 2x the full kron-widened matmul?

The flat kernels multiply (rows, W=256) activations by kron(I_4, w)
(256x256, block-diagonal) as a DENSE matmul - 4x the useful MAC. Doing
it per 128-lane group ((rows,128) @ kron(I_2, w) (128,128), twice,
in-kernel lane slices) halves the MAC at identical math. Measures a
chain of CH such matmuls per tile (decode-kernel-like MXU density).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_BIG, N_TRIALS, CH = 16, 5, 8


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
    w = rng.standard_normal((64, 64)) * 0.05
    wk_full = jnp.asarray(np.kron(np.eye(4), w), jnp.float32)      # 256x256
    wk_half = jnp.asarray(np.kron(np.eye(2), w), jnp.float32)      # 128x128

    def kern_full(x_ref, w_ref, o_ref):
        x = x_ref[...].astype(jnp.float32)
        for _ in range(CH):
            x = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        o_ref[...] = x

    def kern_group(x_ref, w_ref, o_ref):
        x = x_ref[...].astype(jnp.float32)
        for _ in range(CH):
            x = jnp.concatenate(
                [jnp.dot(x[:, g * 128:(g + 1) * 128], w_ref[...],
                         preferred_element_type=jnp.float32)
                 for g in range(2)], axis=1)
        o_ref[...] = x

    def build(kern, wk):
        wspec = pl.BlockSpec(wk.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kern, grid=(rows // TILE,),
            in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM), wspec],
            out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, W), jnp.float32),
            compiler_params=_compiler_params(),
        )

        def make(K):
            def run(x):
                def body(c, _):
                    return f(c, wk), ()
                out, _ = jax.lax.scan(body, x, None, length=K)
                return out.sum()
            g = jax.jit(run)
            return lambda: g(x0)
        return make

    ms_full = timed_ms(build(kern_full, wk_full))
    ms_group = timed_ms(build(kern_group, wk_half))
    mac = rows * W * W * CH
    print(f"full-kron : {ms_full:6.3f} ms  "
          f"{2 * mac / ms_full / 1e9:7.1f} GFLOP/s(dense)")
    print(f"per-group : {ms_group:6.3f} ms  speedup {ms_full / ms_group:.2f}x")
    # value check
    y_full = jax.jit(lambda x: functools.reduce(
        lambda a, _: jnp.dot(a, wk_full, preferred_element_type=jnp.float32),
        range(CH), x))(x0[:1024])
    y_grp = jax.jit(lambda x: functools.reduce(
        lambda a, _: jnp.concatenate(
            [jnp.dot(a[:, g*128:(g+1)*128], wk_half,
                     preferred_element_type=jnp.float32) for g in range(2)],
            axis=1),
        range(CH), x))(x0[:1024])
    print("max diff:", float(jnp.abs(y_full - y_grp).max()))


if __name__ == "__main__":
    main()
