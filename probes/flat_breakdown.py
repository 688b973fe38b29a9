"""Breakdown of the flat tail kernel: which construct costs what.

Variants build up the kernel one construct at a time on m2g-sized data
(M=256000, K=4, W=256, TILE_V=128). Also times a pure-XLA flat tail.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_BIG, N_TRIALS = 16, 5
LN_EPS = 1e-5


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
    ew = jnp.asarray(rng.standard_normal((M, h)) * 0.1, jnp.float32)
    rec = jnp.asarray(rng.standard_normal((Nv, W)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, h)) * 0.1, jnp.float32)
    w2k = jnp.kron(jnp.eye(B, dtype=jnp.float32), w2)
    b2 = jnp.asarray(rng.standard_normal((1, h)) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.standard_normal((1, h)) * 0.1 + 1, jnp.float32)
    lb = jnp.asarray(rng.standard_normal((1, h)) * 0.1, jnp.float32)
    mask = jnp.asarray((rng.random((M, 1)) < 0.97).astype(np.float32))

    TILE_V = 128
    TILE_E = TILE_V * K

    def make_kernel(level):
        def kern(g_ref, ew_ref, rec_ref, w2k_ref, b2_ref, ls_ref, lb_ref,
                 mask_ref, virt_ref):
            x = g_ref[...].astype(jnp.float32)
            if level >= 1:
                ew_t = ew_ref[...].astype(jnp.float32)
                x = x + jnp.concatenate([ew_t] * B, axis=1)
            if level >= 2:
                r = rec_ref[...].astype(jnp.float32)
                tv, Wd = r.shape
                x = x + jnp.broadcast_to(
                    r[:, None, :], (tv, K, Wd)
                ).reshape(tv * K, Wd)
            if level >= 3:
                x = jax.nn.silu(x)
            if level >= 4:
                x = jnp.dot(x, w2k_ref[...],
                            preferred_element_type=jnp.float32)
                x = x + jnp.concatenate([b2_ref[...]] * B, axis=1)
            if level >= 5:
                outs = []
                for b in range(B):
                    xs = x[:, b * h:(b + 1) * h]
                    mean = jnp.mean(xs, axis=-1, keepdims=True)
                    var = jnp.mean(jnp.square(xs - mean), axis=-1,
                                   keepdims=True)
                    outs.append((xs - mean) * jax.lax.rsqrt(var + LN_EPS)
                                * ls_ref[...] + lb_ref[...])
                x = jnp.concatenate(outs, axis=1)
            masked = x * mask_ref[...]
            te = masked.shape[0]
            virt_ref[...] = masked.reshape(te // K, K, W).sum(axis=1)

        return pl.pallas_call(
            kern,
            grid=(M // TILE_E,),
            in_specs=[
                pl.BlockSpec((TILE_E, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_E, h), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_V, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_E, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_V, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Nv, W), jnp.float32),
        )

    names = ["passthrough+reduce", "+ew lane-tile", "+rec bcast", "+silu",
             "+kron matmul", "+LN slices (full)"]
    for level, name in list(enumerate(names))[int(os.environ.get("L0","0")):]:
        fl = make_kernel(level)

        def mk(Kn, fl=fl):
            def f(gg):
                def body(c, _):
                    v = fl(c, ew, rec, w2k, b2, ls, lb, mask)
                    return c * (1 + v.sum() * 1e-30), ()

                out, _ = jax.lax.scan(body, gg, None, length=Kn)
                return out.sum()

            return jax.jit(f)

        try:
            ms = timed_ms(mk, g)
            print(f"L{level} {name:22s}: {ms:6.3f} ms", file=sys.stderr)
        except Exception as e:
            print(f"L{level} {name} FAILED: {type(e).__name__} "
                  f"{str(e)[:200]}", file=sys.stderr)

    # pure-XLA flat tail for comparison
    def xla_tail(gg):
        x = gg + jnp.tile(ew, (1, B)) + jnp.repeat(rec, K, axis=0)
        x = jax.nn.silu(x)
        x = jnp.dot(x, w2k, preferred_element_type=jnp.float32)
        x = x + jnp.tile(b2, (1, B))
        xs = x.reshape(M, B, h)
        mean = jnp.mean(xs, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xs - mean), axis=-1, keepdims=True)
        msg = ((xs - mean) * jax.lax.rsqrt(var + LN_EPS) * ls + lb).reshape(
            M, W
        )
        masked = msg * mask
        return masked.reshape(Nv, K, W).sum(axis=1)

    def mk_xla(Kn):
        def f(gg):
            def body(c, _):
                v = xla_tail(c)
                return c * (1 + v.sum() * 1e-30), ()

            out, _ = jax.lax.scan(body, gg, None, length=Kn)
            return out.sum()

        return jax.jit(f)

    ms = timed_ms(mk_xla, g)
    print(f"pure-XLA flat tail      : {ms:6.3f} ms", file=sys.stderr)
    print("done")


if __name__ == "__main__":
    main()
