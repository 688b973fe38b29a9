"""Prototype: flat-lane (M, B*h) edge-tail kernel vs current (B, M, h) one.

Validates Mosaic lowering of: 256-lane blocks, kron-block-diag matmul,
per-64-lane-slice LayerNorm, lane-tiled ew broadcast, K-slot reduce.
Measures both on m2g-sized data (M=256000, K=4) and checks numerics.
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

    from neural_lam_tpu.ops.pallas_edge import edge_tail_sum

    B, h, K = 4, 64, 4
    Nv, Nrec = 64000, 63784
    M = Nv * K
    W = B * h
    rng = np.random.default_rng(0)
    gathered_b = jnp.asarray(rng.standard_normal((B, M, h)) * 0.1,
                             jnp.float32)
    ew = jnp.asarray(rng.standard_normal((M, h)) * 0.1, jnp.float32)
    rec_rows_b = jnp.asarray(rng.standard_normal((B, Nv, h)) * 0.1,
                             jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, h)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((h,)) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.standard_normal((h,)) * 0.1 + 1, jnp.float32)
    lb = jnp.asarray(rng.standard_normal((h,)) * 0.1, jnp.float32)
    mask = jnp.asarray((rng.random((M, 1)) < 0.97).astype(np.float32))

    # flat layouts
    gathered_f = jnp.transpose(gathered_b, (1, 0, 2)).reshape(M, W)
    rec_rows_f = jnp.transpose(rec_rows_b, (1, 0, 2)).reshape(Nv, W)

    TILE_V = int(os.environ.get("TILE_V", "512"))
    TILE_E = TILE_V * K

    def flat_kernel(Kk, Bb, g_ref, ew_ref, rec_ref, w2k_ref, b2_ref,
                    ls_ref, lb_ref, mask_ref, virt_ref):
        hh = ew_ref.shape[-1]
        ew_t = ew_ref[...].astype(jnp.float32)  # (TILE_E, h)
        ew_w = jnp.concatenate([ew_t] * Bb, axis=1)  # (TILE_E, B*h)
        rec = rec_ref[...].astype(jnp.float32)  # (TILE_V, W)
        tile_v, Wd = rec.shape
        rec_rep = jnp.broadcast_to(
            rec[:, None, :], (tile_v, Kk, Wd)
        ).reshape(tile_v * Kk, Wd)
        x = jax.nn.silu(g_ref[...].astype(jnp.float32) + ew_w + rec_rep)
        mm = os.environ.get("MM", "kron32")
        if mm == "kron16":
            x = jnp.dot(x.astype(jnp.bfloat16),
                        w2k_ref[...].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        elif mm == "slice16":
            w2s = w2k_ref[0:hh, 0:hh].astype(jnp.bfloat16)
            xs = [
                jnp.dot(x[:, b * hh:(b + 1) * hh].astype(jnp.bfloat16),
                        w2s, preferred_element_type=jnp.float32)
                for b in range(Bb)
            ]
            x = jnp.concatenate(xs, axis=1)
        else:
            x = jnp.dot(x, w2k_ref[...], preferred_element_type=jnp.float32)
        x = x + jnp.concatenate([b2_ref[...]] * Bb, axis=1)
        # per-64-lane-group LayerNorm
        outs = []
        for b in range(Bb):
            xs = x[:, b * hh:(b + 1) * hh]
            mean = jnp.mean(xs, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xs - mean), axis=-1, keepdims=True)
            outs.append((xs - mean) * jax.lax.rsqrt(var + LN_EPS)
                        * ls_ref[...] + lb_ref[...])
        msg = jnp.concatenate(outs, axis=1)
        masked = msg * mask_ref[...]
        tile_e = masked.shape[0]
        virt_ref[...] = masked.reshape(tile_e // Kk, Kk, Wd).sum(axis=1)

    w2k = jnp.kron(jnp.eye(B, dtype=jnp.float32), w2)  # (W, W)

    flat = pl.pallas_call(
        functools.partial(flat_kernel, K, B),
        grid=(M // TILE_E,),
        in_specs=[
            pl.BlockSpec((TILE_E, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_V, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nv, W), jnp.float32),
    )

    # numerics check vs current kernel
    try:
        virt_f = jax.jit(
            lambda g, e, r: flat(g, e, r, w2k, b2.reshape(1, h),
                                 ls.reshape(1, h), lb.reshape(1, h), mask)
        )(gathered_f, ew, rec_rows_f)
        _, virt_b = jax.jit(
            functools.partial(edge_tail_sum, K=K, with_messages=False)
        )(gathered_b, ew, rec_rows_b, w2, b2, ls, lb, mask)
        virt_f_as_b = jnp.transpose(
            jnp.reshape(virt_f, (Nv, B, h)), (1, 0, 2)
        )
        err = float(jnp.max(jnp.abs(virt_f_as_b - virt_b)))
        print(f"numerics max|diff| = {err:.3e}", file=sys.stderr)
    except Exception as e:
        print(f"flat kernel FAILED: {type(e).__name__}: {str(e)[:800]}",
              file=sys.stderr)
        return

    # timing: flat kernel
    def make_flat(Kn):
        def f(g, e, r):
            def body(c, _):
                v = flat(c, e, r, w2k, b2.reshape(1, h), ls.reshape(1, h),
                         lb.reshape(1, h), mask)
                return c * (1 + v.sum() * 1e-30), ()

            out, _ = jax.lax.scan(body, g, None, length=Kn)
            return out.sum()

        return jax.jit(f)

    ms = timed_ms(make_flat, gathered_f, ew, rec_rows_f)
    moved = (M * W + M * h + Nv * W + Nv * W) * 4
    print(f"flat tail: {ms:6.3f} ms  ~{moved/ms*1e-6:6.1f} GB/s",
          file=sys.stderr)

    def make_batched(Kn):
        def f(g, e, r):
            def body(c, _):
                _, v = edge_tail_sum(c, e, r, w2, b2, ls, lb, mask, K,
                                     False, False)
                return c * (1 + v.sum() * 1e-30), ()

            out, _ = jax.lax.scan(body, g, None, length=Kn)
            return out.sum()

        return jax.jit(f)

    ms_b = timed_ms(make_batched, gathered_b, ew, rec_rows_b)
    print(f"batched tail (current): {ms_b:6.3f} ms", file=sys.stderr)
    print("done")


if __name__ == "__main__":
    main()
