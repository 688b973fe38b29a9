"""Is the flat tail kernel MXU-bound on the group-LN stats matmuls?

Variants of the m2g-sized tail (M=256000, K=4, W=256, TILE_V=256):
  A dma-floor   : read g/ew/rec, masked sum only (no matmuls)
  B +w2k        : + silu + x@w2k + b2 (1 full (W,W) matmul / edge row)
  C full-ln     : current kernel (w2k + 2 ones_k stat matmuls = 3 full)
  D cheap-ln    : w2k + skinny (W,B) stat matmuls + (B,W) broadcasts
All produce bit-different but same-shape outputs; D is numerically
equivalent to C up to fp32 rounding (verified vs C on device).
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
    TILE_V = 256
    TILE_E = TILE_V * K
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((M, W)) * 0.1, jnp.float32)
    ew = jnp.asarray(rng.standard_normal((M, h)) * 0.1, jnp.float32)
    rec = jnp.asarray(rng.standard_normal((Nv, W)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, h)) * 0.1, jnp.float32)
    eye = jnp.eye(B, dtype=jnp.float32)
    w2k = jnp.kron(eye, w2)
    b2 = jnp.asarray(rng.standard_normal((1, h)) * 0.1, jnp.float32)
    b2w = jnp.tile(b2, (1, B))
    ls = jnp.tile(jnp.asarray(rng.standard_normal((1, h)), jnp.float32),
                  (1, B))
    lb = jnp.tile(jnp.asarray(rng.standard_normal((1, h)), jnp.float32),
                  (1, B))
    ones_k = jnp.kron(eye, jnp.full((h, h), 1.0 / h, jnp.float32))
    # skinny stats operators: U (W, B) group mean; G (B, W) broadcast-back
    U = jnp.kron(eye, jnp.full((h, 1), 1.0 / h, jnp.float32))  # (W, B)
    G = jnp.kron(eye, jnp.ones((1, h), jnp.float32))  # (B, W)
    mask = jnp.asarray(rng.random((Nv, K)) < 0.9, jnp.float32)

    cp = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    def lane_tile(x):
        return jnp.concatenate([x] * B, axis=-1)

    def kern(variant, g_ref, ew_ref, rec_ref, w2k_ref, b2_ref, ls_ref,
             lb_ref, onesk_ref, u_ref, g2_ref, mask_ref, out_ref):
        ew_w = lane_tile(ew_ref[...])
        r = rec_ref[...]
        rr = jnp.broadcast_to(r[:, None, :], (TILE_V, K, W)).reshape(TILE_E, W)
        x0 = g_ref[...] + ew_w + rr
        if variant == "A":
            msg = x0
        else:
            y = jax.nn.silu(x0)
            x = jnp.dot(y, w2k_ref[...],
                        preferred_element_type=jnp.float32) + b2_ref[...]
            if variant == "B":
                msg = x * ls_ref[...] + lb_ref[...]
            elif variant == "C":
                mean = jnp.dot(x, onesk_ref[...],
                               preferred_element_type=jnp.float32)
                cent = x - mean
                var = jnp.dot(cent * cent, onesk_ref[...],
                              preferred_element_type=jnp.float32)
                msg = cent * jax.lax.rsqrt(var + LN_EPS) * ls_ref[...] \
                    + lb_ref[...]
            else:  # D: skinny stats
                m_s = jnp.dot(x, u_ref[...],
                              preferred_element_type=jnp.float32)  # (E, B)
                m2_s = jnp.dot(x * x, u_ref[...],
                               preferred_element_type=jnp.float32)
                var_s = m2_s - m_s * m_s
                rstd_s = jax.lax.rsqrt(var_s + LN_EPS)
                mw = jnp.dot(m_s, g2_ref[...],
                             preferred_element_type=jnp.float32)  # (E, W)
                rw = jnp.dot(rstd_s, g2_ref[...],
                             preferred_element_type=jnp.float32)
                msg = (x - mw) * rw * ls_ref[...] + lb_ref[...]
        masked = msg.reshape(TILE_V, K, W) * mask_ref[...][..., None]
        out_ref[...] = masked.sum(axis=1)

    def run(variant):
        f = pl.pallas_call(
            functools.partial(kern, variant),
            grid=(Nv // TILE_V,),
            in_specs=[
                pl.BlockSpec((TILE_E, W), lambda v: (v, 0)),
                pl.BlockSpec((TILE_E, h), lambda v: (v, 0)),
                pl.BlockSpec((TILE_V, W), lambda v: (v, 0)),
                pl.BlockSpec((W, W), lambda v: (0, 0)),
                pl.BlockSpec((1, W), lambda v: (0, 0)),
                pl.BlockSpec((1, W), lambda v: (0, 0)),
                pl.BlockSpec((1, W), lambda v: (0, 0)),
                pl.BlockSpec((W, W), lambda v: (0, 0)),
                pl.BlockSpec((W, B), lambda v: (0, 0)),
                pl.BlockSpec((B, W), lambda v: (0, 0)),
                pl.BlockSpec((TILE_V, K), lambda v: (v, 0)),
            ],
            out_specs=pl.BlockSpec((TILE_V, W), lambda v: (v, 0)),
            out_shape=jax.ShapeDtypeStruct((Nv, W), jnp.float32),
            compiler_params=cp,
        )

        def make(KK):
            def many(g, ew, rec):
                def body(c, _):
                    o = f(g, ew, rec * c, w2k, b2w, ls, lb, ones_k, U, G,
                          mask)
                    return 1.0 + o.sum() * 1e-30, ()

                fin, _ = jax.lax.scan(body, 1.0, None, length=KK)
                return fin

            return jax.jit(many)

        return make

    # numerics check D vs C
    import jax

    outs = {}
    for v in ("C", "D"):
        f = pl.pallas_call(
            functools.partial(kern, v), grid=(Nv // TILE_V,),
            in_specs=[
                pl.BlockSpec((TILE_E, W), lambda v: (v, 0)),
                pl.BlockSpec((TILE_E, h), lambda v: (v, 0)),
                pl.BlockSpec((TILE_V, W), lambda v: (v, 0)),
                pl.BlockSpec((W, W), lambda v: (0, 0)),
                pl.BlockSpec((1, W), lambda v: (0, 0)),
                pl.BlockSpec((1, W), lambda v: (0, 0)),
                pl.BlockSpec((1, W), lambda v: (0, 0)),
                pl.BlockSpec((W, W), lambda v: (0, 0)),
                pl.BlockSpec((W, B), lambda v: (0, 0)),
                pl.BlockSpec((B, W), lambda v: (0, 0)),
                pl.BlockSpec((TILE_V, K), lambda v: (v, 0)),
            ],
            out_specs=pl.BlockSpec((TILE_V, W), lambda v: (v, 0)),
            out_shape=jax.ShapeDtypeStruct((Nv, W), jnp.float32),
            compiler_params=cp,
        )
        outs[v] = np.asarray(jax.jit(f)(g, ew, rec, w2k, b2w, ls, lb,
                                        ones_k, U, G, mask))
    err = np.abs(outs["C"] - outs["D"]).max()
    print(f"max |C-D| = {err:.3e}", file=sys.stderr)

    for v in ("A", "B", "C", "D"):
        ms = timed_ms(run(v), g, ew, rec)
        print(f"variant {v}: {ms:7.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
