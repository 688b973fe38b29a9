"""Isolated timing of the fused grid-update kernel + matmul-precision
variants, m2g bench sizes (M=256000, K=4, W=256, d_out=17).

Variants:
  full      : grid_update_flat as shipped (f32 dots)
  tail-only : edge_tail_sum_flat on the same data (pre-fusion kernel)
  bf16mm    : same fused kernel but every dot's operands cast to bf16
              (f32 accumulate) — detects MXU f32-rate limiting
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

    from neural_lam_tpu.ops import pallas_grid_update as pgu
    from neural_lam_tpu.ops.pallas_edge_flat import edge_tail_sum_flat

    B, h, K, d_out = 4, 64, 4, 17
    Nv = 64000
    N = 63784
    M = Nv * K
    W = B * h
    rng = np.random.default_rng(0)
    gathered = jnp.asarray(rng.standard_normal((M, W)) * 0.1, jnp.float32)
    ew = jnp.asarray(rng.standard_normal((M, h)) * 0.1, jnp.float32)
    ge = jnp.asarray(rng.standard_normal((N, W)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.random((Nv, K)) < 0.97, jnp.float32)

    def mk(d1, d2=None):
        if d2 is None:
            return jnp.asarray(rng.standard_normal((d1,)) * 0.1, jnp.float32)
        return jnp.asarray(rng.standard_normal((d1, d2)) * 0.1, jnp.float32)

    pp = {
        "w_i": mk(h, h), "w2": mk(h, h), "b2": mk(h),
        "e_ls": 1.0 + mk(h), "e_lb": mk(h),
        "enc_w0": mk(h, h), "enc_b0": mk(h), "enc_w1": mk(h, h),
        "enc_b1": mk(h), "enc_ls": 1.0 + mk(h), "enc_lb": mk(h),
        "a_w0": mk(2 * h, h), "a_b0": mk(h), "a_w1": mk(h, h),
        "a_b1": mk(h), "a_ls": 1.0 + mk(h), "a_lb": mk(h),
        "o_w0": mk(h, h), "o_b0": mk(h), "o_w1": mk(h, d_out),
        "o_b1": mk(d_out),
    }

    def scan_time(fn, *arrs):
        def make(KK):
            def many(*a):
                def body(c, _):
                    o = fn(*a, c)
                    return 1.0 + o * 1e-30, ()

                fin, _ = jax.lax.scan(body, 1.0, None, length=KK)
                return fin

            return jax.jit(many)

        return timed_ms(make, *arrs)

    # full fused kernel
    def full(g, e, x, c):
        o = pgu.grid_update_flat(g, e, x * c, mask, pp, K, False)
        return o.sum()

    print(f"full fused : {scan_time(full, gathered, ew, ge):7.3f} ms",
          file=sys.stderr)

    # tail-only (old kernel) on same data
    rec_rows = jnp.asarray(rng.standard_normal((Nv, W)) * 0.1, jnp.float32)

    def tail(g, e, r, c):
        _, v = edge_tail_sum_flat(g, e, r * c, pp["w2"], pp["b2"],
                                  pp["e_ls"], pp["e_lb"], mask, K, False,
                                  False)
        return v.sum()

    print(f"tail-only  : {scan_time(tail, gathered, ew, rec_rows):7.3f} ms",
          file=sys.stderr)

    # bf16-operand dots variant
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    consts = pgu._prep_consts(pp, B)
    TILE_V = 256
    TILE_E = TILE_V * K
    w_out = consts["o_w1k"].shape[1]

    def bdot(a, b):
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    def gln(x, ones, ls, lb):
        mean = bdot(x, ones)
        cent = x - mean
        var = bdot(cent * cent, ones)
        return cent * jax.lax.rsqrt(var + 1e-5) * ls + lb

    def kern(g_ref, ew_ref, ge_ref, mask_ref, *cs):
        c = dict(zip(pgu._CONST_NAMES, [r[...] for r in cs[:-1]]))
        out_ref = cs[-1]
        f32 = jnp.float32
        ones = c["ones_k"]
        gev = ge_ref[...].astype(f32)
        t = jax.nn.silu(bdot(gev, c["enc_w0k"]) + c["enc_b0w"])
        t = bdot(t, c["enc_w1k"]) + c["enc_b1w"]
        gr = gev + gln(t, ones, c["enc_lsw"], c["enc_lbw"])
        rec = bdot(gr, c["w_ik"])
        rec_rep = jnp.broadcast_to(rec[:, None, :],
                                   (TILE_V, K, W)).reshape(TILE_E, W)
        ew_w = jnp.concatenate([ew_ref[...].astype(f32)] * B, axis=-1)
        x = jax.nn.silu(g_ref[...].astype(f32) + ew_w + rec_rep)
        x = bdot(x, c["w2k"]) + c["b2w"]
        msg = gln(x, ones, c["e_lsw"], c["e_lbw"])
        agg = (msg.reshape(TILE_V, K, W) * mask_ref[...][..., None]).sum(1)
        u = jax.nn.silu(bdot(gr, c["a_wrk"]) + bdot(agg, c["a_wak"])
                        + c["a_b0w"])
        u = bdot(u, c["a_w1k"]) + c["a_b1w"]
        rec_out = gr + gln(u, ones, c["a_lsw"], c["a_lbw"])
        y = jax.nn.silu(bdot(rec_out, c["o_w0k"]) + c["o_b0w"])
        out_ref[...] = (bdot(y, c["o_w1k"]) + c["o_b1w"]).astype(
            out_ref.dtype)

    cspecs = [pl.BlockSpec(consts[n].shape, lambda v: (0, 0),
                           memory_space=pltpu.VMEM)
              for n in pgu._CONST_NAMES]
    callp = pl.pallas_call(
        kern,
        grid=(Nv // TILE_V,),
        in_specs=[
            pl.BlockSpec((TILE_E, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, h), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, K), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
        ] + cspecs,
        out_specs=pl.BlockSpec((TILE_V, w_out), lambda v: (v, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nv, w_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )

    def bf16mm(g, e, x, c):
        xs = jnp.pad(x * c, ((0, Nv - N), (0, 0)))
        o = callp(g, e, xs, mask, *[consts[n] for n in pgu._CONST_NAMES])
        return o.sum()

    print(f"bf16mm     : {scan_time(bf16mm, gathered, ew, ge):7.3f} ms",
          file=sys.stderr)

    # numerics of bf16mm vs full
    o_full = pgu.grid_update_flat(gathered, ew, ge, mask, pp, K, False)
    o_b = callp(jnp.asarray(gathered), ew, jnp.pad(ge, ((0, Nv - N), (0, 0))),
                mask, *[consts[n] for n in pgu._CONST_NAMES])
    a = np.asarray(o_full)[:N, :B * d_out]
    b = np.asarray(o_b)[:N, :B * d_out]
    rel = np.abs(a - b).mean() / max(np.abs(a).mean(), 1e-9)
    print(f"bf16mm rel err vs full: {rel:.3e}", file=sys.stderr)


if __name__ == "__main__":
    main()
