"""Where do the 59 ms of fused-decode backward go?

Times, isolated in the scan harness at bench scale (n_virt=65536, K=4,
W=256):
  fwd_kernel    - grid_update_flat forward (Pallas)
  fwd_ref       - _grid_update_reference forward (flat XLA)
  vjp_all       - value+grad of the kernel wrt all inputs+params
                  (custom VJP: recompute via reference + XLA bwd)
  vjp_ref_all   - value+grad of the reference directly (no custom VJP)
  vjp_inputs    - grads wrt (gathered, ge) only, params stopped
  vjp_params    - grads wrt params only, tensor inputs stopped

Usage: python probes/decode_bwd.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

N_VIRT, K, B, H, D_OUT = 65536, 4, 4, 64, 17
K_BIG, N_TRIALS = 8, 5


def main():
    import jax
    import jax.numpy as jnp

    from neural_lam_tpu.ops.pallas_grid_update import (
        _grid_update_reference,
        grid_update_flat,
    )

    rng = np.random.default_rng(0)
    W = B * H
    M = N_VIRT * K

    def arr(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)

    gathered = arr(M, W)
    ew = arr(M, H)
    ge = arr(N_VIRT, W)
    mask = jnp.ones((N_VIRT, K), jnp.float32)
    pp = {
        "w_i": arr(H, H), "w2": arr(H, H), "b2": arr(H),
        "e_ls": arr(H), "e_lb": arr(H),
        "enc_w0": arr(H, H), "enc_b0": arr(H),
        "enc_w1": arr(H, H), "enc_b1": arr(H),
        "enc_ls": arr(H), "enc_lb": arr(H),
        "a_w0": arr(2 * H, H), "a_b0": arr(H),
        "a_w1": arr(H, H), "a_b1": arr(H),
        "a_ls": arr(H), "a_lb": arr(H),
        "o_w0": arr(H, H), "o_b0": arr(H),
        "o_w1": arr(H, D_OUT), "o_b1": arr(D_OUT),
    }

    def kernel_fn(g, e, x, m, p):
        return grid_update_flat(g, e, x, m, p, K, False)

    def ref_fn(g, e, x, m, p):
        return _grid_update_reference(g, e, x, m, p, K, B)

    stop = jax.lax.stop_gradient

    variants = {
        "fwd_kernel": lambda g, e, x, p: kernel_fn(g, e, x, mask, p).sum(),
        "fwd_ref": lambda g, e, x, p: ref_fn(g, e, x, mask, p).sum(),
    }

    def grad_scalar(fn, wrt):
        def run(g, e, x, p):
            def loss(g_, x_, p_):
                gg = g_ if "in" in wrt else stop(g_)
                xx = x_ if "in" in wrt else stop(x_)
                ppd = p_ if "par" in wrt else jax.tree_util.tree_map(stop, p_)
                return fn(gg, e, xx, mask, ppd).sum()

            val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(g, x, p)
            return val + sum(
                t.sum().astype(jnp.float32)
                for t in jax.tree_util.tree_leaves(grads)
            )

        return run

    variants["vjp_all"] = grad_scalar(kernel_fn, ("in", "par"))
    variants["vjp_ref_all"] = grad_scalar(ref_fn, ("in", "par"))
    variants["vjp_inputs"] = grad_scalar(kernel_fn, ("in",))
    variants["vjp_params"] = grad_scalar(kernel_fn, ("par",))

    def make(K_scan, fn):
        def many(g, e, x, p):
            def body(carry, _):
                c = carry
                s = fn(g * (1.0 + c * 1e-30), e, x, p)
                return s.astype(jnp.float32), ()

            fin, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=K_scan)
            return fin

        return jax.jit(many)

    results = {}
    for name, fn in variants.items():
        per = {}
        for K_scan in (1, K_BIG):
            f = make(K_scan, fn)
            float(f(gathered, ew, ge, pp))
            ts = []
            for _ in range(N_TRIALS):
                t1 = time.time()
                float(f(gathered, ew, ge, pp))
                ts.append(time.time() - t1)
            per[K_scan] = float(np.median(ts))
        ms = (per[K_BIG] - per[1]) / (K_BIG - 1) * 1e3
        results[name] = round(ms, 3)
        print(f"{name:12s}: {ms:8.3f} ms", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
