"""Producing flat (N, B*h) node transforms straight from (B, N, h) inputs.

Compares:
  A) current: per-batch matmul (B,N,h)@(h,h) -> transpose -> (N,B*h) -> gather
  B) einsum('bnh,hk->nbk') + reshape(N, B*h) -> gather
  C) keep states flat: (N, B*h) @ kron(I_B, w) -> gather  (layout never leaves flat)
All end with jnp.take(rows, idx, axis=0) so the consumer is identical.
"""
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

    B, h = 4, 64
    N, M = 63784, 262144  # grid-sized source, m2g-sized edges
    W = B * h
    rng = np.random.default_rng(0)
    x_b = jnp.asarray(rng.standard_normal((B, N, h)), jnp.float32)
    x_f = jnp.transpose(x_b, (1, 0, 2)).reshape(N, W)
    w = jnp.asarray(rng.standard_normal((h, h)) * 0.1, jnp.float32)
    wk = jnp.kron(jnp.eye(B, dtype=jnp.float32), w)
    idx = jnp.asarray(rng.integers(0, N, size=M), jnp.int32)

    def run(name, mk, *args):
        ms = timed_ms(mk, *args)
        print(f"{name}: {ms:6.3f} ms", file=sys.stderr)

    def mk_a(K):
        def f(xb):
            def body(c, _):
                t = jnp.dot(c, w, preferred_element_type=jnp.float32)
                tf = jnp.transpose(t, (1, 0, 2)).reshape(N, W)
                g = jnp.take(tf, idx, axis=0)
                return c * (1 + g.sum() * 1e-30), ()

            out, _ = jax.lax.scan(body, xb, None, length=K)
            return out.sum()

        return jax.jit(f)

    def mk_b(K):
        def f(xb):
            def body(c, _):
                t = jnp.einsum("bnh,hk->nbk", c,  w,
                               preferred_element_type=jnp.float32)
                tf = t.reshape(N, W)
                g = jnp.take(tf, idx, axis=0)
                return c * (1 + g.sum() * 1e-30), ()

            out, _ = jax.lax.scan(body, xb, None, length=K)
            return out.sum()

        return jax.jit(f)

    def mk_c(K):
        def f(xf):
            def body(c, _):
                t = jnp.dot(c, wk, preferred_element_type=jnp.float32)
                g = jnp.take(t, idx, axis=0)
                return c * (1 + g.sum() * 1e-30), ()

            out, _ = jax.lax.scan(body, xf, None, length=K)
            return out.sum()

        return jax.jit(f)

    run("A per-batch mm + transpose + gather", mk_a, x_b)
    run("B einsum nbk + reshape + gather    ", mk_b, x_b)
    run("C flat state @ kron + gather       ", mk_c, x_f)
    print("done")


if __name__ == "__main__":
    main()
