"""Pallas TPU kernel for the edge-MLP tail of the interaction net.

The per-edge message chain after the decomposed first layer is

    x1  = silu(x0)                 x0 = e@We + send_t[senders] + rec_t + b0
    x2  = x1 @ W2 + b2
    msg = LayerNorm(x2)
    virt[v] = sum_k msg[v*K + k] * mask[v*K + k]      (dense-layout reduce)

XLA materializes each intermediate (B, M, h) tensor in HBM; this kernel
performs the whole tail in one VMEM-resident pass per edge tile — silu on
the VPU, the h x h matmul on the MXU, LayerNorm statistics in fp32, and the
K-slot masked reduction via strided sublane slices — writing only `msg` and
the (K x smaller) `virt` back to HBM.

Backward is a custom VJP composed of standard XLA ops (recompute-based, no
saved intermediates beyond the inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import LN_EPS


def _tail_reference(x0, w2, b2, ln_scale, ln_bias, mask, K):
    """Plain-XLA reference implementation (also the VJP recompute)."""
    x = jax.nn.silu(x0)
    x = jnp.dot(x, w2, preferred_element_type=jnp.float32) + b2
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    msg = (x - mean) * jax.lax.rsqrt(var + LN_EPS) * ln_scale + ln_bias
    masked = msg * mask
    B, M, h = msg.shape
    virt = masked.reshape(B, M // K, K, h).sum(axis=2)
    return msg, virt


def _tail_kernel(K, with_messages, x0_ref, w2_ref, b2_ref, ls_ref, lb_ref,
                 mask_ref, *out_refs):
    x = jax.nn.silu(x0_ref[...])  # (TILE_E, h)
    x = (
        jnp.dot(x, w2_ref[...], preferred_element_type=jnp.float32)
        + b2_ref[...]
    )
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    msg = (x - mean) * jax.lax.rsqrt(var + LN_EPS) * ls_ref[...] + lb_ref[...]
    if with_messages:
        out_refs[0][...] = msg
    virt_ref = out_refs[-1]
    masked = msg * mask_ref[...]
    tile_e, h = masked.shape
    virt_ref[...] = masked.reshape(tile_e // K, K, h).sum(axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def edge_tail(x0, w2, b2, ln_scale, ln_bias, mask, K: int,
              interpret: bool = False, with_messages: bool = True):
    """Fused edge-MLP tail. x0: (B, M, h); mask: (M, 1); M = N_virt * K.

    Returns (messages (B, M, h) or None, virt (B, M//K, h)). Pass
    with_messages=False when the caller only needs the aggregation
    (update_edges=False GNNs) — skips writing the big messages tensor.
    """
    return _edge_tail_fwd_impl(x0, w2, b2, ln_scale, ln_bias, mask, K,
                               interpret, with_messages)


def _edge_tail_fwd_impl(x0, w2, b2, ln_scale, ln_bias, mask, K, interpret,
                        with_messages):
    B, M, h = x0.shape
    n_virt = M // K
    assert n_virt * K == M

    TILE_V = 256
    while n_virt % TILE_V and TILE_V > 8:
        TILE_V //= 2
    if n_virt % TILE_V or TILE_V < 64:
        # not tileable with healthy tile sizes; fall back to XLA
        msg, virt = _tail_reference(x0, w2, b2, ln_scale, ln_bias, mask, K)
        return (msg if with_messages else None), virt
    TILE_E = TILE_V * K

    grid = (B, n_virt // TILE_V)
    msg_shape = [jax.ShapeDtypeStruct((B, M, h), jnp.float32)]
    msg_spec = [pl.BlockSpec((None, TILE_E, h), lambda b, v: (b, v, 0),
                             memory_space=pltpu.VMEM)]
    if not with_messages:
        msg_shape, msg_spec = [], []
    out_shape = tuple(
        msg_shape + [jax.ShapeDtypeStruct((B, n_virt, h), jnp.float32)]
    )
    kernel = functools.partial(_tail_kernel, K, with_messages)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, TILE_E, h), lambda b, v: (b, v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda b, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, 1), lambda b, v: (v, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            msg_spec + [pl.BlockSpec((None, TILE_V, h), lambda b, v: (b, v, 0),
                                     memory_space=pltpu.VMEM)]
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(x0, w2, b2.reshape(1, h), ln_scale.reshape(1, h),
      ln_bias.reshape(1, h), mask)
    if with_messages:
        return outs[0], outs[1]
    return None, outs[0]


def _edge_tail_fwd(x0, w2, b2, ln_scale, ln_bias, mask, K, interpret,
                   with_messages):
    out = _edge_tail_fwd_impl(x0, w2, b2, ln_scale, ln_bias, mask, K,
                              interpret, with_messages)
    return out, (x0, w2, b2, ln_scale, ln_bias, mask)


def _edge_tail_bwd(K, interpret, with_messages, res, grads):
    x0, w2, b2, ln_scale, ln_bias, mask = res
    g_msg, g_virt = grads
    if g_msg is None or not with_messages:
        g_msg = jnp.zeros(x0.shape, x0.dtype)

    def fwd(x0, w2, b2, ln_scale, ln_bias, mask):
        return _tail_reference(x0, w2, b2, ln_scale, ln_bias, mask, K)

    _, vjp = jax.vjp(fwd, x0, w2, b2, ln_scale, ln_bias, mask)
    return vjp((g_msg, g_virt))


edge_tail.defvjp(_edge_tail_fwd, _edge_tail_bwd)
