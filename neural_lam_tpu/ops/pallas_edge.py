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


def _ln_cast(x, ls, lb, dtype):
    """LayerNorm with fp32 statistics, output cast to dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS) * ls + lb
    return out.astype(dtype)


def _tail_kernel(K, with_messages, x0_ref, w2_ref, b2_ref, ls_ref, lb_ref,
                 mask_ref, *out_refs):
    # bf16 inputs/outputs halve the DMA traffic; compute stays fp32
    dt = x0_ref.dtype
    x = jax.nn.silu(x0_ref[...].astype(jnp.float32))  # (TILE_E, h)
    x = (
        jnp.dot(x, w2_ref[...], preferred_element_type=jnp.float32)
        + b2_ref[...]
    )
    msg = _ln_cast(x, ls_ref[...], lb_ref[...], jnp.float32)
    if with_messages:
        out_refs[0][...] = msg.astype(dt)
    virt_ref = out_refs[-1]
    masked = msg * mask_ref[...]
    tile_e, h = masked.shape
    virt_ref[...] = masked.reshape(tile_e // K, K, h).sum(axis=1).astype(dt)


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


def _pick_tile_v_batched(n_virt: int, K: int) -> int:
    """Largest TILE_V >= 64 dividing n_virt with TILE_V*K <= ~2k edge
    rows; 0 when none exists. Halving from the target first (the
    historical choice — kernel VMEM footprints are tuned to it), then a
    full divisor search over multiples of 8: halving misses every
    divisor of n_virt = 2^k * odd that is not target/2^i (TILE_V must be
    a multiple of 8 per Mosaic's block-shape rule)."""
    cap = max(2048 // K, 256)
    tile = cap
    while tile > 64 and n_virt % tile:
        tile //= 2
    if tile >= 64 and n_virt % tile == 0:
        return tile
    for d in range(cap - cap % 8, 63, -8):
        if n_virt % d == 0:
            return d
    return 0


def _edge_tail_fwd_impl(x0, w2, b2, ln_scale, ln_bias, mask, K, interpret,
                        with_messages):
    B, M, h = x0.shape
    n_virt = M // K
    assert n_virt * K == M

    TILE_V = _pick_tile_v_batched(n_virt, K)
    if TILE_V < 64:
        # not tileable with healthy tile sizes; fall back to XLA
        msg, virt = _tail_reference(x0, w2, b2, ln_scale, ln_bias, mask, K)
        return (msg if with_messages else None), virt
    TILE_E = TILE_V * K

    grid = (B, n_virt // TILE_V)
    dt = x0.dtype
    msg_shape = [jax.ShapeDtypeStruct((B, M, h), dt)]
    msg_spec = [pl.BlockSpec((None, TILE_E, h), lambda b, v: (b, v, 0),
                             memory_space=pltpu.VMEM)]
    if not with_messages:
        msg_shape, msg_spec = [], []
    out_shape = tuple(
        msg_shape + [jax.ShapeDtypeStruct((B, n_virt, h), dt)]
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



def _tail_sum_kernel(K, with_messages, gathered_ref, ew_ref, rec_ref,
                     w2_ref, b2_ref, ls_ref, lb_ref, mask_ref, *out_refs):
    """Tail kernel building x0 in VMEM from its summands: gathered sender
    rows (TILE_E, h), static ew (TILE_E, h) and per-virtual-row receiver
    transforms (TILE_V, h) broadcast over the K slots."""
    dt = gathered_ref.dtype
    rec = rec_ref[...].astype(jnp.float32)  # (TILE_V, h)
    tile_v, h = rec.shape
    rec_rep = jnp.broadcast_to(rec[:, None, :], (tile_v, K, h)).reshape(
        tile_v * K, h
    )
    x = jax.nn.silu(
        gathered_ref[...].astype(jnp.float32)
        + ew_ref[...].astype(jnp.float32) + rec_rep
    )
    x = (
        jnp.dot(x, w2_ref[...], preferred_element_type=jnp.float32)
        + b2_ref[...]
    )
    msg = _ln_cast(x, ls_ref[...], lb_ref[...], jnp.float32)
    if with_messages:
        out_refs[0][...] = msg.astype(dt)
    virt_ref = out_refs[-1]
    masked = msg * mask_ref[...]
    tile_e, h = masked.shape
    virt_ref[...] = masked.reshape(tile_e // K, K, h).sum(axis=1).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def edge_tail_sum(gathered, ew, rec_rows, w2, b2, ln_scale, ln_bias, mask,
                  K: int, interpret: bool = False,
                  with_messages: bool = True):
    """Fused tail taking x0's summands: gathered (B, M, h) sender rows,
    ew (M, h) static edge product (+bias), rec_rows (B, Nv, h) receiver
    transforms (broadcast x K inside the kernel). Avoids materializing x0."""
    return _edge_tail_sum_impl(gathered, ew, rec_rows, w2, b2, ln_scale,
                               ln_bias, mask, K, interpret, with_messages)


def _sum_reference(gathered, ew, rec_rows, w2, b2, ln_scale, ln_bias, mask, K):
    x0 = gathered + ew + jnp.repeat(rec_rows, K, axis=-2)
    return _tail_reference(x0, w2, b2, ln_scale, ln_bias, mask, K)


def _edge_tail_sum_impl(gathered, ew, rec_rows, w2, b2, ln_scale, ln_bias,
                        mask, K, interpret, with_messages):
    B, M, h = gathered.shape
    n_virt = M // K
    TILE_V = _pick_tile_v_batched(n_virt, K)
    if TILE_V < 64:
        msg, virt = _sum_reference(gathered, ew, rec_rows, w2, b2, ln_scale,
                                   ln_bias, mask, K)
        return (msg if with_messages else None), virt
    TILE_E = TILE_V * K
    grid = (B, n_virt // TILE_V)
    dt = gathered.dtype
    msg_shape = [jax.ShapeDtypeStruct((B, M, h), dt)]
    msg_spec = [pl.BlockSpec((None, TILE_E, h), lambda b, v: (b, v, 0),
                             memory_space=pltpu.VMEM)]
    if not with_messages:
        msg_shape, msg_spec = [], []
    outs = pl.pallas_call(
        functools.partial(_tail_sum_kernel, K, with_messages),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, TILE_E, h), lambda b, v: (b, v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, h), lambda b, v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TILE_V, h), lambda b, v: (b, v, 0),
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
        out_shape=tuple(
            msg_shape + [jax.ShapeDtypeStruct((B, n_virt, h), dt)]
        ),
        interpret=interpret,
    )(gathered, ew, rec_rows, w2, b2.reshape(1, h), ln_scale.reshape(1, h),
      ln_bias.reshape(1, h), mask)
    if with_messages:
        return outs[0], outs[1]
    return None, outs[0]


def _edge_tail_sum_fwd(gathered, ew, rec_rows, w2, b2, ln_scale, ln_bias,
                       mask, K, interpret, with_messages):
    out = _edge_tail_sum_impl(gathered, ew, rec_rows, w2, b2, ln_scale,
                              ln_bias, mask, K, interpret, with_messages)
    return out, (gathered, ew, rec_rows, w2, b2, ln_scale, ln_bias, mask)


def _edge_tail_sum_bwd(K, interpret, with_messages, res, grads):
    gathered, ew, rec_rows, w2, b2, ln_scale, ln_bias, mask = res
    g_msg, g_virt = grads
    if g_msg is None or not with_messages:
        g_msg = jnp.zeros(gathered.shape, gathered.dtype)

    def fwd(gathered, ew, rec_rows, w2, b2, ln_scale, ln_bias, mask):
        return _sum_reference(gathered, ew, rec_rows, w2, b2, ln_scale,
                              ln_bias, mask, K)

    _, vjp = jax.vjp(fwd, gathered, ew, rec_rows, w2, b2, ln_scale, ln_bias,
                     mask)
    return vjp((g_msg, g_virt))


edge_tail_sum.defvjp(_edge_tail_sum_fwd, _edge_tail_sum_bwd)


def _layer_kernel(K, in_gather, edge_ref, *refs):
    """Full interaction-layer edge pass.

    refs layout: [senders?, send_t?, gathered?, rec_ref, we_ref, b0_ref,
                  w2_ref, b2_ref, ls_ref, lb_ref, mask_ref,
                  edge_out_ref, virt_ref, (+ scratch when in_gather)]
    With in_gather the sender rows are fetched from the VMEM-resident
    send_t inside the kernel; otherwise a pre-gathered tile is streamed.
    """
    if in_gather:
        (senders_ref, send_t_ref, rec_ref, we_ref, b0_ref, w2_ref, b2_ref,
         ls_ref, lb_ref, mask_ref, edge_out_ref, virt_ref, g_scratch) = refs
    else:
        (gathered_ref, rec_ref, we_ref, b0_ref, w2_ref, b2_ref,
         ls_ref, lb_ref, mask_ref, edge_out_ref, virt_ref) = refs

    e = edge_ref[...].astype(jnp.float32)  # (TILE_E, h)
    tile_e, h = e.shape
    ew = jnp.dot(e, we_ref[...], preferred_element_type=jnp.float32)

    if in_gather:
        def body(t, _):
            idx = senders_ref[t]
            g_scratch[t, :] = send_t_ref[idx, :]
            return 0

        jax.lax.fori_loop(0, tile_e, body, 0)
        gathered = g_scratch[...].astype(jnp.float32)
    else:
        gathered = gathered_ref[...].astype(jnp.float32)

    dt = edge_ref.dtype
    rec = rec_ref[...].astype(jnp.float32)  # (TILE_V, h)
    tile_v = rec.shape[0]
    rec_rep = jnp.broadcast_to(rec[:, None, :], (tile_v, K, h)).reshape(
        tile_e, h
    )
    x = jax.nn.silu(ew + gathered + rec_rep + b0_ref[...])
    x = (
        jnp.dot(x, w2_ref[...], preferred_element_type=jnp.float32)
        + b2_ref[...]
    )
    msg = _ln_cast(x, ls_ref[...], lb_ref[...], jnp.float32)
    edge_out_ref[...] = (e + msg).astype(dt)
    masked = msg * mask_ref[...]
    virt_ref[...] = masked.reshape(tile_e // K, K, h).sum(axis=1).astype(dt)


def _layer_reference(edge_rep, gathered, rec_rows, w_e, b0, w2, b2,
                     ln_scale, ln_bias, mask, K):
    ew = jnp.dot(edge_rep, w_e, preferred_element_type=jnp.float32)
    x0 = ew + gathered + jnp.repeat(rec_rows, K, axis=-2) + b0
    msg, virt = _tail_reference(x0, w2, b2, ln_scale, ln_bias, mask, K)
    return edge_rep + msg, virt


def edge_layer(edge_rep, gathered_or_senders, send_t, rec_rows, mask,
               w_e, b0, w2, b2, ln_scale, ln_bias, K: int,
               in_gather: bool = False, interpret: bool = False):
    """Fused residual edge update for update_edges=True interaction nets.

    edge_rep (B, M, h) evolving edge state; either `gathered` (B, M, h)
    pre-gathered sender rows (in_gather=False, pass as gathered_or_senders)
    or `senders` (M,) + VMEM-resident send_t (B, N_send, h)
    (in_gather=True). Returns (edge_out = edge_rep + messages, virt).
    """
    return _edge_layer_vjp(edge_rep, gathered_or_senders, send_t, rec_rows,
                           mask, w_e, b0, w2, b2, ln_scale, ln_bias,
                           K, in_gather, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _edge_layer_vjp(edge_rep, gathered_or_senders, send_t, rec_rows, mask,
                    w_e, b0, w2, b2, ln_scale, ln_bias, K, in_gather,
                    interpret):
    return _edge_layer_impl(edge_rep, gathered_or_senders, send_t, rec_rows,
                            mask, w_e, b0, w2, b2, ln_scale, ln_bias, K,
                            in_gather, interpret)


def _edge_layer_impl(edge_rep, gathered_or_senders, send_t, rec_rows, mask,
                     w_e, b0, w2, b2, ln_scale, ln_bias, K, in_gather,
                     interpret):
    B, M, h = edge_rep.shape
    n_virt = M // K
    TILE_V = _pick_tile_v_batched(n_virt, K)
    fallback = TILE_V < 64
    if fallback:
        gathered = (
            jnp.take(send_t, gathered_or_senders, axis=-2)
            if in_gather else gathered_or_senders
        )
        return _layer_reference(edge_rep, gathered, rec_rows, w_e, b0, w2,
                                b2, ln_scale, ln_bias, mask, K)
    TILE_E = TILE_V * K
    grid = (B, n_virt // TILE_V)

    common_specs = [
        pl.BlockSpec((None, TILE_V, h), lambda b, v: (b, v, 0),
                     memory_space=pltpu.VMEM),  # rec_rows
        pl.BlockSpec((h, h), lambda b, v: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda b, v: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, h), lambda b, v: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda b, v: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda b, v: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda b, v: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_E, 1), lambda b, v: (v, 0),
                     memory_space=pltpu.VMEM),  # mask
    ]
    out_specs = (
        pl.BlockSpec((None, TILE_E, h), lambda b, v: (b, v, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, TILE_V, h), lambda b, v: (b, v, 0),
                     memory_space=pltpu.VMEM),
    )
    dt = edge_rep.dtype
    out_shape = (
        jax.ShapeDtypeStruct((B, M, h), dt),
        jax.ShapeDtypeStruct((B, n_virt, h), dt),
    )
    scalars = (b0.reshape(1, h), w2, b2.reshape(1, h),
               ln_scale.reshape(1, h), ln_bias.reshape(1, h), mask)
    if in_gather:
        edge_out, virt = pl.pallas_call(
            functools.partial(_layer_kernel, K, True),
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, TILE_E, h), lambda b, v: (b, v, 0),
                             memory_space=pltpu.VMEM),  # edge_rep
                pl.BlockSpec((TILE_E,), lambda b, v: (v,),
                             memory_space=pltpu.SMEM),  # senders
                pl.BlockSpec((None,) + send_t.shape[1:],
                             lambda b, v: (b, 0, 0),
                             memory_space=pltpu.VMEM),  # send_t resident
            ] + common_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((TILE_E, h), jnp.float32)],
            interpret=interpret,
        )(edge_rep, gathered_or_senders, send_t, rec_rows, w_e, *scalars)
    else:
        edge_out, virt = pl.pallas_call(
            functools.partial(_layer_kernel, K, False),
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, TILE_E, h), lambda b, v: (b, v, 0),
                             memory_space=pltpu.VMEM),  # edge_rep
                pl.BlockSpec((None, TILE_E, h), lambda b, v: (b, v, 0),
                             memory_space=pltpu.VMEM),  # gathered
            ] + common_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(edge_rep, gathered_or_senders, rec_rows, w_e, *scalars)
    return edge_out, virt


def _edge_layer_fwd(edge_rep, gathered_or_senders, send_t, rec_rows, mask,
                    w_e, b0, w2, b2, ln_scale, ln_bias, K, in_gather,
                    interpret):
    out = _edge_layer_impl(edge_rep, gathered_or_senders, send_t, rec_rows,
                           mask, w_e, b0, w2, b2, ln_scale, ln_bias, K,
                           in_gather, interpret)
    return out, (edge_rep, gathered_or_senders, send_t, rec_rows, mask,
                 w_e, b0, w2, b2, ln_scale, ln_bias)


def _edge_layer_bwd(K, in_gather, interpret, res, grads):
    (edge_rep, gathered_or_senders, send_t, rec_rows, mask,
     w_e, b0, w2, b2, ln_scale, ln_bias) = res
    g_edge, g_virt = grads

    if in_gather:
        def fwd(edge_rep, send_t, rec_rows, w_e, b0, w2, b2, ln_scale,
                ln_bias, mask):
            gathered = jnp.take(send_t, gathered_or_senders, axis=-2)
            return _layer_reference(edge_rep, gathered, rec_rows, w_e, b0,
                                    w2, b2, ln_scale, ln_bias, mask, K)

        _, vjp = jax.vjp(fwd, edge_rep, send_t, rec_rows, w_e, b0, w2, b2,
                         ln_scale, ln_bias, mask)
        (d_edge, d_send_t, d_rec, d_we, d_b0, d_w2, d_b2, d_ls, d_lb,
         d_mask) = vjp((g_edge, g_virt))
        return (d_edge, None, d_send_t, d_rec, d_mask, d_we, d_b0, d_w2,
                d_b2, d_ls, d_lb)

    def fwd(edge_rep, gathered, rec_rows, w_e, b0, w2, b2, ln_scale,
            ln_bias, mask):
        return _layer_reference(edge_rep, gathered, rec_rows, w_e, b0, w2,
                                b2, ln_scale, ln_bias, mask, K)

    _, vjp = jax.vjp(fwd, edge_rep, gathered_or_senders, rec_rows, w_e, b0,
                     w2, b2, ln_scale, ln_bias, mask)
    (d_edge, d_gathered, d_rec, d_we, d_b0, d_w2, d_b2, d_ls, d_lb,
     d_mask) = vjp((g_edge, g_virt))
    return (d_edge, d_gathered, None, d_rec, d_mask, d_we, d_b0, d_w2,
            d_b2, d_ls, d_lb)


_edge_layer_vjp.defvjp(_edge_layer_fwd, _edge_layer_bwd)
