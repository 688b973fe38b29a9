"""Fused flat-lane grid-feature embedder: MLP(concat(parts)) + LayerNorm.

The grid embedder (ref: neural_lam/models/base_graph_model.py:141-149,
utils.py:191-214) maps per-node features (prev state, prev-prev state,
forcing window, static) through a 2-layer MLP with a final LayerNorm.
The XLA lowering of `apply_mlp_concat_flat` runs the first layer as
per-part convolutions in a transposed f32[h, B, N] layout and its
BACKWARD re-materializes several (N, B*h) intermediates — measured
~0.4 ms fwd / ~0.9 ms bwd of the bf16 train step at MEPS bench scale
(probes/trace_bf16_train.py), 3-8x the byte floors.

Here the caller packs the concatenated features into the flat-lane
layout once ((N, B*d_pad), one XLA transpose) and a single kernel pass
computes

    out = groupLN(W1 @ silu(W0 @ x + b0) + b1)

per (TILE_N, B*d_pad) tile, with the same conventions as the other flat
kernels (ops/pallas_edge_flat.py): batch in lanes, per-group matmuls
against the kron-widened weights, LN mean-centering folded into W1
(`_center_cols`), fp32 compute, analytic backward with per-group
parameter-gradient accumulators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_edge_flat import (
    _acc_cols,
    _bdot,
    _center_cols,
    _compiler_params,
    _dotT,
    _group_ln_cent_bwd,
    _group_ln_cent_f32,
    _group_ln_cent_parts,
    _group_row_sum,
    _pick_tile_v,
    _silu_grad,
    _uncenter_wgrad,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def embed_consts(w0, b0, w1, b1, ln_scale, ln_bias, B: int, d_pad: int):
    """Widened embed params. w0 (d_in, h) is zero-row-padded to d_pad and
    kron-widened to (B*d_pad, B*h); w1k/b1w are LN-centered."""
    d_in, h = w0.shape
    f32 = jnp.float32
    w0p = jnp.pad(w0.astype(f32), ((0, d_pad - d_in), (0, 0)))
    eye = jnp.eye(B, dtype=f32)
    w0k = jnp.kron(eye, w0p)  # (B*d_pad, B*h)
    b0w = jnp.tile(b0.astype(f32).reshape(1, h), (1, B))
    ones_k = jnp.kron(eye, jnp.full((h, h), 1.0 / h, f32))
    w1k = _center_cols(jnp.kron(eye, w1.astype(f32)), ones_k)
    b1w = _center_cols(jnp.tile(b1.astype(f32).reshape(1, h), (1, B)),
                       ones_k)
    lsw = jnp.tile(ln_scale.astype(f32).reshape(1, h), (1, B))
    lbw = jnp.tile(ln_bias.astype(f32).reshape(1, h), (1, B))
    return w0k, b0w, w1k, b1w, lsw, lbw, ones_k


def _gdot_rect(x, wk_ref, d_pad, h):
    """x (rows, B*d_pad) @ kron(I_B, (d_pad, h)) per batch group —
    B matmuls of (rows, d_pad) @ (d_pad, h) against the top-left block
    (all diagonal blocks equal)."""
    W_in = x.shape[-1]
    B = W_in // d_pad
    blk = wk_ref[0:d_pad, 0:h]
    return jnp.concatenate(
        [jnp.dot(x[:, g * d_pad:(g + 1) * d_pad], blk,
                 preferred_element_type=jnp.float32)
         for g in range(B)], axis=1,
    )


def _gdot_rect_T(x, wkT_ref, d_pad, h):
    """x (rows, B*h) @ kron(I_B, (h, d_pad)) per batch group (the
    transposed map of `_gdot_rect`)."""
    W_in = x.shape[-1]
    B = W_in // h
    blk = wkT_ref[0:h, 0:d_pad]
    return jnp.concatenate(
        [jnp.dot(x[:, g * h:(g + 1) * h], blk,
                 preferred_element_type=jnp.float32)
         for g in range(B)], axis=1,
    )


def _embed_fwd_kernel(B, d_pad, x_ref, w0k_ref, b0w_ref, w1k_ref, b1w_ref,
                      lsw_ref, lbw_ref, onesk_ref, out_ref):
    f32 = jnp.float32
    h = onesk_ref.shape[-1] // B
    x = x_ref[...].astype(f32)
    t = jax.nn.silu(_gdot_rect(x, w0k_ref, d_pad, h) + b0w_ref[...])
    y = _bdot(t, w1k_ref, h) + b1w_ref[...]  # centered: y is the LN cent
    out = _group_ln_cent_f32(y, onesk_ref[...], lsw_ref[...], lbw_ref[...],
                             h)
    out_ref[...] = out.astype(out_ref.dtype)


def _embed_bwd_kernel(B, d_pad, x_ref, dout_ref, w0k_ref, b0w_ref, w1k_ref,
                      b1w_ref, lsw_ref, onesk_ref, w0kT_ref, w1kT_ref,
                      dx_ref, bias_acc_ref, w0acc_ref, w1acc_ref):
    f32 = jnp.float32
    ones = onesk_ref[...]
    h = ones.shape[-1] // B
    x = x_ref[...].astype(f32)
    # forward recompute
    t0 = _gdot_rect(x, w0k_ref, d_pad, h) + b0w_ref[...]
    t = jax.nn.silu(t0)
    y = _bdot(t, w1k_ref, h) + b1w_ref[...]
    chat, inv = _group_ln_cent_parts(y, ones, h)
    # backward
    d_ln = dout_ref[...].astype(f32)
    bias_ls = (d_ln * chat).sum(axis=0, keepdims=True)
    bias_lb = d_ln.sum(axis=0, keepdims=True)
    d_y = _group_ln_cent_bwd(d_ln * lsw_ref[...], chat, inv, ones, h)
    d_t = _bdot(d_y, w1kT_ref, h)
    from .pallas_edge_flat import _accT

    w1_acc = _accT(t, d_y, h)
    bias_b1 = d_y.sum(axis=0, keepdims=True)
    d_t0 = d_t * _silu_grad(t0)
    bias_b0 = d_t0.sum(axis=0, keepdims=True)
    # w0 acc: per-batch-group (d_pad, h) blocks summed
    w0_acc = None
    for g in range(B):
        p = _dotT(x[:, g * d_pad:(g + 1) * d_pad],
                  d_t0[:, g * h:(g + 1) * h])
        w0_acc = p if w0_acc is None else w0_acc + p
    dx_ref[...] = _gdot_rect_T(d_t0, w0kT_ref, d_pad, h).astype(
        dx_ref.dtype)
    W_out = bias_acc_ref.shape[-1]

    def wrow(r):
        return jnp.pad(r, ((0, 0), (0, W_out - r.shape[-1])))

    pad_rows = bias_acc_ref.shape[0] - 4
    bias_tile = jnp.concatenate(
        [wrow(bias_b0), wrow(bias_b1), wrow(bias_ls), wrow(bias_lb),
         jnp.zeros((pad_rows, W_out), f32)], axis=0,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        bias_acc_ref[...] = bias_tile
        w0acc_ref[...] = w0_acc
        w1acc_ref[...] = w1_acc

    @pl.when(pl.program_id(0) != 0)
    def _accum():
        bias_acc_ref[...] += bias_tile
        w0acc_ref[...] += w0_acc
        w1acc_ref[...] += w1_acc


def _embed_reference(x_f, w0p, b0, w1, b1, ls, lb, B, d_pad):
    """Plain-XLA flat reference (fallback / tests / VJP fallback)."""
    f32 = jnp.float32
    N = x_f.shape[0]
    h = w1.shape[0]
    xs = x_f.reshape(N, B, d_pad).astype(f32)
    t = jax.nn.silu(
        jnp.einsum("nbd,dk->nbk", xs, w0p.astype(f32),
                   preferred_element_type=f32) + b0.astype(f32)
    )
    y = jnp.einsum("nbk,kj->nbj", t, w1.astype(f32),
                   preferred_element_type=f32) + b1.astype(f32)
    mean = y.mean(axis=-1, keepdims=True)
    var = ((y - mean) ** 2).mean(axis=-1, keepdims=True)
    from .mlp import LN_EPS

    out = (y - mean) * jax.lax.rsqrt(var + LN_EPS) \
        * ls.astype(f32).reshape(1, 1, h) + lb.astype(f32).reshape(1, 1, h)
    return out.reshape(N, B * h)


def embed_applicable(params: dict, B: int, h: int) -> bool:
    """2-layer MLP + LN, lane-aligned output — the reference default."""
    layers = params["layers"]
    return (
        len(layers) == 2 and params["ln"] is not None
        and layers[1]["w"].shape == (h, h)
        and (B * h) % 128 == 0
    )


def embed_grid_flat(x_f, params: dict, B: int, d_pad: int,
                    interpret: bool = False, consts=None,
                    out_dtype=None):
    """Fused flat grid embedder (see module docstring).

    x_f: (N, B*d_pad) flat-lane packed concatenated features (zero-padded
    to d_pad per group; pad lanes contribute nothing — w0's pad rows are
    zero). Returns (N, B*h). consts: optional scan-hoisted
    `embed_consts(...)` tuple."""
    return _embed_vjp(x_f, params["layers"][0]["w"],
                      params["layers"][0]["b"], params["layers"][1]["w"],
                      params["layers"][1]["b"], params["ln"]["scale"],
                      params["ln"]["bias"], consts, B, d_pad, interpret,
                      out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _embed_vjp(x_f, w0, b0, w1, b1, ls, lb, consts, B, d_pad, interpret,
               out_dtype):
    return _embed_impl(x_f, w0, b0, w1, b1, ls, lb, consts, B, d_pad,
                       interpret, out_dtype)


def _consts_of(w0, b0, w1, b1, ls, lb, consts, B, d_pad):
    if consts is not None and consts[0].shape[0] == B * d_pad:
        return consts
    return embed_consts(w0, b0, w1, b1, ls, lb, B, d_pad)


def _embed_impl(x_f, w0, b0, w1, b1, ls, lb, consts, B, d_pad, interpret,
                out_dtype):
    N, W_in = x_f.shape
    h = w1.shape[0]
    W = B * h
    dt = out_dtype or x_f.dtype
    TILE = _pick_tile_v(N, 1)
    if N % TILE or TILE < 8 or W_in != B * d_pad:
        w0p = jnp.pad(w0.astype(jnp.float32),
                      ((0, d_pad - w0.shape[0]), (0, 0)))
        return _embed_reference(x_f, w0p, b0, w1, b1, ls, lb, B,
                                d_pad).astype(dt)
    w0k, b0w, w1k, b1w, lsw, lbw, ones_k = _consts_of(
        w0, b0, w1, b1, ls, lb, consts, B, d_pad)
    cw = lambda shape: pl.BlockSpec(shape, lambda v: (0, 0),
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_embed_fwd_kernel, B, d_pad),
        grid=(N // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, W_in), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            cw(w0k.shape), cw((1, W)), cw((W, W)), cw((1, W)), cw((1, W)),
            cw((1, W)), cw((W, W)),
        ],
        out_specs=pl.BlockSpec((TILE, W), lambda v: (v, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, W), dt),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(x_f, w0k, b0w, w1k, b1w, lsw, lbw, ones_k)
    return out


def _embed_fwd(x_f, w0, b0, w1, b1, ls, lb, consts, B, d_pad, interpret,
               out_dtype):
    out = _embed_impl(x_f, w0, b0, w1, b1, ls, lb, consts, B, d_pad,
                      interpret, out_dtype)
    return out, (x_f, w0, b0, w1, b1, ls, lb, consts)


def _embed_bwd(B, d_pad, interpret, out_dtype, res, d_out):
    x_f, w0, b0, w1, b1, ls, lb, consts = res
    N, W_in = x_f.shape
    h = w1.shape[0]
    W = B * h
    d_in = w0.shape[0]
    TILE = _pick_tile_v(N, 1)

    def _d_consts():
        if consts is None:
            return None
        return tuple(jnp.zeros_like(c) for c in consts)

    import os

    if (N % TILE or TILE < 8 or W_in != B * d_pad
            or os.environ.get("NLT_NO_BWD_KERNEL")):
        w0p_z = jnp.pad(w0.astype(jnp.float32),
                        ((0, d_pad - d_in), (0, 0)))

        def ref(x_f, w0p, b0, w1, b1, ls, lb):
            return _embed_reference(x_f, w0p, b0, w1, b1, ls, lb, B,
                                    d_pad).astype(
                                        out_dtype or x_f.dtype)

        _, vjp = jax.vjp(ref, x_f, w0p_z, b0, w1, b1, ls, lb)
        d_x, d_w0p, d_b0, d_w1, d_b1, d_ls, d_lb = vjp(d_out)
        return (d_x, d_w0p[:d_in].astype(w0.dtype), d_b0, d_w1, d_b1,
                d_ls, d_lb, _d_consts())

    w0k, b0w, w1k, b1w, lsw, lbw, ones_k = _consts_of(
        w0, b0, w1, b1, ls, lb, consts, B, d_pad)
    AC = _acc_cols(W, h)
    n_bias_rows = 8
    cw = lambda shape: pl.BlockSpec(shape, lambda v: (0, 0),
                                    memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_embed_bwd_kernel, B, d_pad),
        grid=(N // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, W_in), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            cw(w0k.shape), cw((1, W)), cw((W, W)), cw((1, W)), cw((1, W)),
            cw((W, W)), cw((w0k.shape[1], w0k.shape[0])), cw((W, W)),
        ],
        out_specs=(
            pl.BlockSpec((TILE, W_in), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            cw((n_bias_rows, max(W, W_in))),
            cw((d_pad, h)), cw((AC, AC)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, W_in), x_f.dtype),
            jax.ShapeDtypeStruct((n_bias_rows, max(W, W_in)), jnp.float32),
            jax.ShapeDtypeStruct((d_pad, h), jnp.float32),
            jax.ShapeDtypeStruct((AC, AC), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(x_f, d_out, w0k, b0w, w1k, b1w, lsw, ones_k, w0k.T, w1k.T)
    d_x, bias_acc, w0_acc, w1_acc = outs
    from .pallas_edge_flat import _block_diag_sum

    d_w0 = w0_acc[:d_in].astype(w0.dtype)
    d_b0 = _group_row_sum(bias_acc[0][None, :W], B, h).astype(b0.dtype)
    d_w1 = _uncenter_wgrad(
        _block_diag_sum(w1_acc, B, h, h)
    ).astype(w1.dtype)
    d_b1 = _uncenter_wgrad(
        _group_row_sum(bias_acc[1][None, :W], B, h)
    ).astype(b1.dtype)
    d_ls = _group_row_sum(bias_acc[2][None, :W], B, h).astype(ls.dtype)
    d_lb = _group_row_sum(bias_acc[3][None, :W], B, h).astype(lb.dtype)
    return (d_x, d_w0, d_b0, d_w1, d_b1, d_ls, d_lb, _d_consts())


_embed_vjp.defvjp(_embed_fwd, _embed_bwd)
