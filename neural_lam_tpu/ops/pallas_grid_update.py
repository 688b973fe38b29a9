"""Fused flat-lane grid-update kernel: the whole m2g decoder stage.

At the MEPS bench scale the m2g stage dominates the predict step
(~3.8 of ~10 ms fp32) and is HBM-bandwidth-bound: the unfused chain
(receiver transform -> edge tail kernel -> virt fold -> aggregation MLP
-> residual -> output MLP) makes five-plus full passes over ~65 MB grid
arrays. Probing (probes/ln_stats.py) shows the flat tail kernel's DMA
floor runs at ~560 GB/s and its matmuls hide behind DMA, so the win is
fusing ALL per-grid-node work into one kernel pass:

    grid_rep = ge + EncMLP(ge)                      (encoding_grid_mlp)
    rec      = grid_rep @ W_i                       (edge-MLP rec term)
    x        = silu(gathered + ew + rec[repeat K])  (edge MLP layer 0)
    msg      = groupLN(x @ W2 + b2)
    agg      = masked K-slot sum                    (virt_identity fold)
    rec_out  = grid_rep + AggrMLP(grid_rep, agg)
    out      = OutMLP(rec_out)                      (no LN)

per (TILE_V, W=B*h) tile, reading gathered/ew/grid_emb once and writing
only the (N, B*d_out) net output. Only valid for `virt_identity` dense
edge sets (every receiver owns exactly one virtual row — true for m2g's
exact 4-NN construction, ref: neural_lam/create_graph.py:500-529) and
2-layer MLPs (the reference default, hidden_layers=1,
ref: neural_lam/train_model.py:87-104).

Layout/precision conventions follow ops/pallas_edge_flat.py: batch packed
into lanes, h x h weights entering as kron(I_B, W), LayerNorm statistics
via matmuls against kron(I_B, 11^T/h), fp32 compute regardless of I/O
dtype. The custom VJP recomputes through the plain-XLA reference
(`_grid_update_reference`), like the other flat kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import LN_EPS
from .pallas_edge_flat import (
    _compiler_params,
    _group_ln_f32,
    _lane_tile,
    _pick_tile_v,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kron_b(w, B):
    return jnp.kron(jnp.eye(B, dtype=jnp.float32), w.astype(jnp.float32))


def _tile_b(v, B):
    return jnp.tile(v.astype(jnp.float32).reshape(1, -1), (1, B))


def _prep_consts(pp: dict, B: int):
    """Widen raw per-feature params to the flat-lane layout."""
    h = pp["w2"].shape[0]
    d_out = pp["o_w1"].shape[1]
    w_out = _round_up(B * d_out, 128)
    o_w1k = _kron_b(pp["o_w1"], B)  # (W, B*d_out)
    o_b1w = _tile_b(pp["o_b1"], B)
    pad = w_out - B * d_out
    if pad:
        o_w1k = jnp.pad(o_w1k, ((0, 0), (0, pad)))
        o_b1w = jnp.pad(o_b1w, ((0, 0), (0, pad)))
    return {
        "w_ik": _kron_b(pp["w_i"], B),
        "enc_w0k": _kron_b(pp["enc_w0"], B),
        "enc_b0w": _tile_b(pp["enc_b0"], B),
        "enc_w1k": _kron_b(pp["enc_w1"], B),
        "enc_b1w": _tile_b(pp["enc_b1"], B),
        "enc_lsw": _tile_b(pp["enc_ls"], B),
        "enc_lbw": _tile_b(pp["enc_lb"], B),
        "w2k": _kron_b(pp["w2"], B),
        "b2w": _tile_b(pp["b2"], B),
        "e_lsw": _tile_b(pp["e_ls"], B),
        "e_lbw": _tile_b(pp["e_lb"], B),
        "a_wrk": _kron_b(pp["a_w0"][:h], B),
        "a_wak": _kron_b(pp["a_w0"][h:], B),
        "a_b0w": _tile_b(pp["a_b0"], B),
        "a_w1k": _kron_b(pp["a_w1"], B),
        "a_b1w": _tile_b(pp["a_b1"], B),
        "a_lsw": _tile_b(pp["a_ls"], B),
        "a_lbw": _tile_b(pp["a_lb"], B),
        "o_w0k": _kron_b(pp["o_w0"], B),
        "o_b0w": _tile_b(pp["o_b0"], B),
        "o_w1k": o_w1k,
        "o_b1w": o_b1w,
        "ones_k": jnp.kron(jnp.eye(B, dtype=jnp.float32),
                           jnp.full((h, h), 1.0 / h, jnp.float32)),
    }


_CONST_NAMES = (
    "w_ik", "enc_w0k", "enc_b0w", "enc_w1k", "enc_b1w", "enc_lsw",
    "enc_lbw", "w2k", "b2w", "e_lsw", "e_lbw", "a_wrk", "a_wak", "a_b0w",
    "a_b1w", "a_w1k", "a_lsw", "a_lbw", "o_w0k", "o_b0w", "o_w1k", "o_b1w",
    "ones_k",
)


def _grid_update_kernel(K, B, g_ref, ew_ref, ge_ref, mask_ref, w_ik, enc_w0k,
                        enc_b0w, enc_w1k, enc_b1w, enc_lsw, enc_lbw, w2k,
                        b2w, e_lsw, e_lbw, a_wrk, a_wak, a_b0w, a_b1w, a_w1k,
                        a_lsw, a_lbw, o_w0k, o_b0w, o_w1k, o_b1w, ones_k,
                        out_ref):
    f32 = jnp.float32
    ones = ones_k[...]
    ge = ge_ref[...].astype(f32)  # (TILE_V, W)
    tile_v, W = ge.shape
    # encoding grid MLP (residual)
    t = jax.nn.silu(jnp.dot(ge, enc_w0k[...], preferred_element_type=f32)
                    + enc_b0w[...])
    t = jnp.dot(t, enc_w1k[...], preferred_element_type=f32) + enc_b1w[...]
    gr = ge + _group_ln_f32(t, ones, enc_lsw[...], enc_lbw[...])
    # edge MLP (first-layer bias lives in ew)
    rec = jnp.dot(gr, w_ik[...], preferred_element_type=f32)
    rec_rep = jnp.broadcast_to(rec[:, None, :], (tile_v, K, W)).reshape(
        tile_v * K, W
    )
    ew_w = _lane_tile(ew_ref[...].astype(f32), B)
    x = jax.nn.silu(g_ref[...].astype(f32) + ew_w + rec_rep)
    x = jnp.dot(x, w2k[...], preferred_element_type=f32) + b2w[...]
    msg = _group_ln_f32(x, ones, e_lsw[...], e_lbw[...])
    agg = (msg.reshape(tile_v, K, W) * mask_ref[...][..., None]).sum(axis=1)
    # aggregation MLP (residual)
    u = jax.nn.silu(
        jnp.dot(gr, a_wrk[...], preferred_element_type=f32)
        + jnp.dot(agg, a_wak[...], preferred_element_type=f32)
        + a_b0w[...]
    )
    u = jnp.dot(u, a_w1k[...], preferred_element_type=f32) + a_b1w[...]
    rec_out = gr + _group_ln_f32(u, ones, a_lsw[...], a_lbw[...])
    # output map (no LN)
    y = jax.nn.silu(jnp.dot(rec_out, o_w0k[...], preferred_element_type=f32)
                    + o_b0w[...])
    out = jnp.dot(y, o_w1k[...], preferred_element_type=f32) + o_b1w[...]
    out_ref[...] = out.astype(out_ref.dtype)


def _grid_update_reference(gathered, ew, grid_emb_f, mask_p, pp, K, B):
    """Plain-XLA math (VJP recompute / fallback / tests). Returns the
    (N_virt, B*d_out) net output, unpadded lanes."""
    f32 = jnp.float32
    n_virt = mask_p.shape[0]
    M, W = gathered.shape
    h = ew.shape[-1]
    n_rows = grid_emb_f.shape[0]
    ge = grid_emb_f.astype(f32)
    if n_rows < n_virt:
        ge = jnp.pad(ge, ((0, n_virt - n_rows), (0, 0)))

    def mlp2(x, w0, b0, w1, b1):
        t = jax.nn.silu(
            jnp.dot(x, _kron_b(w0, B), preferred_element_type=f32)
            + _tile_b(b0, B)
        )
        return jnp.dot(t, _kron_b(w1, B), preferred_element_type=f32) \
            + _tile_b(b1, B)

    def gln(x, ls, lb):
        xs = x.reshape(-1, B, h)
        mean = jnp.mean(xs, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xs - mean), axis=-1, keepdims=True)
        y = (xs - mean) * jax.lax.rsqrt(var + LN_EPS) \
            * ls.astype(f32).reshape(1, 1, h) \
            + lb.astype(f32).reshape(1, 1, h)
        return y.reshape(x.shape)

    gr = ge + gln(mlp2(ge, pp["enc_w0"], pp["enc_b0"], pp["enc_w1"],
                       pp["enc_b1"]), pp["enc_ls"], pp["enc_lb"])
    rec = jnp.dot(gr, _kron_b(pp["w_i"], B), preferred_element_type=f32)
    x = jax.nn.silu(
        gathered.astype(f32)
        + jnp.tile(ew.astype(f32), (1, B))
        + jnp.repeat(rec, K, axis=0)
    )
    x = jnp.dot(x, _kron_b(pp["w2"], B), preferred_element_type=f32) \
        + _tile_b(pp["b2"], B)
    msg = gln(x, pp["e_ls"], pp["e_lb"])
    agg = (msg.reshape(n_virt, K, W) * mask_p[..., None]).sum(axis=1)
    u = jax.nn.silu(
        jnp.dot(gr, _kron_b(pp["a_w0"][:h], B), preferred_element_type=f32)
        + jnp.dot(agg, _kron_b(pp["a_w0"][h:], B),
                  preferred_element_type=f32)
        + _tile_b(pp["a_b0"], B)
    )
    u = jnp.dot(u, _kron_b(pp["a_w1"], B), preferred_element_type=f32) \
        + _tile_b(pp["a_b1"], B)
    rec_out = gr + gln(u, pp["a_ls"], pp["a_lb"])
    y = jax.nn.silu(jnp.dot(rec_out, _kron_b(pp["o_w0"], B),
                            preferred_element_type=f32)
                    + _tile_b(pp["o_b0"], B))
    out = jnp.dot(y, _kron_b(pp["o_w1"], B), preferred_element_type=f32) \
        + _tile_b(pp["o_b1"], B)
    return out.astype(gathered.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def grid_update_flat(gathered, ew, grid_emb_f, mask_p, pp, K: int,
                     interpret: bool = False):
    """Fused m2g decoder stage (see module docstring).

    gathered: (M, W) sender transforms per edge (W = B*h).
    ew: (M, h) static edge product e@We + b0.
    grid_emb_f: (N_rows, W) flat grid embeddings; N_rows <= N_virt = M//K
    (trailing virtual rows are padding with mask 0 — their outputs are
    garbage and must be sliced off by the caller).
    mask_p: (N_virt, K); pp: raw parameter dict (see `_prep_consts`).
    Returns (N_virt, B*d_out) net output (lane padding removed).
    """
    return _grid_update_impl(gathered, ew, grid_emb_f, mask_p, pp, K,
                             interpret)


def _grid_update_impl(gathered, ew, grid_emb_f, mask_p, pp, K, interpret):
    M, W = gathered.shape
    h = ew.shape[-1]
    B = W // h
    n_virt = M // K
    d_out = pp["o_w1"].shape[1]
    w_out = _round_up(B * d_out, 128)

    TILE_V = _pick_tile_v(n_virt, K)
    if n_virt % TILE_V or TILE_V < 8:
        return _grid_update_reference(gathered, ew, grid_emb_f, mask_p, pp,
                                      K, B)
    consts = _prep_consts(pp, B)
    TILE_E = TILE_V * K
    dt = gathered.dtype
    full = lambda shape: pl.BlockSpec(shape, lambda v: (0, 0),
                                      memory_space=pltpu.VMEM)
    const_specs = []
    for name in _CONST_NAMES:
        const_specs.append(full(consts[name].shape))
    out = pl.pallas_call(
        functools.partial(_grid_update_kernel, K, B),
        grid=(n_virt // TILE_V,),
        in_specs=[
            pl.BlockSpec((TILE_E, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, h), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, K), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=pl.BlockSpec((TILE_V, w_out), lambda v: (v, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_virt, w_out), dt),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(gathered, ew, grid_emb_f, mask_p,
      *[consts[n] for n in _CONST_NAMES])
    if w_out != B * d_out:
        out = jax.lax.slice_in_dim(out, 0, B * d_out, axis=1)
    return out


def _grid_update_fwd(gathered, ew, grid_emb_f, mask_p, pp, K, interpret):
    out = _grid_update_impl(gathered, ew, grid_emb_f, mask_p, pp, K,
                            interpret)
    return out, (gathered, ew, grid_emb_f, mask_p, pp)


def _grid_update_bwd(K, interpret, res, g_out):
    gathered, ew, grid_emb_f, mask_p, pp = res
    B = gathered.shape[-1] // ew.shape[-1]

    def fwd(gathered, ew, grid_emb_f, mask_p, pp):
        return _grid_update_reference(gathered, ew, grid_emb_f, mask_p, pp,
                                      K, B)

    _, vjp = jax.vjp(fwd, gathered, ew, grid_emb_f, mask_p, pp)
    return vjp(g_out)


grid_update_flat.defvjp(_grid_update_fwd, _grid_update_bwd)


def pack_grid_update_params(params: dict) -> dict:
    """Collect the raw arrays the fused kernel needs from a BaseGraphModel
    parameter pytree (m2g_gnn + encoding_grid_mlp + output_map)."""
    m2g = params["m2g_gnn"]
    e0 = m2g["edge_mlp"]["layers"][0]["w"]
    h = e0.shape[0] // 3
    enc = params["encoding_grid_mlp"]
    aggr = m2g["aggr_mlp"]
    out = params["output_map"]
    return {
        "w_i": e0[2 * h:],
        "w2": m2g["edge_mlp"]["layers"][1]["w"],
        "b2": m2g["edge_mlp"]["layers"][1]["b"],
        "e_ls": m2g["edge_mlp"]["ln"]["scale"],
        "e_lb": m2g["edge_mlp"]["ln"]["bias"],
        "enc_w0": enc["layers"][0]["w"],
        "enc_b0": enc["layers"][0]["b"],
        "enc_w1": enc["layers"][1]["w"],
        "enc_b1": enc["layers"][1]["b"],
        "enc_ls": enc["ln"]["scale"],
        "enc_lb": enc["ln"]["bias"],
        "a_w0": aggr["layers"][0]["w"],
        "a_b0": aggr["layers"][0]["b"],
        "a_w1": aggr["layers"][1]["w"],
        "a_b1": aggr["layers"][1]["b"],
        "a_ls": aggr["ln"]["scale"],
        "a_lb": aggr["ln"]["bias"],
        "o_w0": out["layers"][0]["w"],
        "o_b0": out["layers"][0]["b"],
        "o_w1": out["layers"][1]["w"],
        "o_b1": out["layers"][1]["b"],
    }


def grid_update_applicable(model_params: dict, m2g_edges, batch_size: int,
                           h: int) -> bool:
    """Structural eligibility for the fused decoder: flat-eligible
    virt_identity m2g, 2-layer MLPs with the reference LN layout."""
    from .message_passing import flat_eligible

    if not (m2g_edges.virt_identity and flat_eligible(m2g_edges, batch_size,
                                                      h)):
        return False
    m2g = model_params["m2g_gnn"]

    def two_layer(mlp, ln):
        return len(mlp["layers"]) == 2 and (mlp["ln"] is not None) == ln

    return (
        two_layer(m2g["edge_mlp"], True)
        and two_layer(m2g["aggr_mlp"], True)
        and two_layer(model_params["encoding_grid_mlp"], True)
        and two_layer(model_params["output_map"], False)
    )
