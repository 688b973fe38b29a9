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
    _accT,
    _acc_cols,
    _bdot,
    _block_diag_sum,
    _center_cols,
    _compiler_params,
    _dotT,
    _group_ln_cent_bwd,
    _group_ln_cent_f32,
    _group_ln_cent_parts,
    _group_row_sum,
    _lane_tile,
    _pick_tile_v,
    _silu_grad,
    _uncenter_wgrad,
    _win_reconstruct,
    _win_transpose_ct,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kron_b(w, B):
    return jnp.kron(jnp.eye(B, dtype=jnp.float32), w.astype(jnp.float32))


def _tile_b(v, B):
    return jnp.tile(v.astype(jnp.float32).reshape(1, -1), (1, B))


def _prep_consts(pp: dict, B: int):
    """Widen raw per-feature params to the flat-lane layout.

    The three LN-feeding weights/biases (enc_w1k/enc_b1w, w2k/b2w,
    a_w1k/a_b1w) are CENTERED (`_center_cols`): each LN's
    mean-subtraction is folded into the preceding linear, so the kernels
    use the `_group_ln_cent_*` one-matmul variants; `_reduce_param_grads`
    applies the matching (I - 11^T/h) right-correction to their
    gradients."""
    h = pp["w2"].shape[0]
    d_out = pp["o_w1"].shape[1]
    w_out = _round_up(B * d_out, 128)
    o_w1k = _kron_b(pp["o_w1"], B)  # (W, B*d_out)
    o_b1w = _tile_b(pp["o_b1"], B)
    pad = w_out - B * d_out
    if pad:
        o_w1k = jnp.pad(o_w1k, ((0, 0), (0, pad)))
        o_b1w = jnp.pad(o_b1w, ((0, 0), (0, pad)))
    ones_k = jnp.kron(jnp.eye(B, dtype=jnp.float32),
                      jnp.full((h, h), 1.0 / h, jnp.float32))
    cc = lambda wk: _center_cols(wk, ones_k)
    return {
        "w_ik": _kron_b(pp["w_i"], B),
        "enc_w0k": _kron_b(pp["enc_w0"], B),
        "enc_b0w": _tile_b(pp["enc_b0"], B),
        "enc_w1k": cc(_kron_b(pp["enc_w1"], B)),
        "enc_b1w": cc(_tile_b(pp["enc_b1"], B)),
        "enc_lsw": _tile_b(pp["enc_ls"], B),
        "enc_lbw": _tile_b(pp["enc_lb"], B),
        "w2k": cc(_kron_b(pp["w2"], B)),
        "b2w": cc(_tile_b(pp["b2"], B)),
        "e_lsw": _tile_b(pp["e_ls"], B),
        "e_lbw": _tile_b(pp["e_lb"], B),
        "a_wrk": _kron_b(pp["a_w0"][:h], B),
        "a_wak": _kron_b(pp["a_w0"][h:], B),
        "a_b0w": _tile_b(pp["a_b0"], B),
        "a_w1k": cc(_kron_b(pp["a_w1"], B)),
        "a_b1w": cc(_tile_b(pp["a_b1"], B)),
        "a_lsw": _tile_b(pp["a_ls"], B),
        "a_lbw": _tile_b(pp["a_lb"], B),
        "o_w0k": _kron_b(pp["o_w0"], B),
        "o_b0w": _tile_b(pp["o_b0"], B),
        "o_w1k": o_w1k,
        "o_b1w": o_b1w,
        "ones_k": ones_k,
    }


_CONST_NAMES = (
    "w_ik", "enc_w0k", "enc_b0w", "enc_w1k", "enc_b1w", "enc_lsw",
    "enc_lbw", "w2k", "b2w", "e_lsw", "e_lbw", "a_wrk", "a_wak", "a_b0w",
    "a_b1w", "a_w1k", "a_lsw", "a_lbw", "o_w0k", "o_b0w", "o_w1k", "o_b1w",
    "ones_k",
)


def _grid_update_math(K, B, g, ew_ref, ge_ref, mask_ref, w_ik, enc_w0k,
                      enc_b0w, enc_w1k, enc_b1w, enc_lsw, enc_lbw, w2k,
                      b2w, e_lsw, e_lbw, a_wrk, a_wak, a_b0w, a_b1w, a_w1k,
                      a_lsw, a_lbw, o_w0k, o_b0w, o_w1k, o_b1w, ones_k,
                      out_ref):
    """Shared per-tile decoder math; `g` is the (TILE_E, W) f32 gathered
    sender-transform tile (from HBM or the in-kernel window gather)."""
    f32 = jnp.float32
    ones = ones_k[...]
    ge = ge_ref[...].astype(f32)  # (TILE_V, W)
    tile_v, W = ge.shape
    h = ew_ref.shape[-1]
    # encoding grid MLP (residual); enc_w1k/enc_b1w centered (LN fold);
    # square kron-widened consts multiply per 128-lane group (_bdot)
    t = jax.nn.silu(_bdot(ge, enc_w0k, h) + enc_b0w[...])
    t = _bdot(t, enc_w1k, h) + enc_b1w[...]
    gr = ge + _group_ln_cent_f32(t, ones, enc_lsw[...], enc_lbw[...], h)
    # edge MLP (first-layer bias lives in ew); w2k/b2w centered
    rec = _bdot(gr, w_ik, h)
    rec_rep = jnp.broadcast_to(rec[:, None, :], (tile_v, K, W)).reshape(
        tile_v * K, W
    )
    ew_w = _lane_tile(ew_ref[...].astype(f32), B)
    x = jax.nn.silu(g + ew_w + rec_rep)
    x = _bdot(x, w2k, h) + b2w[...]
    msg = _group_ln_cent_f32(x, ones, e_lsw[...], e_lbw[...], h)
    agg = (msg.reshape(tile_v, K, W) * mask_ref[...][..., None]).sum(axis=1)
    # aggregation MLP (residual); a_w1k/a_b1w centered
    u = jax.nn.silu(_bdot(gr, a_wrk, h) + _bdot(agg, a_wak, h) + a_b0w[...])
    u = _bdot(u, a_w1k, h) + a_b1w[...]
    rec_out = gr + _group_ln_cent_f32(u, ones, a_lsw[...], a_lbw[...], h)
    # output map (no LN; o_w1k is lane-padded non-square -> full dot)
    y = jax.nn.silu(_bdot(rec_out, o_w0k, h) + o_b0w[...])
    out = jnp.dot(y, o_w1k[...], preferred_element_type=f32) + o_b1w[...]
    out_ref[...] = out.astype(out_ref.dtype)


def _grid_update_kernel(K, B, g_ref, ew_ref, ge_ref, mask_ref, *args):
    _grid_update_math(K, B, g_ref[...].astype(jnp.float32), ew_ref, ge_ref,
                      mask_ref, *args)


def _grid_update_win_kernel(K, B, wrows, win_ref, sl_ref, ew_ref, ge_ref,
                            mask_ref, *args):
    """Decoder tile with the sender gather fused in-kernel.

    The XLA row gather feeding `grid_update_flat` materializes a
    (M, W) = (N_grid*K, B*h) HBM intermediate (~260 MB at MEPS bench
    scale) pulled from a table only (N_mesh, W) ~ 6.7 MB large. Because
    edges are receiver-sorted and m2g's 4-NN senders are spatially local
    (ref: neural_lam/create_graph.py:500-529), each TILE_V-receiver tile
    reads from a narrow contiguous *window* of table rows (measured 244
    of 6561 mesh rows at TILE_V=256). The caller gathers per-tile
    windows (one small XLA take) and this kernel reconstructs the tile's
    gathered rows with a one-hot (TILE_E, wrows) @ (wrows, W) MXU matmul
    (`_win_reconstruct`: exact single bf16 matmul for bf16 tables, a
    merge-proof bf16x2 split for f32) — HBM traffic for the gather drops
    ~4x and the matmul hides behind the tile DMA."""
    g, _ = _win_reconstruct(win_ref, sl_ref, wrows)
    _grid_update_math(K, B, g, ew_ref, ge_ref, mask_ref, *args)


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


def grid_update_flat(gathered, ew, grid_emb_f, mask_p, pp, K: int,
                     interpret: bool = False, consts=None):
    """Fused m2g decoder stage (see module docstring).

    gathered: (M, W) sender transforms per edge (W = B*h).
    ew: (M, h) static edge product e@We + b0.
    grid_emb_f: (N_rows, W) flat grid embeddings; N_rows <= N_virt = M//K
    (trailing virtual rows are padding with mask 0 — their outputs are
    garbage and must be sliced off by the caller).
    mask_p: (N_virt, K); pp: raw parameter dict (see `_prep_consts`).
    consts: optional precomputed `prep_grid_update_consts(pp, B)` dict —
    XLA's while-loop LICM declines to hoist these multi-buffer widened
    params out of rollout scans (probes/compose_gap.py: ~0.8 ms/step of
    re-widening), so scan callers should precompute them once outside
    (stop_gradient'd; gradients flow through the raw `pp`).
    Returns (N_virt, B*d_out) net output (lane padding removed).
    """
    if consts is not None and consts["w2k"].shape[0] != gathered.shape[-1]:
        consts = None  # batch mismatch (e.g. padded tail batch)
    return _grid_update_vjp(gathered, ew, grid_emb_f, mask_p, pp, consts,
                            K, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _grid_update_vjp(gathered, ew, grid_emb_f, mask_p, pp, consts, K: int,
                     interpret: bool):
    return _grid_update_impl(gathered, ew, grid_emb_f, mask_p, pp, K,
                             interpret, consts)


def _grid_update_impl(gathered, ew, grid_emb_f, mask_p, pp, K, interpret,
                      consts=None):
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
    if consts is None:
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


_MAX_K_FOLD = 64


def prep_window_gather(senders, mask, num_virt, K, num_send,
                       max_wrows=1024, target_rows=None):
    """Host-side window layout for the fused in-kernel sender gather.

    Returns (arrays, static) or None when the layout does not pay off:
    arrays = {"win_rows": (n_tiles*wrows,) int32 rows of the sender table
    to gather into per-tile windows, "sl_local": (num_virt*K, 1) int32
    window-local sender indices (0 for masked slots)}; static = {"wrows",
    "tile_v"} plus the graph identity ("num_virt", "dense_k", "num_send")
    the layout was built from, so callers can reject a swapped graph.
    Two layouts are tried in order (the window gather `jnp.take(table,
    win_rows)` accepts ARBITRARY rows, so contiguity is an optimization,
    not a requirement):

    1. contiguous spans — when every tile's senders fall in a narrow
       index range (the LAM lattice case: raster grid order and y-major
       mesh order correlate);
    2. per-tile UNIQUE sender sets — when spans blow up but each tile
       still touches few distinct senders (the global icosahedral case:
       subdivision-ordered mesh vertices are spatially uncorrelated with
       the lon-major lat-lon raster, and pole vertices are shared by
       every meridian, so no node reordering can make spans contiguous
       — but a tile of ~4 meridian columns still touches only ~300 of
       10k mesh senders).

    None when both layouts exceed `max_wrows` (the one-hot matmul would
    outgrow the gather it replaces) or the table itself is small enough
    that windows would not shrink traffic.
    """
    import numpy as np

    senders = np.asarray(senders).reshape(num_virt, K).astype(np.int64)
    real = np.asarray(mask).reshape(num_virt, K) > 0
    tile_v = _pick_tile_v(num_virt, K, target_rows)
    if num_virt % tile_v or tile_v < 8:
        return None
    n_tiles = num_virt // tile_v
    s_t = senders.reshape(n_tiles, tile_v * K)
    m_t = real.reshape(n_tiles, tile_v * K)
    any_real = m_t.any(axis=1)
    lo = np.where(m_t, s_t, np.iinfo(np.int64).max).min(axis=1)
    hi = np.where(m_t, s_t, -1).max(axis=1)
    lo = np.where(any_real, lo, 0)
    hi = np.where(any_real, hi, 0)
    span = int((hi - lo + 1).max())
    wrows = min(_round_up(span, 8), num_send)
    if wrows <= max_wrows and wrows < num_send:
        starts = np.clip(lo, 0, num_send - wrows)
        rows2d = starts[:, None] + np.arange(wrows)[None, :]
        slot_valid = np.ones((n_tiles, wrows), bool)
        sl_local = np.where(
            m_t, s_t - starts[:, None], 0
        ).reshape(num_virt * K, 1).astype(np.int32)
    else:
        # layout 2: per-tile unique sender sets. Built vectorized (one
        # np.unique over composite (tile, sender) keys instead of a
        # Python loop over n_tiles — measurable at every construction
        # when tile_v is small and num_virt large).
        t_full = np.repeat(np.arange(n_tiles, dtype=np.int64), tile_v * K)
        stride = np.int64(num_send) + 1
        keys = np.unique(t_full[m_t.reshape(-1)] * stride
                         + s_t.reshape(-1)[m_t.reshape(-1)])
        ut, us = keys // stride, keys % stride
        counts = np.bincount(ut, minlength=n_tiles)
        max_uniq = max(int(counts.max()), 1) if keys.size else 1
        wrows = min(_round_up(max_uniq, 8), num_send)
        if wrows > max_wrows or wrows >= num_send:
            return None
        starts = np.concatenate(([0], np.cumsum(counts)))
        within = np.arange(keys.size) - starts[ut]
        rows2d = np.zeros((n_tiles, wrows), np.int64)
        slot_valid = np.zeros((n_tiles, wrows), bool)
        rows2d[ut, within] = us
        slot_valid[ut, within] = True
        # pad slots repeat the tile's last unique sender (never selected)
        last = np.zeros(n_tiles, np.int64)
        last[ut] = us  # ascending within tile: final write = largest
        pad_cols = np.arange(wrows)[None, :] >= counts[:, None]
        rows2d = np.where(pad_cols, last[:, None], rows2d)
        # window-local index per slot: position of (tile, sender) in the
        # sorted composite key array, rebased to the tile's segment
        key_full = t_full * stride + s_t.reshape(-1)
        pos = np.searchsorted(keys, key_full)
        sl_local = np.where(
            m_t.reshape(-1), pos - starts[t_full], 0
        ).reshape(num_virt * K, 1).astype(np.int32)
    win_rows = rows2d.reshape(-1)
    arrays = {"win_rows": jnp.asarray(win_rows.astype(np.int32)),
              "sl_local": jnp.asarray(sl_local)}
    static = {"wrows": int(wrows), "tile_v": int(tile_v),
              "num_virt": int(num_virt), "dense_k": int(K),
              "num_send": int(num_send)}

    # fold layout for the analytic windowed BACKWARD: per table row, the
    # flat (tile * wrows + offset) slots of the per-tile d_window output
    # that cover it — d_table[r] = sum over those slots. Capped at
    # _MAX_K_FOLD overlapping windows per row (heavily clamped tails
    # would blow up the gather-accumulate); beyond the cap the backward
    # falls back to the un-windowed pair. Built vectorized (stable-sort
    # slots by row, place at within-row rank) — the per-slot Python loop
    # was measurable at every model construction.
    valid = slot_valid.reshape(-1)
    rows = win_rows[valid]  # pad slots carry zero cotangent; exclude
    slots = np.arange(win_rows.size)[valid]
    order = np.argsort(rows, kind="stable")
    rows_s, slots_s = rows[order], slots[order]
    counts = np.bincount(rows_s, minlength=num_send)
    k_fold = int(counts.max())
    if k_fold > _MAX_K_FOLD:
        # silent-regression telemetry: without fold arrays the training
        # backward falls back to the ~3x-costlier un-windowed pair
        import logging

        logging.getLogger(__name__).info(
            "prep_window_gather: k_fold=%d > %d (a sender row is covered "
            "by that many tile windows) — omitting fold arrays; the "
            "windowed analytic backward will fall back to the un-windowed "
            "kernels", k_fold, _MAX_K_FOLD,
        )
    if k_fold <= _MAX_K_FOLD:
        seg_starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        within = np.arange(rows_s.size) - seg_starts[rows_s]
        fold_slots = np.zeros((num_send, k_fold), np.int32)
        fold_mask = np.zeros((num_send, k_fold), np.float32)
        fold_slots[rows_s, within] = slots_s
        fold_mask[rows_s, within] = 1.0
        arrays["fold_slots"] = jnp.asarray(fold_slots)
        arrays["fold_mask"] = jnp.asarray(fold_mask)
        static["k_fold"] = k_fold
    return (arrays, static)


def grid_update_flat_win(table_f, ew, grid_emb_f, mask_p, pp, K, win_arrays,
                         wrows, tile_v, interpret=False, consts=None,
                         windows=None):
    """Fused decoder with the sender gather inside the kernel (see
    `_grid_update_win_kernel`). `table_f` is the (num_send, W) flat
    sender-transform table; windows are gathered by one small XLA take.
    Forward-only building block — `decode_grid_fused` in
    ops/message_passing.py wraps it with the custom VJP that routes the
    backward through the existing analytic kernels."""
    n_virt, K_ = mask_p.shape
    W = table_f.shape[-1]
    h = ew.shape[-1]
    B = W // h
    d_out = pp["o_w1"].shape[1]
    w_out = _round_up(B * d_out, 128)
    if consts is not None and consts["w2k"].shape[0] != W:
        consts = None
    if consts is None:
        consts = _prep_consts(pp, B)
    if n_virt % tile_v:
        # a non-divisible grid would silently leave trailing output rows
        # unwritten; callers gate on this but a direct call must not
        raise ValueError(
            f"grid_update_flat_win: num_virt={n_virt} not divisible by "
            f"tile_v={tile_v}; use gather_send_flat + grid_update_flat"
        )
    n_tiles = n_virt // tile_v
    TILE_E = tile_v * K
    dt = table_f.dtype
    if windows is None:
        windows = jnp.take(table_f, win_arrays["win_rows"], axis=0,
                           indices_are_sorted=False, unique_indices=False)
    full = lambda shape: pl.BlockSpec(shape, lambda v: (0, 0),
                                      memory_space=pltpu.VMEM)
    const_specs = [full(consts[name].shape) for name in _CONST_NAMES]
    out = pl.pallas_call(
        functools.partial(_grid_update_win_kernel, K, B, wrows),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((wrows, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, 1), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, h), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, K), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=pl.BlockSpec((tile_v, w_out), lambda v: (v, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_virt, w_out), dt),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(windows, win_arrays["sl_local"], ew, grid_emb_f, mask_p,
      *[consts[n] for n in _CONST_NAMES])
    if w_out != B * d_out:
        out = jax.lax.slice_in_dim(out, 0, B * d_out, axis=1)
    return out


def _grid_update_fwd(gathered, ew, grid_emb_f, mask_p, pp, consts, K,
                     interpret):
    out = _grid_update_impl(gathered, ew, grid_emb_f, mask_p, pp, K,
                            interpret, consts)
    return out, (gathered, ew, grid_emb_f, mask_p, pp, consts)


# ---------------------------------------------------------------------------
# Analytic backward kernel.
#
# Differentiating the flat-XLA recompute (`_grid_update_reference`) through
# jax.vjp costs ~59 ms at the bench scale — 24x the 2.5 ms forward kernel —
# because XLA materializes every (M, W) per-edge intermediate in HBM and the
# kron-widened matmuls run far off MXU peak (probes/decode_bwd.py). The
# backward below recomputes the forward chain per tile in VMEM and chains
# the gradients analytically in the same pass; parameter gradients are
# accumulated across the sequential TPU grid into revisited output blocks
# (constant index_map), then reduced from the kron-widened (W, W) layout
# back to raw (h, h) shapes outside the kernel.
# ---------------------------------------------------------------------------






# rows of the stacked bias-gradient accumulator (last row spare)
_BIAS_ROWS = ("enc_b0", "enc_b1", "enc_ls", "enc_lb", "b2", "e_ls", "e_lb",
              "a_b0", "a_b1", "a_ls", "a_lb", "o_b0", "o_b1")
_W_ACCS = ("enc_w0", "enc_w1", "w_i", "w2", "a_wr", "a_wa", "a_w1", "o_w0",
           "o_w1")
_TR_NAMES = ("w_ikT", "enc_w0kT", "enc_w1kT", "w2kT", "a_wrkT", "a_wakT",
             "a_w1kT", "o_w0kT", "o_w1kT", "fold_eye")


def _make_tr(consts, B, h):
    """Transposed widened weights + the lane-group folder for the backward
    kernels (matmul operands of the reverse chain)."""
    return {
        "w_ikT": consts["w_ik"].T,
        "enc_w0kT": consts["enc_w0k"].T,
        "enc_w1kT": consts["enc_w1k"].T,
        "w2kT": consts["w2k"].T,
        "a_wrkT": consts["a_wrk"].T,
        "a_wakT": consts["a_wak"].T,
        "a_w1kT": consts["a_w1k"].T,
        "o_w0kT": consts["o_w0k"].T,
        "o_w1kT": consts["o_w1k"].T,
        "fold_eye": jnp.tile(jnp.eye(h, dtype=jnp.float32), (B, 1)),
    }


def _reduce_param_grads(waccs, bias_acc, B, h, d_out, pp):
    """Fold the kron-widened (W, W) kernel accumulators back to raw
    parameter shapes. The accumulators for the centered weights/biases
    (w2, enc_w1, a_w1 and their biases) are gradients w.r.t. the FOLDED
    params; `_uncenter_wgrad` applies the (I - 11^T/h) chain-rule
    correction (associativity: (X^T dC)(I-M) reduces blockwise)."""
    bias = {name: bias_acc[i] for i, name in enumerate(_BIAS_ROWS)}
    d_pp = {
        "w_i": _block_diag_sum(waccs["w_i"], B, h, h),
        "w2": _uncenter_wgrad(_block_diag_sum(waccs["w2"], B, h, h)),
        "b2": _uncenter_wgrad(_group_row_sum(bias["b2"][None], B, h)),
        "e_ls": _group_row_sum(bias["e_ls"][None], B, h),
        "e_lb": _group_row_sum(bias["e_lb"][None], B, h),
        "enc_w0": _block_diag_sum(waccs["enc_w0"], B, h, h),
        "enc_b0": _group_row_sum(bias["enc_b0"][None], B, h),
        "enc_w1": _uncenter_wgrad(
            _block_diag_sum(waccs["enc_w1"], B, h, h)),
        "enc_b1": _uncenter_wgrad(
            _group_row_sum(bias["enc_b1"][None], B, h)),
        "enc_ls": _group_row_sum(bias["enc_ls"][None], B, h),
        "enc_lb": _group_row_sum(bias["enc_lb"][None], B, h),
        "a_w0": jnp.concatenate(
            [_block_diag_sum(waccs["a_wr"], B, h, h),
             _block_diag_sum(waccs["a_wa"], B, h, h)], axis=0
        ),
        "a_b0": _group_row_sum(bias["a_b0"][None], B, h),
        "a_w1": _uncenter_wgrad(_block_diag_sum(waccs["a_w1"], B, h, h)),
        "a_b1": _uncenter_wgrad(_group_row_sum(bias["a_b1"][None], B, h)),
        "a_ls": _group_row_sum(bias["a_ls"][None], B, h),
        "a_lb": _group_row_sum(bias["a_lb"][None], B, h),
        "o_w0": _block_diag_sum(waccs["o_w0"], B, h, h),
        "o_b0": _group_row_sum(bias["o_b0"][None], B, h),
        "o_w1": _block_diag_sum(waccs["o_w1"], B, h, d_out),
        "o_b1": bias["o_b1"][:B * d_out].reshape(B, d_out).sum(axis=0),
    }
    return {k: v.astype(pp[k].dtype) for k, v in d_pp.items()}


def _grid_update_bwd_chain(K, B, g, ew_ref, ge_ref, mask_ref, dout_ref,
                           # forward consts
                           w_ik, enc_w0k, enc_b0w, enc_w1k, enc_b1w,
                           enc_lsw, enc_lbw, w2k, b2w, e_lsw, e_lbw, a_wrk,
                           a_wak, a_b0w, a_b1w, a_w1k, a_lsw, a_lbw, o_w0k,
                           o_b0w, o_w1k, o_b1w, ones_k,
                           # transposed weights + lane-group folder
                           w_ikT, enc_w0kT, enc_w1kT, w2kT, a_wrkT, a_wakT,
                           a_w1kT, o_w0kT, o_w1kT, fold_eye):
    """Shared per-tile forward recompute + analytic backward chain.

    `g` is the (TILE_E, W) f32 gathered sender-transform tile (from HBM or
    the in-kernel window reconstruct). Returns (d_x0, d_ew, d_ge, acc,
    bias): the cotangent of the edge pre-activation (from which the
    caller derives d_gathered or d_window), the edge-feature and grid-
    embedding cotangent tiles, and the per-tile parameter-gradient
    accumulator dicts."""
    f32 = jnp.float32
    ones = ones_k[...]
    ge = ge_ref[...].astype(f32)
    tile_v, W = ge.shape
    h = ew_ref.shape[-1]

    # ---- forward recompute (mirrors _grid_update_kernel; the three
    # LN-feeding weights are centered, so the cent variants apply;
    # square kron-widened consts multiply per 128-lane group) ----
    t1p = _bdot(ge, enc_w0k, h) + enc_b0w[...]
    t1 = jax.nn.silu(t1p)
    t2 = _bdot(t1, enc_w1k, h) + enc_b1w[...]
    chat_e, inv_e = _group_ln_cent_parts(t2, ones, h)
    gr = ge + chat_e * enc_lsw[...] + enc_lbw[...]
    rec = _bdot(gr, w_ik, h)
    rec_rep = jnp.broadcast_to(rec[:, None, :], (tile_v, K, W)).reshape(
        tile_v * K, W
    )
    ew_w = _lane_tile(ew_ref[...].astype(f32), B)
    x0 = g + ew_w + rec_rep
    x1 = jax.nn.silu(x0)
    x2 = _bdot(x1, w2k, h) + b2w[...]
    chat_x, inv_x = _group_ln_cent_parts(x2, ones, h)
    msg = chat_x * e_lsw[...] + e_lbw[...]
    mask = mask_ref[...]
    agg = (msg.reshape(tile_v, K, W) * mask[..., None]).sum(axis=1)
    u0p = _bdot(gr, a_wrk, h) + _bdot(agg, a_wak, h) + a_b0w[...]
    u1 = jax.nn.silu(u0p)
    u2 = _bdot(u1, a_w1k, h) + a_b1w[...]
    chat_u, inv_u = _group_ln_cent_parts(u2, ones, h)
    rec_out = gr + chat_u * a_lsw[...] + a_lbw[...]
    y0p = _bdot(rec_out, o_w0k, h) + o_b0w[...]
    y = jax.nn.silu(y0p)

    # ---- backward chain ----
    acc = {}
    bias = {}
    d_out = dout_ref[...].astype(f32)  # (tile_v, w_out)
    w_out = d_out.shape[-1]
    d_y = jnp.dot(d_out, o_w1kT[...], preferred_element_type=f32)
    acc["o_w1"] = _dotT(y, d_out)
    bias["o_b1"] = d_out.sum(axis=0, keepdims=True)
    d_y0p = d_y * _silu_grad(y0p)
    d_rec_out = _bdot(d_y0p, o_w0kT, h)
    acc["o_w0"] = _accT(rec_out, d_y0p, h)
    bias["o_b0"] = d_y0p.sum(axis=0, keepdims=True)
    d_gr = d_rec_out
    d_ln_u = d_rec_out
    bias["a_ls"] = (d_ln_u * chat_u).sum(axis=0, keepdims=True)
    bias["a_lb"] = d_ln_u.sum(axis=0, keepdims=True)
    d_u2 = _group_ln_cent_bwd(d_ln_u * a_lsw[...], chat_u, inv_u, ones, h)
    d_u1 = _bdot(d_u2, a_w1kT, h)
    acc["a_w1"] = _accT(u1, d_u2, h)
    bias["a_b1"] = d_u2.sum(axis=0, keepdims=True)
    d_u0p = d_u1 * _silu_grad(u0p)
    d_gr = d_gr + _bdot(d_u0p, a_wrkT, h)
    d_agg = _bdot(d_u0p, a_wakT, h)
    acc["a_wr"] = _accT(gr, d_u0p, h)
    acc["a_wa"] = _accT(agg, d_u0p, h)
    bias["a_b0"] = d_u0p.sum(axis=0, keepdims=True)
    d_msg = (
        jnp.broadcast_to(d_agg[:, None, :], (tile_v, K, W))
        * mask[..., None]
    ).reshape(tile_v * K, W)
    bias["e_ls"] = (d_msg * chat_x).sum(axis=0, keepdims=True)
    bias["e_lb"] = d_msg.sum(axis=0, keepdims=True)
    d_x2 = _group_ln_cent_bwd(d_msg * e_lsw[...], chat_x, inv_x, ones, h)
    d_x1 = _bdot(d_x2, w2kT, h)
    acc["w2"] = _accT(x1, d_x2, h)
    bias["b2"] = d_x2.sum(axis=0, keepdims=True)
    d_x0 = d_x1 * _silu_grad(x0)
    d_ew = jnp.dot(d_x0, fold_eye[...], preferred_element_type=f32)
    d_rec = d_x0.reshape(tile_v, K, W).sum(axis=1)
    d_gr = d_gr + _bdot(d_rec, w_ikT, h)
    acc["w_i"] = _accT(gr, d_rec, h)
    d_ge = d_gr
    d_ln_e = d_gr
    bias["enc_ls"] = (d_ln_e * chat_e).sum(axis=0, keepdims=True)
    bias["enc_lb"] = d_ln_e.sum(axis=0, keepdims=True)
    d_t2 = _group_ln_cent_bwd(d_ln_e * enc_lsw[...], chat_e, inv_e, ones, h)
    d_t1 = _bdot(d_t2, enc_w1kT, h)
    acc["enc_w1"] = _accT(t1, d_t2, h)
    bias["enc_b1"] = d_t2.sum(axis=0, keepdims=True)
    d_t1p = d_t1 * _silu_grad(t1p)
    d_ge = d_ge + _bdot(d_t1p, enc_w0kT, h)
    acc["enc_w0"] = _accT(ge, d_t1p, h)
    bias["enc_b0"] = d_t1p.sum(axis=0, keepdims=True)
    return d_x0, d_ew, d_ge, acc, bias


def _acc_param_grads(acc, bias, bias_acc_ref, wacc_refs, W):
    """Accumulate per-tile parameter gradients across the sequential TPU
    grid into revisited output blocks (constant index_map)."""
    f32 = jnp.float32
    n_bias = len(_BIAS_ROWS)
    bias_rows = []
    for name in _BIAS_ROWS:
        row = bias[name]
        if row.shape[-1] != W:
            row = jnp.pad(row, ((0, 0), (0, W - row.shape[-1])))
        bias_rows.append(row)
    bias_tile = jnp.concatenate(
        bias_rows + [jnp.zeros((bias_acc_ref.shape[0] - n_bias, W), f32)],
        axis=0,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        bias_acc_ref[...] = bias_tile
        for name, ref in zip(_W_ACCS, wacc_refs):
            ref[...] = acc[name]

    @pl.when(pl.program_id(0) != 0)
    def _accum():
        bias_acc_ref[...] += bias_tile
        for name, ref in zip(_W_ACCS, wacc_refs):
            ref[...] += acc[name]


def _grid_update_bwd_kernel(K, B, g_ref, ew_ref, ge_ref, mask_ref, dout_ref,
                            *args):
    consts_tr, out_refs = args[:33], args[33:]
    dg_ref, dew_ref, dge_ref, bias_acc_ref, *wacc_refs = out_refs
    d_x0, d_ew, d_ge, acc, bias = _grid_update_bwd_chain(
        K, B, g_ref[...].astype(jnp.float32), ew_ref, ge_ref, mask_ref,
        dout_ref, *consts_tr,
    )
    dg_ref[...] = d_x0.astype(dg_ref.dtype)
    dew_ref[...] = d_ew.astype(dew_ref.dtype)
    dge_ref[...] = d_ge.astype(dge_ref.dtype)
    W = dge_ref.shape[-1]
    _acc_param_grads(acc, bias, bias_acc_ref, wacc_refs, W)


def _grid_update_win_bwd_kernel(K, B, wrows, win_ref, sl_ref, ew_ref,
                                ge_ref, mask_ref, dout_ref, *args):
    """Backward tile with the sender gather (and its transpose) fused
    in-kernel: reconstructs the gathered rows from the tile's window with
    the same bf16x2 one-hot matmul as `_grid_update_win_kernel` (so the
    recomputed primal matches the windowed forward exactly), and instead
    of writing the (TILE_E, W) d_gathered cotangent to HBM emits the much
    narrower per-tile (wrows, W) d_window = onehot^T @ d_x0 — the caller
    folds overlapping windows back to the (num_send, W) table with the
    static fold layout from `prep_window_gather`."""
    consts_tr, out_refs = args[:33], args[33:]
    dwin_ref, dew_ref, dge_ref, bias_acc_ref, *wacc_refs = out_refs
    g, oh_b = _win_reconstruct(win_ref, sl_ref, wrows)
    d_x0, d_ew, d_ge, acc, bias = _grid_update_bwd_chain(
        K, B, g, ew_ref, ge_ref, mask_ref, dout_ref, *consts_tr,
    )
    dwin_ref[...] = _win_transpose_ct(oh_b, d_x0, dwin_ref.dtype).astype(
        dwin_ref.dtype)
    dew_ref[...] = d_ew.astype(dew_ref.dtype)
    dge_ref[...] = d_ge.astype(dge_ref.dtype)
    W = dge_ref.shape[-1]
    _acc_param_grads(acc, bias, bias_acc_ref, wacc_refs, W)




def _grid_update_bwd(K, interpret, res, g_out):
    gathered, ew, grid_emb_f, mask_p, pp, consts_in = res

    def _d_consts():
        if consts_in is None:
            return None
        return {k: jnp.zeros_like(v) for k, v in consts_in.items()}

    M, W = gathered.shape
    h = ew.shape[-1]
    B = W // h
    n_virt = M // K
    d_out = pp["o_w1"].shape[1]
    w_out = _round_up(B * d_out, 128)
    n_rows = grid_emb_f.shape[0]

    import os

    TILE_V = _pick_tile_v(n_virt, K)
    # w_out > W (possible when d_out > h, e.g. many state vars with
    # --output_std) would need a wider bias accumulator than the (.., W)
    # blocks used below — take the jax.vjp fallback for that rare shape
    if (n_virt % TILE_V or TILE_V < 8 or w_out > W
            or os.environ.get("NLT_NO_BWD_KERNEL")):
        def fwd(gathered, ew, grid_emb_f, mask_p, pp):
            return _grid_update_reference(gathered, ew, grid_emb_f, mask_p,
                                          pp, K, B)

        _, vjp = jax.vjp(fwd, gathered, ew, grid_emb_f, mask_p, pp)
        return vjp(g_out) + (_d_consts(),)

    consts = consts_in if consts_in is not None else _prep_consts(pp, B)
    tr = _make_tr(consts, B, h)

    # pad d_out lanes and ge rows like the forward
    if g_out.shape[-1] != w_out:
        g_out = jnp.pad(g_out, ((0, 0), (0, w_out - g_out.shape[-1])))
    ge = grid_emb_f
    if n_rows < n_virt:
        ge = jnp.pad(ge, ((0, n_virt - n_rows), (0, 0)))

    TILE_E = TILE_V * K
    dt = gathered.dtype
    n_bias_rows = _round_up(len(_BIAS_ROWS), 8)
    full = lambda shape: pl.BlockSpec(shape, lambda v: (0, 0),
                                      memory_space=pltpu.VMEM)
    const_specs = [full(consts[n].shape) for n in _CONST_NAMES]
    tr_specs = [full(tr[n].shape) for n in _TR_NAMES]
    AC = _acc_cols(W, h)
    wacc_shapes = {
        "enc_w0": (AC, AC), "enc_w1": (AC, AC), "w_i": (AC, AC),
        "w2": (AC, AC), "a_wr": (AC, AC), "a_wa": (AC, AC),
        "a_w1": (AC, AC), "o_w0": (AC, AC),
        "o_w1": (W, w_out),
    }
    outs = pl.pallas_call(
        functools.partial(_grid_update_bwd_kernel, K, B),
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
            pl.BlockSpec((TILE_V, w_out), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs + tr_specs,
        out_specs=(
            pl.BlockSpec((TILE_E, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, h), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bias_rows, W), lambda v: (0, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec(wacc_shapes[n], lambda v: (0, 0),
                         memory_space=pltpu.VMEM)
            for n in _W_ACCS
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, W), dt),
            jax.ShapeDtypeStruct((M, h), ew.dtype),
            jax.ShapeDtypeStruct((n_virt, W), grid_emb_f.dtype),
            jax.ShapeDtypeStruct((n_bias_rows, W), jnp.float32),
        ) + tuple(
            jax.ShapeDtypeStruct(wacc_shapes[n], jnp.float32)
            for n in _W_ACCS
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(gathered, ew, ge, mask_p, g_out,
      *[consts[n] for n in _CONST_NAMES], *[tr[n] for n in _TR_NAMES])

    d_gathered, d_ew, d_ge_full, bias_acc = outs[:4]
    waccs = dict(zip(_W_ACCS, outs[4:]))
    if n_rows < n_virt:
        d_ge_full = jax.lax.slice_in_dim(d_ge_full, 0, n_rows, axis=0)

    d_pp = _reduce_param_grads(waccs, bias_acc, B, h, d_out, pp)
    return (d_gathered, d_ew, d_ge_full, jnp.zeros_like(mask_p), d_pp,
            _d_consts())


_grid_update_vjp.defvjp(_grid_update_fwd, _grid_update_bwd)


def grid_update_flat_win_bwd(table_f, ew, grid_emb_f, mask_p, pp, K,
                             win_arrays, wrows, tile_v, g_out,
                             interpret=False, consts=None, windows=None):
    """Analytic backward of `grid_update_flat_win` with the sender gather
    AND its transpose fused in-kernel.

    Training through the un-windowed recompute pays the full (M, W)
    gathered-rows round trip three times at MEPS scale (~260 MB each: the
    gather forward inside the VJP, the backward kernel's `gathered` input,
    and its `d_gathered` output) plus the transposed-gather fold. Here the
    backward kernel reads per-tile windows (~4x smaller), emits per-tile
    (wrows, W) `d_window` cotangents, and the overlapping windows are
    folded back to the (num_send, W) table with the static `fold_slots`
    layout — a short gather-accumulate like `_gather_rows_T_bwd` but over
    the 4x-smaller window array.

    Returns (d_table, d_ew, d_ge, d_pp) — gradients of the WINDOWED primal
    (the in-kernel recompute uses the same bf16x2 one-hot reconstruct as
    the forward, so primal and gradient are now consistent) — or None when
    the layout/shape guards fail (caller falls back to the un-windowed
    pair's VJP)."""
    import os

    n_virt, K_ = mask_p.shape
    W = table_f.shape[-1]
    h = ew.shape[-1]
    B = W // h
    d_out = pp["o_w1"].shape[1]
    w_out = _round_up(B * d_out, 128)
    n_rows = grid_emb_f.shape[0]
    if ("fold_slots" not in win_arrays or n_virt % tile_v or tile_v < 8
            or w_out > W or os.environ.get("NLT_NO_BWD_KERNEL")
            or os.environ.get("NLT_NO_WIN_BWD")):
        return None
    if consts is not None and consts["w2k"].shape[0] != W:
        consts = None
    if consts is None:
        consts = _prep_consts(pp, B)
    tr = _make_tr(consts, B, h)
    n_tiles = n_virt // tile_v
    TILE_E = tile_v * K
    if g_out.shape[-1] != w_out:
        g_out = jnp.pad(g_out, ((0, 0), (0, w_out - g_out.shape[-1])))
    ge = grid_emb_f
    if n_rows < n_virt:
        ge = jnp.pad(ge, ((0, n_virt - n_rows), (0, 0)))
    if windows is None:
        windows = jnp.take(table_f, win_arrays["win_rows"], axis=0)

    n_bias_rows = _round_up(len(_BIAS_ROWS), 8)
    full = lambda shape: pl.BlockSpec(shape, lambda v: (0, 0),
                                      memory_space=pltpu.VMEM)
    const_specs = [full(consts[n].shape) for n in _CONST_NAMES]
    tr_specs = [full(tr[n].shape) for n in _TR_NAMES]
    AC = _acc_cols(W, h)
    wacc_shapes = {
        "enc_w0": (AC, AC), "enc_w1": (AC, AC), "w_i": (AC, AC),
        "w2": (AC, AC), "a_wr": (AC, AC), "a_wa": (AC, AC),
        "a_w1": (AC, AC), "o_w0": (AC, AC),
        "o_w1": (W, w_out),
    }
    outs = pl.pallas_call(
        functools.partial(_grid_update_win_bwd_kernel, K, B, wrows),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((wrows, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, 1), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, h), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, K), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, w_out), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs + tr_specs,
        out_specs=(
            pl.BlockSpec((wrows, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, h), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, W), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bias_rows, W), lambda v: (0, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec(wacc_shapes[n], lambda v: (0, 0),
                         memory_space=pltpu.VMEM)
            for n in _W_ACCS
        ),
        out_shape=(
            # d_win rides the table's dtype (bf16 in the bf16 path:
            # the fold promotes to f32 via the mask multiply, so the
            # accumulation stays f32; only the storage rounds)
            jax.ShapeDtypeStruct((n_tiles * wrows, W), table_f.dtype),
            jax.ShapeDtypeStruct((n_virt * K, h), ew.dtype),
            jax.ShapeDtypeStruct((n_virt, W), grid_emb_f.dtype),
            jax.ShapeDtypeStruct((n_bias_rows, W), jnp.float32),
        ) + tuple(
            jax.ShapeDtypeStruct(wacc_shapes[n], jnp.float32)
            for n in _W_ACCS
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(windows, win_arrays["sl_local"], ew, ge, mask_p, g_out,
      *[consts[n] for n in _CONST_NAMES], *[tr[n] for n in _TR_NAMES])

    d_win, d_ew, d_ge_full, bias_acc = outs[:4]
    waccs = dict(zip(_W_ACCS, outs[4:]))
    if n_rows < n_virt:
        d_ge_full = jax.lax.slice_in_dim(d_ge_full, 0, n_rows, axis=0)

    # fold overlapping per-tile windows back to the sender table:
    # d_table[r] = sum of d_win at the (tile*wrows + offset) slots covering
    # row r (per-k gather-accumulate; K_F <= _MAX_K_FOLD by construction)
    slots = win_arrays["fold_slots"]
    fm = win_arrays["fold_mask"]
    d_table = None
    for k in range(slots.shape[1]):
        part = jnp.take(d_win, slots[:, k], axis=0) * fm[:, k][:, None]
        d_table = part if d_table is None else d_table + part
    d_table = d_table.astype(table_f.dtype)
    d_pp = _reduce_param_grads(waccs, bias_acc, B, h, d_out, pp)
    return d_table, d_ew, d_ge_full, d_pp


# public alias for rollout-ctx precomputation (scan-hoisted widening)
prep_grid_update_consts = _prep_consts


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
