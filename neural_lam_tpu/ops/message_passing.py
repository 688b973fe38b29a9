"""Interaction network (Battaglia et al. 2016) as a functional TPU op.

Reference behavior (ref: neural_lam/interaction_net.py:10-131):
  messages   = EdgeMLP(concat(edge_rep, send_rep[senders], rec_rep[receivers]))
  aggregated = scatter-{sum,mean}(messages -> receivers)
  rec_out    = rec_rep + AggrMLP(concat(rec_rep, aggregated))
  edge_out   = edge_rep + messages            (if update_edges)

TPU-first redesign:

* Edge sets are static, receiver-sorted int32 index arrays in *local* index
  spaces (the reference re-bases sender and receiver indices independently by
  subtracting their per-row minima, ref: interaction_net.py:55-62 — we apply
  the same rule once at graph-load time, see `EdgeSet.from_global`).

* The first EdgeMLP layer over the 3-way concat is algebraically decomposed:
      concat(e, x_j, x_i) @ W  ==  e @ W_e + x_j @ W_j + x_i @ W_i
  and the node-dependent terms are computed per-*node* then gathered per-edge,
  cutting that matmul's FLOPs from 3·M·d² to (M + N_send + N_rec)·d²
  (M ≈ 8·N for the mesh). Gathers of (N, d) rows are cheap on TPU; scatters
  are not, so aggregation uses either sorted segment_sum or the padded
  gather-table (see ops/segment.py).

* Parameters keep the exact pytree layout of `init_mlp`, with the EdgeMLP
  first-layer weight stored as the full (3d, h) matrix so torch checkpoints
  import unchanged; the decomposition slices it under jit (free).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mlp import apply_mlp, apply_mlp_concat, finish_mlp, init_mlp, layer_norm
from .segment import (build_gather_table, gather_rows_batched, gather_sum, segment_sum)

# Pallas fused edge-tail kernel: enabled on non-CPU backends unless
# NLT_NO_PALLAS is set; "interpret" runs the kernel interpreted (tests).
_PALLAS_MODE = None


def _pallas_mode():
    global _PALLAS_MODE
    if _PALLAS_MODE is None:
        import os

        if os.environ.get("NLT_NO_PALLAS"):
            _PALLAS_MODE = "off"
        elif os.environ.get("NLT_PALLAS_INTERPRET"):
            _PALLAS_MODE = "interpret"
        else:
            _PALLAS_MODE = "on" if jax.default_backend() != "cpu" else "off"
    return _PALLAS_MODE


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgeSet:
    """A static directed edge set between a sender and a receiver node array.

    senders/receivers: (M,) int32 local indices, sorted by receiver.
    features: (M, d_edge_f) static (normalized) edge features.
    gather_table: (num_rec, max_deg) int32 padded incoming-edge-id table.
    num_send / num_rec: static sizes of the endpoint node arrays.
    """

    senders: jax.Array
    receivers: jax.Array
    features: jax.Array
    gather_table: jax.Array
    mask: jax.Array  # (M, 1) 1.0 for real edges (all-ones when not dense)
    # dense layout: virtual-row -> receiver map ((num_virt,) int32; high-degree
    # receivers own several K-slot virtual rows); empty when not dense
    virt_to_rec: jax.Array
    num_send: int = dataclasses.field(metadata={"static": True})
    num_rec: int = dataclasses.field(metadata={"static": True})
    dense_k: int = dataclasses.field(default=0, metadata={"static": True})
    num_virt: int = dataclasses.field(default=0, metadata={"static": True})
    # True when (pre-padding) every receiver had exactly one virtual row in
    # order: aggregation is then virt[..., :num_rec, :]
    virt_identity: bool = dataclasses.field(
        default=False, metadata={"static": True}
    )
    # Transposed dense layout (an EdgeSet whose "edges" are this set's edge
    # SLOTS and whose "receivers" are this set's SENDER nodes). Used by the
    # sender-gather custom VJP to turn the backward scatter-add into a dense
    # gather + masked fold (scatter is the TPU's weak spot). None when not
    # built (non-dense sets, hand-assembled shard chunks).
    transposed: "EdgeSet | None" = None
    # Static virt-row -> receiver fold layout ((num_rec, R) padded virt-row
    # ids + mask): receivers own contiguous sorted virtual rows, so the
    # virt fold can be R masked row gathers instead of a segment-sum —
    # XLA lowers the latter to scatter-add, measured 1.68 ms vs a ~0.3 ms
    # gather fold for the g2m backward table fold at MEPS bench scale.
    # None for virt_identity sets (fold is a slice) and skewed sets
    # (R > 16, where the padded gathers would outgrow the scatter).
    rec_slots: "jax.Array | None" = None
    rec_mask: "jax.Array | None" = None
    # Split sharded sets (parallel/grid_sharded.py): this set holds the
    # INTERIOR edges (senders owned by the local shard) and `frontier`
    # holds the edges whose senders are halo/all-gather imports. The
    # frontier set's num_send indexes the IMPORT buffer, so the collective
    # producing it has exactly one (small) consumer and XLA's
    # latency-hiding scheduler can overlap it with the interior kernel.
    frontier: "EdgeSet | None" = None

    @property
    def num_edges(self) -> int:
        return self.features.shape[0]

    @staticmethod
    def from_local(senders: np.ndarray, receivers: np.ndarray,
                   features: np.ndarray, num_send: int, num_rec: int,
                   sort: bool = True, dense: bool = False,
                   dense_cap: int | None = None,
                   dense_force_k: int | None = None,
                   dense_min_virt: int = 1,
                   build_transpose: bool = True):
        """Build an EdgeSet from already-local index arrays.

        sort=False keeps the given edge order (required for chunk-ordered
        fused edge sets, where chunk boundaries must stay contiguous); the
        gather table handles unsorted receivers.

        dense=True pads the edge list so every receiver owns contiguous
        K-slot *virtual rows* (receiver-major layout). With the default cap
        K=8, a receiver of degree d owns ceil(d/K) virtual rows; aggregation
        becomes reshape + masked sum to virtual rows (no gather at all)
        followed by a tiny sorted segment-sum over the virtual->receiver map.
        Padding slots have sender 0, zero features and mask 0; wasted
        edge-MLP work is bounded by K / mean_degree per row.
        """
        senders = np.asarray(senders)
        receivers = np.asarray(receivers)
        features = np.asarray(features, dtype=np.float32)
        if dense:
            K = dense_cap or 8
            counts = np.bincount(receivers, minlength=num_rec)
            K = min(K, max(int(counts.max()), 1))
            if dense_force_k is not None:
                # pin K (uniform across stacked per-shard edge sets); any K
                # is valid — higher degrees just use more virtual rows
                K = dense_force_k
            # dense_min_virt=0: zero-degree receivers own NO virtual rows —
            # used for per-shard edge *chunks* (parallel/grid_sharded.py)
            # where each shard sees only a receiver subrange and padding
            # every absent receiver would replicate the full edge-MLP cost
            n_virt_per_rec = np.maximum(-(-counts // K), dense_min_virt)
            virt_start = np.concatenate(([0], np.cumsum(n_virt_per_rec)))[:-1]
            num_virt = int(n_virt_per_rec.sum())
            virt_identity = bool(np.all(n_virt_per_rec == 1))
            # pad virtual rows (all-masked) so kernels get large even tiles;
            # 64 is the Pallas kernels' minimum tile — padding every dense
            # set to a 64-multiple keeps small (test-sized) graphs on the
            # same fused-kernel path the TPU runs at scale
            tile = 256 if num_virt >= 2048 else 64
            num_virt_pad = -(-max(num_virt, 1) // tile) * tile
            order = np.argsort(receivers, kind="stable")
            starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
            within = np.arange(len(receivers)) - starts[receivers[order]]
            r_sorted = receivers[order]
            slots = (virt_start[r_sorted] + within // K) * K + within % K
            M_pad = num_virt_pad * K
            d_feat = features.shape[1]
            send_p = np.zeros(M_pad, np.int32)
            feat_p = np.zeros((M_pad, d_feat), np.float32)
            mask = np.zeros((M_pad, 1), np.float32)
            send_p[slots] = senders[order]
            feat_p[slots] = features[order]
            mask[slots] = 1.0
            virt_to_rec = np.concatenate([
                np.repeat(np.arange(num_rec, dtype=np.int32), n_virt_per_rec),
                np.full(num_virt_pad - num_virt, num_rec - 1, np.int32),
            ])
            # gather-based virt->receiver fold layout (see field docstring)
            rec_slots = rec_mask = None
            r_fold = int(n_virt_per_rec.max()) if num_rec else 0
            if not virt_identity and 0 < r_fold <= 16:
                jj = np.arange(r_fold)[None, :]
                cnt = n_virt_per_rec[:, None]
                rec_slots = jnp.asarray(
                    (virt_start[:, None]
                     + np.minimum(jj, np.maximum(cnt - 1, 0))).astype(
                         np.int32)
                )
                rec_mask = jnp.asarray((jj < cnt).astype(np.float32))
            recv_p = np.repeat(virt_to_rec, K)
            table, _ = build_gather_table(recv_p, num_rec)
            transposed = None
            if build_transpose:
                real = np.nonzero(mask[:, 0] > 0)[0]
                if real.size:
                    # transposed dense layout: "edges" are this set's slot
                    # ids, "receivers" its sender nodes; cap near the mean
                    # out-degree bounds padding for skewed degrees (m2g
                    # senders cover ~40 grid slots each, g2m senders ~2)
                    cap = int(min(8, max(
                        1, -(-real.size // max(num_send, 1))
                    )))
                    transposed = EdgeSet.from_local(
                        real.astype(np.int64), send_p[real],
                        np.zeros((real.size, 0), np.float32),
                        num_send=M_pad, num_rec=num_send, dense=True,
                        dense_cap=cap, build_transpose=False,
                    )
            return EdgeSet(
                transposed=transposed,
                rec_slots=rec_slots,
                rec_mask=rec_mask,
                senders=jnp.asarray(send_p),
                receivers=jnp.asarray(recv_p),
                features=jnp.asarray(feat_p),
                gather_table=jnp.asarray(table),
                mask=jnp.asarray(mask),
                virt_to_rec=jnp.asarray(virt_to_rec),
                num_send=int(num_send),
                num_rec=int(num_rec),
                dense_k=K,
                num_virt=num_virt_pad,
                virt_identity=virt_identity,
            )
        if sort:
            order = np.argsort(receivers, kind="stable")
            senders, receivers = senders[order], receivers[order]
            features = features[order]
        table, _ = build_gather_table(receivers, num_rec)
        return EdgeSet(
            senders=jnp.asarray(senders.astype(np.int32)),
            receivers=jnp.asarray(receivers.astype(np.int32)),
            features=jnp.asarray(features),
            gather_table=jnp.asarray(table),
            mask=jnp.asarray(np.ones((len(receivers), 1), np.float32)),
            virt_to_rec=jnp.zeros((0,), jnp.int32),
            num_send=int(num_send),
            num_rec=int(num_rec),
        )

    @staticmethod
    def from_global(edge_index: np.ndarray, features: np.ndarray,
                    num_send: int | None = None, num_rec: int | None = None):
        """Build an EdgeSet from a global-index (2, M) edge array.

        Applies the reference's re-basing rule: sender and receiver index
        spaces are independently shifted so each starts at 0
        (ref: neural_lam/interaction_net.py:55-58). Edges are then sorted by
        receiver (stable, so same-receiver message order is preserved) and
        the padded gather table is precomputed.
        """
        edge_index = np.asarray(edge_index)
        senders = edge_index[0] - edge_index[0].min()
        receivers = edge_index[1] - edge_index[1].min()
        if num_send is None:
            num_send = int(senders.max()) + 1
        if num_rec is None:
            num_rec = int(receivers.max()) + 1
        return EdgeSet.from_local(
            senders, receivers, features, num_send, num_rec, sort=True
        )


class SplitSend(NamedTuple):
    """Sender tables of a split (interior/frontier) sharded edge set.

    `owned`: the shard's own sender rows — the interior edges' table.
    `imports`: the halo-ppermuted / all-gathered rows the FRONTIER edges
    index. Returned by the sharded sender hooks instead of the
    concatenated [owned ++ imports] table so that the collective producing
    `imports` has exactly one consumer — the small frontier round — and
    the big interior edge kernel, having no data dependence on it, can run
    while the collective is in flight (XLA latency-hiding scheduler)."""

    owned: jax.Array
    imports: jax.Array


class SplitSendLazy:
    """SplitSend whose imports come from a deferred collective.

    `gather(x, axis)` all-gathers x along the node axis over the space
    mesh axis. Deferring lets the consumer move the (linear, row-wise)
    sender transform BEFORE the collective: each shard transforms only
    the rows it owns and the gather moves the transformed table —
    removing the replicated full-table transform the eager variant pays
    (every shard re-transforming all-gathered raw rows), and under bf16
    compute halving the gathered bytes (the cast precedes the gather).
    Transform-then-gather is row-wise identical math to
    gather-then-transform. Plain class, not a pytree: it only exists
    between a sender hook and its edge round inside one trace."""

    __slots__ = ("owned", "gather")

    def __init__(self, owned, gather):
        self.owned = owned
        self.gather = gather

    @property
    def imports(self):
        """Raw-row gather (the eager SplitSend behavior) for consumers
        that cannot factor the sender transform out."""
        return self.gather(self.owned, 1 if self.owned.ndim == 3 else 0)

    def imports_tf(self, tf_owned):
        """Gather already-transformed flat (n_owned, W) rows."""
        return self.gather(tf_owned, 0)


_SPLIT_SEND_TYPES = (SplitSend, SplitSendLazy)


def split_send_tf(edge_mlp_params: dict, send, batch_size: int,
                  compute_dtype=None):
    """(tf_owned, tf_imports) sender transforms of a split sender table.

    For `SplitSendLazy` the imports table is gathered AFTER the transform
    (and after the bf16 cast). For an eager `SplitSend` (halo ppermutes —
    tiny row counts) both parts are transformed in place."""
    w0 = edge_mlp_params["layers"][0]["w"]
    h = w0.shape[0] // 3
    w_j = w0[h:2 * h]
    cd = compute_dtype

    def tf(x):
        t = (node_transform_from_flat(x, w_j, batch_size, cd)
             if x.ndim == 2 else node_transform_flat(x, w_j, cd))
        return t.astype(cd) if cd is not None else t

    tf_owned = tf(send.owned)
    if isinstance(send, SplitSendLazy):
        return tf_owned, send.imports_tf(tf_owned)
    return tf_owned, tf(send.imports)


def embed_edge_features(embedder_params: dict, edges: "EdgeSet",
                        compute_dtype=None):
    """Edge-feature embedding; (interior, frontier) pair for split sets."""
    emb = apply_mlp(embedder_params, edges.features,
                    compute_dtype=compute_dtype)
    if edges.frontier is not None:
        return (emb, apply_mlp(embedder_params, edges.frontier.features,
                               compute_dtype=compute_dtype))
    return emb


# ---------------------------------------------------------------------------
# Flat-lane (rows, B*h) layout: batch packed into the lane dimension.
# Motivation + measurements in ops/pallas_edge_flat.py. The flat path engages
# for dense-layout edge sets when B*h is a lane-tile multiple (128) and the
# set is big enough that the flat kernels tile well.
# ---------------------------------------------------------------------------

_FLAT_MIN_VIRT = 512


def flat_eligible(edges: "EdgeSet", batch_size: int, h: int) -> bool:
    """Whether the flat-lane kernel path applies to this edge set."""
    import os

    if os.environ.get("NLT_NO_FLAT"):
        return False
    return (
        bool(edges.dense_k)
        and _pallas_mode() != "off"
        and (batch_size * h) % 128 == 0
        and edges.num_virt >= _FLAT_MIN_VIRT
    )


def _einsum_f32acc(spec, x, w, compute_dtype=None):
    """einsum with optional low-precision inputs and fp32 accumulation.
    CPU's dot thunk lacks BF16xBF16->F32 for these contractions, so the
    cast-down only happens on accelerators (tests run the f32 math)."""
    if compute_dtype is not None and jax.default_backend() != "cpu":
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    else:
        x = x.astype(jnp.float32)
        w = w.astype(jnp.float32)
    return jnp.einsum(spec, x, w, preferred_element_type=jnp.float32)


def node_transform_flat(x, w, compute_dtype=None):
    """(B, N, h_in) @ (h_in, h_out) -> flat (N, B*h_out).

    The transpose to node-major is fused into the matmul output (einsum
    'bnh,hk->nbk'), measured faster than matmul-then-transpose."""
    t = _einsum_f32acc("bnh,hk->nbk", x, w, compute_dtype)
    return t.reshape(t.shape[0], t.shape[1] * t.shape[2])


def node_transform_from_flat(x_f, w, batch_size: int, compute_dtype=None):
    """Flat (N, B*h_in) @ kron(I_B, w) -> flat (N, B*h_out): per-batch-group
    transform of an already-flat node array (4x the naive FLOPs from the
    kron zero blocks, but stays in flat layout with no transpose)."""
    wk = jnp.kron(
        jnp.eye(batch_size, dtype=jnp.float32), w.astype(jnp.float32)
    )
    if compute_dtype is not None and jax.default_backend() != "cpu":
        x_f = x_f.astype(compute_dtype)
        wk = wk.astype(compute_dtype)
    else:
        x_f = x_f.astype(jnp.float32)
    return jnp.dot(x_f, wk, preferred_element_type=jnp.float32)


def apply_mlp_concat_flat(params: dict, parts: list, *, compute_dtype=None):
    """apply_mlp_concat emitting flat (N, B*h) node-major output.

    parts: (B, N, d_i) batched or (N, d_i) shared-across-batch arrays.
    The first layer decomposes per part; every matmul writes node-major
    ('bnd,dk->nbk'), so no (B, N, h) intermediate or transpose is ever
    materialized. Math matches apply_mlp_concat (fp32 accumulation,
    LN over each batch group's h lanes)."""
    layers = params["layers"]
    w0 = layers[0]["w"]
    b0 = layers[0]["b"]
    offset = 0
    acc = None
    for p in parts:
        d = p.shape[-1]
        w_slice = w0[offset:offset + d]
        if p.ndim == 3:
            t = _einsum_f32acc("bnd,dk->nbk", p, w_slice, compute_dtype)
        else:
            t = _einsum_f32acc("nd,dk->nk", p, w_slice,
                               compute_dtype)[:, None, :]
        acc = t if acc is None else acc + t
        offset += d
    x = acc + b0.astype(jnp.float32)  # (N, B, h)
    for i in range(1, len(layers)):
        x = jax.nn.silu(x)
        x = (
            _einsum_f32acc("nbk,kj->nbj", x, layers[i]["w"], compute_dtype)
            + layers[i]["b"].astype(jnp.float32)
        )
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if params["ln"] is not None:
        from .mlp import layer_norm as _ln

        x = _ln(x, params["ln"]["scale"], params["ln"]["bias"])
    N, B, h = x.shape
    return x.reshape(N, B * h)


def unflatten_nodes(x_f, batch_size: int):
    """(N, B*h) -> (B, N, h)."""
    N, W = x_f.shape
    h = W // batch_size
    return jnp.transpose(x_f.reshape(N, batch_size, h), (1, 0, 2))


def flatten_nodes(x):
    """(B, N, h) -> (N, B*h)."""
    B, N, h = x.shape
    return jnp.transpose(x, (1, 0, 2)).reshape(N, B * h)


def expand_edge_rep(edges: "EdgeSet", emb, batch_size: int):
    """Initial edge representation for update_edges GNN stacks, in the
    layout apply_interaction_net will use: flat (M, B*h) lane-tiled when
    the flat path applies, else batched (..., M, h). Split sets take and
    return (interior, frontier) pairs; the frontier rides the interior's
    layout so the two folds sum without a transpose."""
    if edges.frontier is not None:
        emb_i, emb_f = emb
        if flat_eligible(edges, batch_size, emb_i.shape[-1]):
            return (jnp.tile(emb_i, (1, batch_size)),
                    jnp.tile(emb_f, (1, batch_size)))
        return (
            jnp.broadcast_to(emb_i[None], (batch_size,) + emb_i.shape),
            jnp.broadcast_to(emb_f[None], (batch_size,) + emb_f.shape),
        )
    if flat_eligible(edges, batch_size, emb.shape[-1]):
        return jnp.tile(emb, (1, batch_size))
    return jnp.broadcast_to(emb[None], (batch_size,) + emb.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _gather_rows_T(table, senders, t_slots, t_mask_p, t_virt_to_rec,
                   t_rec_slots, t_rec_mask,
                   num_send: int, t_num_virt: int, t_k: int,
                   t_virt_identity: bool):
    """jnp.take(table, senders, axis=0) whose backward is scatter-free.

    The VJP of a row gather is a scatter-add into the table — the TPU's
    weak spot (XLA lowers it orders of magnitude below gather speed). With
    the transposed dense layout (t_slots: per-sender edge-slot ids in
    K-capped virtual rows), the backward becomes
        d_table = fold(masked-sum_k take(d_out, t_slots))
    — the same dense gather+fold pattern the forward aggregation uses.
    t_rec_slots/t_rec_mask (the transposed set's static fold layout, may
    be None) keep the final virt->sender fold gather-based too."""
    return jnp.take(table, senders, axis=0)


def _gather_rows_T_fwd(table, senders, t_slots, t_mask_p, t_virt_to_rec,
                       t_rec_slots, t_rec_mask,
                       num_send, t_num_virt, t_k, t_virt_identity):
    return jnp.take(table, senders, axis=0), (
        senders, t_slots, t_mask_p, t_virt_to_rec, t_rec_slots, t_rec_mask
    )


def _gather_rows_T_bwd(num_send, t_num_virt, t_k, t_virt_identity, res,
                       d_out):
    senders, t_slots, t_mask_p, t_virt_to_rec, t_rec_slots, t_rec_mask = res
    # per-k gather-accumulate instead of one (Nv_T * K_T, W) take + fold:
    # XLA materializes the big take output in HBM before the masked sum,
    # while K_T smaller gathers fuse into the accumulation (measured
    # 4.73 -> 2.89 ms on the MEPS m2g set, probes/tgather_fold.py)
    slots = t_slots.reshape(t_num_virt, t_k)
    masks = t_mask_p.reshape(t_num_virt, t_k)
    virt = None
    for k in range(t_k):
        part = jnp.take(d_out, slots[:, k], axis=0) * masks[:, k][:, None]
        virt = part if virt is None else virt + part
    if t_virt_identity and t_num_virt >= num_send:
        d_table = jax.lax.slice_in_dim(virt, 0, num_send, axis=0)
    elif t_rec_slots is not None:
        d_table = _rec_fold(virt, t_rec_slots, t_rec_mask)
    else:
        d_table = jax.ops.segment_sum(
            virt, t_virt_to_rec, num_segments=num_send,
            indices_are_sorted=True,
        ).astype(d_out.dtype)

    def _int0(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (d_table.astype(d_out.dtype), _int0(senders), _int0(t_slots),
            jnp.zeros_like(t_mask_p), _int0(t_virt_to_rec),
            None if t_rec_slots is None else _int0(t_rec_slots),
            None if t_rec_mask is None else jnp.zeros_like(t_rec_mask))


_gather_rows_T.defvjp(_gather_rows_T_fwd, _gather_rows_T_bwd)


def gather_send_flat(table, edges: "EdgeSet"):
    """Sender-row gather for the flat path; scatter-free backward when the
    edge set carries a transposed dense layout.

    Contract: the cotangent arriving at masked padding slots must be zero.
    Every in-model consumer guarantees this — padded messages are masked in
    all aggregations and the final edge state of update_edges stacks is
    dropped, so zero cotangents propagate to padded slots by induction.
    Synthetic losses that sum raw edge outputs over padding slots would
    violate it (multiply by `edges.mask` first)."""
    t = edges.transposed
    if t is None:
        return jnp.take(table, edges.senders, axis=0)
    return _gather_rows_T(
        table, edges.senders, t.senders,
        t.mask.reshape(t.num_virt, t.dense_k), t.virt_to_rec,
        t.rec_slots, t.rec_mask,
        edges.num_send, t.num_virt, t.dense_k, t.virt_identity,
    )


# which backward branch _decode_win_bwd last took, keyed by trace events
# (incremented during VJP tracing, i.e. also under jax.eval_shape)
DECODE_BWD_PATH = {"last": None, "analytic": 0, "fallback": 0}


def _decode_win_impl(K, wrows, tile_v, interp, ops, windows=None):
    from .pallas_grid_update import grid_update_flat_win

    return grid_update_flat_win(
        ops["send_tf"], ops["ew"], ops["ge_f"], ops["mask_p"], ops["pp"],
        K, ops["win"], wrows, tile_v, interpret=interp,
        consts=ops["consts"], windows=windows,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _decode_win_vjp(K, wrows, tile_v, interp, ops):
    return _decode_win_impl(K, wrows, tile_v, interp, ops)


def _decode_win_fwd(K, wrows, tile_v, interp, ops):
    # gather the per-tile windows ONCE; the backward reuses them as a
    # residual instead of re-running the take (the windowed backward
    # reconstructs the primal from the same windows, so this is exact)
    windows = jnp.take(ops["send_tf"], ops["win"]["win_rows"], axis=0)
    out = _decode_win_impl(K, wrows, tile_v, interp, ops, windows)
    return out, (ops, windows)


def _decode_win_bwd(K, wrows, tile_v, interp, res, d_out):
    """Backward of the windowed fused decoder.

    Fast path: the analytic windowed backward kernel
    (`grid_update_flat_win_bwd`) — gather and its transpose stay fused
    in-kernel, so training never materializes the (M, W) gathered rows,
    and the gradients are exactly those of the windowed primal (same
    bf16x2 one-hot reconstruct). Fallback (no fold layout / unusual
    shapes / NLT_NO_WIN_BWD): the composed VJP of the UN-windowed pair
    (XLA row gather -> grid_update_flat); there the windowed forward
    kernel is still the live primal and the gradients are those of the
    un-windowed function — a ~1e-6-relative (bf16x2 rounding)
    inconsistency we accept."""
    from .pallas_grid_update import grid_update_flat, grid_update_flat_win_bwd

    ops, windows = res
    edges = ops["edges"]
    mask_p = ops["mask_p"]
    consts = ops["consts"]

    grads = grid_update_flat_win_bwd(
        ops["send_tf"], ops["ew"], ops["ge_f"], mask_p, ops["pp"], K,
        ops["win"], wrows, tile_v, d_out, interpret=interp, consts=consts,
        windows=windows,
    )
    # trace-time telemetry: the analytic-vs-fallback decision is made in
    # Python during VJP tracing, so tests can assert the fast path engages
    # at production layouts (a silent layout regression would otherwise
    # re-triple the backward cost unnoticed — see
    # tests/test_flat_ops.py::test_win_bwd_fast_path_engages_at_bench_shape)
    DECODE_BWD_PATH["analytic" if grads is not None else "fallback"] += 1
    DECODE_BWD_PATH["last"] = "analytic" if grads is not None else "fallback"
    if grads is not None:
        d_st, d_ew, d_ge, d_pp = grads
    else:
        # arg order (st, ew, ge, pp) deliberately mirrors
        # grid_update_flat_win_bwd's return order so both branches unpack
        # into identical names in identical positions
        def ref(st, ew, ge, pp):
            g = gather_send_flat(st, edges)
            return grid_update_flat(g, ew, ge, mask_p, pp, K, interp,
                                    consts=consts)

        _, vjp = jax.vjp(ref, ops["send_tf"], ops["ew"], ops["ge_f"],
                         ops["pp"])
        d_st, d_ew, d_ge, d_pp = vjp(d_out)

    def z(x):
        if x is None:
            return None
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(np.shape(x), dtype=jax.dtypes.float0)

    ct = jax.tree_util.tree_map(z, ops)
    ct["send_tf"], ct["ge_f"], ct["ew"], ct["pp"] = d_st, d_ge, d_ew, d_pp
    return (ct,)


_decode_win_vjp.defvjp(_decode_win_fwd, _decode_win_bwd)


def decode_grid_fused(send_tf, ge_f, ew, edges: "EdgeSet", pp, consts,
                      win_arrays, win_static):
    """Fused m2g decoder with the sender gather inside the kernel.

    Same math as gather_send_flat + grid_update_flat but the forward never
    materializes the (M, W) gathered sender rows in HBM — the kernel
    reconstructs each tile's rows from a narrow window of the (num_send,
    W) table with a one-hot MXU matmul (ops/pallas_grid_update.py:
    `_grid_update_win_kernel`). `win_arrays`/`win_static` come from
    `prep_window_gather` (host-side, per graph)."""
    mask_p = edges.mask.reshape(edges.num_virt, edges.dense_k)
    interp = _pallas_mode() == "interpret"
    ops = {
        "send_tf": send_tf, "ge_f": ge_f, "ew": ew, "mask_p": mask_p,
        "pp": pp, "consts": consts, "win": win_arrays, "edges": edges,
    }
    return _decode_win_vjp(edges.dense_k, win_static["wrows"],
                           win_static["tile_v"], interp, ops)


# which backward branch _edge_win_bwd last took (same telemetry contract
# as DECODE_BWD_PATH)
EDGE_WIN_BWD_PATH = {"last": None, "analytic": 0, "fallback": 0}


def window_layout_ok(edges: "EdgeSet", win_arrays, win_static) -> bool:
    """A window layout must match the runtime edge set exactly — a graph
    swapped via with_arrays with coincidentally matching shapes would
    otherwise gather wrong rows (jnp.take clips, no error)."""
    return (
        win_arrays is not None and win_static is not None
        and win_static["num_virt"] == edges.num_virt
        and win_static["dense_k"] == edges.dense_k
        and win_static["num_send"] == edges.num_send
        and win_arrays["sl_local"].shape[0]
        == edges.num_virt * edges.dense_k
        and edges.num_virt % win_static["tile_v"] == 0
    )


def _edge_win_impl(K, wrows, tile_v, interp, ops, windows=None):
    from .pallas_edge_flat import edge_layer_flat_win

    return edge_layer_flat_win(
        ops["edge_rep"], ops["send_tf"], ops["rec_rows"], ops["mask_p"],
        ops["w_e"], ops["b0"], ops["w2"], ops["b2"], ops["ls"], ops["lb"],
        K, ops["win"], wrows, tile_v, interpret=interp,
        consts=ops["consts"], windows=windows,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _edge_win_vjp(K, wrows, tile_v, interp, ops):
    return _edge_win_impl(K, wrows, tile_v, interp, ops)


def _edge_win_fwd(K, wrows, tile_v, interp, ops):
    # windows gathered once, reused by the backward (see _decode_win_fwd)
    windows = jnp.take(ops["send_tf"], ops["win"]["win_rows"], axis=0)
    out = _edge_win_impl(K, wrows, tile_v, interp, ops, windows)
    return out, (ops, windows)


def _edge_win_bwd(K, wrows, tile_v, interp, res, grads):
    """Backward of the windowed fused edge layer.

    Fast path: the analytic windowed backward kernel
    (`edge_layer_flat_win_bwd`) — gather and transpose stay fused, so
    training never materializes the (M, W) gathered rows. Fallback (no
    fold layout / NLT_NO_WIN_BWD): the composed VJP of the un-windowed
    pair (XLA row gather -> edge_layer_flat); gradients then differ from
    the windowed primal by the bf16x2 reconstruct rounding (~1e-6
    relative), the same accepted inconsistency as `_decode_win_bwd`."""
    from .pallas_edge_flat import edge_layer_flat, edge_layer_flat_win_bwd

    ops, windows = res
    edges = ops["edges"]
    out = edge_layer_flat_win_bwd(
        ops["edge_rep"], ops["send_tf"], ops["rec_rows"], ops["mask_p"],
        ops["w_e"], ops["b0"], ops["w2"], ops["b2"], ops["ls"], ops["lb"],
        K, ops["win"], wrows, tile_v, grads, interpret=interp,
        consts=ops["consts"], windows=windows,
    )
    EDGE_WIN_BWD_PATH["analytic" if out is not None else "fallback"] += 1
    EDGE_WIN_BWD_PATH["last"] = "analytic" if out is not None else "fallback"
    if out is not None:
        d_e, d_st, d_rec, d_w_e, d_b0, d_w2, d_b2, d_ls, d_lb = out
    else:
        def ref(edge_rep, st, rec_rows, w_e, b0, w2, b2, ls, lb):
            g = gather_send_flat(st, edges)
            return edge_layer_flat(
                edge_rep, g, rec_rows, ops["mask_p"], w_e, b0, w2, b2,
                ls, lb, K, interp, consts=ops["consts"],
            )

        _, vjp = jax.vjp(ref, ops["edge_rep"], ops["send_tf"],
                         ops["rec_rows"], ops["w_e"], ops["b0"], ops["w2"],
                         ops["b2"], ops["ls"], ops["lb"])
        d_e, d_st, d_rec, d_w_e, d_b0, d_w2, d_b2, d_ls, d_lb = vjp(grads)

    def z(x):
        if x is None:
            return None
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(np.shape(x), dtype=jax.dtypes.float0)

    ct = jax.tree_util.tree_map(z, ops)
    ct["edge_rep"], ct["send_tf"], ct["rec_rows"] = d_e, d_st, d_rec
    ct["w_e"], ct["b0"], ct["w2"], ct["b2"] = d_w_e, d_b0, d_w2, d_b2
    ct["ls"], ct["lb"] = d_ls, d_lb
    return (ct,)


_edge_win_vjp.defvjp(_edge_win_fwd, _edge_win_bwd)


def edge_layer_fused_win(edge_mlp_params: dict, edges: "EdgeSet",
                         edge_rep_flat, send_tf, rec_rows, consts,
                         win_arrays, win_static):
    """Fused residual edge layer with the sender gather inside the kernel.

    Same math as gather_send_flat + edge_layer_flat but the forward never
    materializes the (M, W) gathered sender rows in HBM — the kernel
    reconstructs each tile's rows from a narrow window of the (num_send,
    W) sender-transform table (ops/pallas_edge_flat.py:
    `_layer_flat_win_kernel`). Used for processor (m2m) rounds where both
    endpoints sit in spatial-locality order. `win_arrays`/`win_static`
    come from `prep_window_gather` (host-side, per edge set)."""
    layers = edge_mlp_params["layers"]
    w0, b0 = layers[0]["w"], layers[0]["b"]
    h = w0.shape[0] // 3
    ln = edge_mlp_params["ln"]
    ops = {
        "edge_rep": edge_rep_flat, "send_tf": send_tf,
        "rec_rows": rec_rows,
        "mask_p": edges.mask.reshape(edges.num_virt, edges.dense_k),
        "w_e": w0[:h], "b0": b0, "w2": layers[1]["w"], "b2": layers[1]["b"],
        "ls": ln["scale"], "lb": ln["bias"],
        "consts": consts, "win": win_arrays, "edges": edges,
    }
    return _edge_win_vjp(edges.dense_k, win_static["wrows"],
                         win_static["tile_v"], _pallas_mode() == "interpret",
                         ops)


def _gather_virt_rows_flat(rec_tf, edges: "EdgeSet"):
    """Flat (N_rec, W) -> (N_virt, W) virtual-row receiver transforms."""
    if edges.virt_identity:
        extra = edges.num_virt - edges.num_rec
        if extra == 0:
            return rec_tf
        last = jnp.broadcast_to(rec_tf[-1:], (extra, rec_tf.shape[-1]))
        return jnp.concatenate([rec_tf, last], axis=0)
    return jnp.take(rec_tf, edges.virt_to_rec, axis=0)


def _fold_virt_flat(edges: "EdgeSet", virt_f):
    """(N_virt, W) virtual-row sums -> (N_rec, W) receiver sums."""
    if edges.virt_identity:
        return jax.lax.slice_in_dim(virt_f, 0, edges.num_rec, axis=0)
    if edges.rec_slots is not None:
        return _rec_fold(virt_f, edges.rec_slots, edges.rec_mask)
    return jax.ops.segment_sum(
        virt_f, edges.virt_to_rec, num_segments=edges.num_rec,
        indices_are_sorted=True,
    )


def _rec_fold(virt_f, rec_slots, rec_mask):
    """Gather-based virt->receiver fold: R masked row gathers (XLA lowers
    the equivalent sorted segment-sum to scatter-add, far off gather
    speed on TPU)."""
    out = None
    for j in range(rec_slots.shape[1]):
        part = jnp.take(virt_f, rec_slots[:, j], axis=0) \
            * rec_mask[:, j][:, None]
        out = part if out is None else out + part
    return out


def _virt_counts_flat(edges: "EdgeSet"):
    """(N_rec, 1) real in-degree per receiver (min 1)."""
    per_virt = edges.mask.reshape(edges.num_virt, edges.dense_k).sum(
        axis=-1, keepdims=True
    )
    return jnp.maximum(_fold_virt_flat(edges, per_virt), 1.0)


def _aggr_mlp_mixed(params: dict, rec_rep, aggregated_f, compute_dtype=None):
    """AggrMLP(concat(rec_rep, aggregated)) with rec_rep in (B, N, h) and
    aggregated in flat (N, B*h) — the flat->batched transpose is fused into
    the first-layer matmul (einsum 'nbk,kj->bnj')."""
    w0 = params["layers"][0]["w"]
    b0 = params["layers"][0]["b"]
    d = rec_rep.shape[-1]
    B = rec_rep.shape[0]
    N = rec_rep.shape[1]
    agg3 = aggregated_f.reshape(N, B, d)
    w_r, w_a = w0[:d], w0[d:]
    if compute_dtype is not None:
        rec_rep = rec_rep.astype(compute_dtype)
        w_r = w_r.astype(compute_dtype)
    x = (
        jnp.dot(rec_rep, w_r, preferred_element_type=jnp.float32)
        + _einsum_f32acc("nbk,kj->bnj", agg3, w_a, compute_dtype)
        + b0.astype(jnp.float32)
    )
    return finish_mlp(params, x, compute_dtype=compute_dtype)


def edge_round_flat(edge_mlp_params: dict, edges: "EdgeSet", send_rep,
                    rec_rep, edge_rep_flat=None, *, ew=None,
                    compute_dtype=None, consts=None, send_tf=None,
                    win=None):
    """One flat-lane edge-MLP round: (edge_out_flat | None, virt_flat).

    rec_rep in (B, N, h); send_rep either (B, N, h) batched or already
    flat (N_send, B*h) node-major (2-dim). Edge state either static `ew`
    (M, h) (rollout-invariant GNNs) or evolving flat `edge_rep_flat`
    (M, B*h). consts: optional scan-hoisted widened kernel params
    (pallas_edge_flat.tail_consts / layer_consts). send_tf: optional
    pre-transformed (and pre-cast) flat sender table (split_send_tf) —
    send_rep is ignored when given. win: optional (win_arrays,
    win_static) window layout for this edge set (prep_window_gather) —
    fuses the sender gather into the edge-layer kernel.
    """
    mode = _pallas_mode()
    interp = mode == "interpret"
    layers = edge_mlp_params["layers"]
    w0, b0 = layers[0]["w"], layers[0]["b"]
    h = w0.shape[0] // 3
    w_e, w_j, w_i = w0[:h], w0[h:2 * h], w0[2 * h:]
    cd = compute_dtype

    if send_tf is None:
        if send_rep.ndim == 2:
            send_tf = node_transform_from_flat(
                send_rep, w_j, rec_rep.shape[0], cd
            )
        else:
            send_tf = node_transform_flat(send_rep, w_j, cd)
        if cd is not None:
            # cast before the big gather: half the bytes moved
            send_tf = send_tf.astype(cd)
    rec_tf = node_transform_flat(rec_rep, w_i, cd)
    if cd is not None:
        rec_tf = rec_tf.astype(cd)
    rec_rows = _gather_virt_rows_flat(rec_tf, edges)
    mask_p = edges.mask.reshape(edges.num_virt, edges.dense_k)
    ln = edge_mlp_params["ln"]

    if edge_rep_flat is not None:
        from .pallas_edge_flat import edge_layer_flat

        if cd is not None:
            edge_rep_flat = edge_rep_flat.astype(cd)
        if (win is not None and mode != "off"
                and window_layout_ok(edges, win[0], win[1])):
            # sender gather fused into the layer kernel (windowed
            # one-hot matmul) — skips the (M, B*h) HBM intermediate
            return edge_layer_fused_win(
                edge_mlp_params, edges, edge_rep_flat, send_tf, rec_rows,
                consts, win[0], win[1],
            )
        gathered = gather_send_flat(send_tf, edges)
        return edge_layer_flat(
            edge_rep_flat, gathered, rec_rows, mask_p, w_e, b0,
            layers[1]["w"], layers[1]["b"], ln["scale"], ln["bias"],
            edges.dense_k, interp, consts=consts,
        )
    gathered = gather_send_flat(send_tf, edges)
    from .pallas_edge_flat import edge_tail_sum_flat

    assert ew is not None, "flat static path requires precomputed ew"
    _, virt = edge_tail_sum_flat(
        gathered, ew, rec_rows, layers[1]["w"], layers[1]["b"],
        ln["scale"], ln["bias"], mask_p, edges.dense_k, interp, False,
        consts=consts,
    )
    return None, virt


def _scatter_to_owner(aggregated, rec_rep, axis_name, agg_axis, rec_axis):
    """Reduce-scatter partial aggregations to the receiver's owner shard
    (half a psum's bytes) and slice rec_rep to the owned rows, so the
    aggr-MLP runs on num_rec / n_shards rows instead of being replicated.
    num_rec must be divisible by the axis size (builder pads). agg_axis /
    rec_axis name the receiver-node dimension in each layout (they differ
    on the flat path: aggregation is (N, B*h), rec_rep is (B, N, h))."""
    n = jax.lax.psum(1, axis_name)
    block = aggregated.shape[agg_axis] // n
    agg = jax.lax.psum_scatter(
        aggregated, axis_name, scatter_dimension=agg_axis, tiled=True
    )
    idx = jax.lax.axis_index(axis_name)
    rec = jax.lax.dynamic_slice_in_dim(rec_rep, idx * block, block,
                                       axis=rec_axis)
    return agg, rec


def _apply_inet_flat(params: dict, edges: "EdgeSet", send_rep, rec_rep,
                     edge_rep_flat=None, *, update_edges, aggr,
                     compute_dtype=None, ew=None, psum_axis=None,
                     psum_mode="allreduce", consts=None, win=None):
    """Flat-lane interaction net round. send_rep/rec_rep in (B, N, h);
    edge state either static `ew` (M, h) or evolving flat `edge_rep_flat`
    (M, B*h). Returns rec_out (B, N_rec, h) and, when update_edges,
    edge_out in flat layout. psum_mode="scatter" (with psum_axis) keeps
    only the owned receiver rows: reduce-scatter + owned-row aggr-MLP."""
    cd = compute_dtype
    edge_out, virt = edge_round_flat(
        params["edge_mlp"], edges, send_rep, rec_rep, edge_rep_flat,
        ew=ew, compute_dtype=cd, consts=consts, win=win,
    )

    aggregated = _fold_virt_flat(edges, virt)
    if psum_axis is not None:
        if callable(psum_mode):
            # custom fold (halo scheme): compact partial -> owned rows
            assert aggr == "sum", "fold modes implement sum aggregation"
            aggregated, rec_rep = psum_mode(
                aggregated, rec_rep, agg_axis=0, rec_axis=1
            )
        elif psum_mode == "scatter":
            assert aggr == "sum", "scatter mode implements sum aggregation"
            aggregated, rec_rep = _scatter_to_owner(
                aggregated, rec_rep, psum_axis, agg_axis=0, rec_axis=1
            )
        else:
            aggregated = jax.lax.psum(aggregated, psum_axis)
    if aggr == "mean":
        aggregated = aggregated / _virt_counts_flat(edges)
    rec_out = rec_rep + _aggr_mlp_mixed(
        params["aggr_mlp"], rec_rep, aggregated, compute_dtype=cd
    )
    if update_edges:
        return rec_out, edge_out
    return rec_out


def _gather_virt_rows(rec_t, edges: "EdgeSet"):
    """rec_t rows for each virtual row: identity layouts turn the gather
    into pad-with-last-row (padding rows map to receiver num_rec-1)."""
    if edges.virt_identity:
        extra = edges.num_virt - edges.num_rec
        if extra == 0:
            return rec_t
        last = rec_t[..., -1:, :]
        reps = jnp.broadcast_to(
            last, rec_t.shape[:-2] + (extra, rec_t.shape[-1])
        )
        return jnp.concatenate([rec_t, reps], axis=-2)
    return gather_rows_batched(rec_t, edges.virt_to_rec)




def edge_messages_and_virt(edge_mlp_params: dict, edges: EdgeSet, send_rep,
                           rec_rep, edge_rep=None, *, compute_dtype=None,
                           with_messages: bool = True, ew=None):
    """Messages + dense virtual-row sums for one dense-layout edge set.

    Uses the fused Pallas tail kernel when eligible; otherwise the
    decomposed XLA path. Pass `ew` = edge_feat_emb @ W_e + b0 (M, d),
    precomputed once per rollout, instead of `edge_rep` for GNNs whose edge
    representations don't evolve. Returns (messages | None, virt).
    """
    assert edges.dense_k, "dense layout required"
    mode = _pallas_mode()
    K = edges.dense_k
    layers = edge_mlp_params["layers"]
    w0, b0 = layers[0]["w"], layers[0]["b"]
    d = w0.shape[0] // 3
    w_e, w_j, w_i = w0[:d], w0[d:2 * d], w0[2 * d:]

    def mm(x, w):
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    send_t = mm(send_rep, w_j)
    rec_t = mm(rec_rep, w_i)
    fusable = (mode != "off" and len(layers) == 2
               and edge_mlp_params["ln"] is not None and send_t.ndim == 3)
    if fusable and compute_dtype is not None:
        # cast before the big gather: half the bytes moved
        send_t = send_t.astype(compute_dtype)
        rec_t = rec_t.astype(compute_dtype)
    rec_rows = _gather_virt_rows(rec_t, edges)
    gathered = gather_rows_batched(send_t, edges.senders)
    if fusable and ew is not None and ew.ndim == 2:
        # static per-edge product available: fully fused tail, x0 never
        # materialized
        from .pallas_edge import edge_tail_sum

        return edge_tail_sum(
            gathered, ew, rec_rows, layers[1]["w"], layers[1]["b"],
            edge_mlp_params["ln"]["scale"], edge_mlp_params["ln"]["bias"],
            edges.mask, K, mode == "interpret", with_messages,
        )
    if ew is None:
        ew = mm(edge_rep, w_e) + b0
    x0 = (
        ew
        + gathered
        + jnp.repeat(rec_rows, K, axis=-2)
    )
    if fusable:
        from .pallas_edge import edge_tail

        return edge_tail(
            x0, layers[1]["w"], layers[1]["b"],
            edge_mlp_params["ln"]["scale"], edge_mlp_params["ln"]["bias"],
            edges.mask, K, mode == "interpret", with_messages,
        )
    # XLA tail
    x = x0
    for i in range(1, len(layers)):
        x = jax.nn.silu(x)
        x = mm(x, layers[i]["w"]) + layers[i]["b"].astype(jnp.float32)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if edge_mlp_params["ln"] is not None:
        x = layer_norm(x, edge_mlp_params["ln"]["scale"],
                       edge_mlp_params["ln"]["bias"])
    messages = x
    masked = messages * edges.mask
    virt = masked.reshape(
        messages.shape[:-2] + (edges.num_virt, K, messages.shape[-1])
    ).sum(axis=-2)
    return (messages if with_messages else None), virt


def _fold_virt(edges: EdgeSet, virt):
    """(..., N_virt, d) virtual-row sums -> (..., N_rec, d) receiver sums."""
    if edges.virt_identity:
        return jax.lax.slice_in_dim(virt, 0, edges.num_rec, axis=-2)
    return segment_sum(
        virt, edges.virt_to_rec, edges.num_rec, sorted_ids=True
    )


def _virt_counts(edges: EdgeSet):
    """Real in-degree per receiver (for mean aggregation), min 1."""
    counts = _fold_virt(
        edges,
        edges.mask.reshape(edges.num_virt, edges.dense_k).sum(
            axis=-1, keepdims=True
        ),
    )[..., 0]
    return jnp.maximum(counts, 1.0)


def init_interaction_net(key, input_dim: int, *, hidden_layers: int = 1,
                         hidden_dim: int | None = None, dtype=jnp.float32) -> dict:
    """Parameters for one interaction net: edge MLP (3d in) + aggr MLP (2d in).

    Recipes per ref: neural_lam/interaction_net.py:65-66.
    """
    if hidden_dim is None:
        hidden_dim = input_dim
    k1, k2 = jax.random.split(key)
    edge_recipe = [3 * input_dim] + [hidden_dim] * (hidden_layers + 1)
    aggr_recipe = [2 * input_dim] + [hidden_dim] * (hidden_layers + 1)
    return {
        "edge_mlp": init_mlp(k1, edge_recipe, layer_norm=True, dtype=dtype),
        "aggr_mlp": init_mlp(k2, aggr_recipe, layer_norm=True, dtype=dtype),
    }


def _edge_mlp_decomposed(params: dict, edges: EdgeSet, send_rep, rec_rep,
                         edge_rep, *, compute_dtype=None):
    """EdgeMLP with the first layer decomposed into per-node transforms."""
    layers = params["layers"]
    w0, b0 = layers[0]["w"], layers[0]["b"]
    d = edge_rep.shape[-1]
    w_e, w_j, w_i = w0[:d], w0[d : 2 * d], w0[2 * d :]

    def mm(x, w):
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    send_t = mm(send_rep, w_j)  # (..., N_send, h)
    rec_t = mm(rec_rep, w_i)  # (..., N_rec, h)
    if edges.dense_k:
        # receiver rows are consecutive K-blocks: gather the (small) virtual
        # row set, then a free broadcast-repeat instead of a big gather
        rec_rows = _gather_virt_rows(rec_t, edges)
        rec_gathered = jnp.repeat(rec_rows, edges.dense_k, axis=-2)
    else:
        rec_gathered = jnp.take(rec_t, edges.receivers, axis=-2)
    send_gathered = (
        gather_rows_batched(send_t, edges.senders)
        if send_t.ndim == 3
        else jnp.take(send_t, edges.senders, axis=-2)
    )
    x = (
        mm(edge_rep, w_e)
        + send_gathered
        + rec_gathered
        + b0.astype(jnp.float32)
    )  # (..., M, h)
    n = len(layers)
    for i in range(1, n):
        x = jax.nn.silu(x)
        x = mm(x, layers[i]["w"]) + layers[i]["b"].astype(jnp.float32)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if params["ln"] is not None:
        x = layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
    return x


def _apply_inet_split(params: dict, edges: EdgeSet, send: SplitSend,
                      rec_rep, edge_rep=None, *, update_edges: bool,
                      aggr: str, compute_dtype=None, ew=None, consts=None):
    """Split (interior/frontier) interaction-net round for sharded
    receiver-owned edge sets (see `SplitSend`). The interior round reads
    only `send.owned`; the frontier round is the sole consumer of
    `send.imports`, so the collective producing it can overlap the (much
    larger) interior edge kernel. The message set is identical to the
    unsplit chunk's — only the association order of the receiver sum
    changes (fp-level difference).

    edge_rep / ew / the returned edge state are (interior, frontier)
    pairs; the frontier uses the interior's layout (flat or batched).
    Receiver aggregation is shard-local (receiver-owned chunks), so no
    psum modes appear here."""
    fr = edges.frontier
    assert fr is not None, "split round requires edges.frontier"
    assert aggr == "sum", "split sets implement sum aggregation"
    cd = compute_dtype
    er_i = er_f = None
    if edge_rep is not None:
        er_i, er_f = edge_rep
    ew_i = ew_f = None
    if ew is not None:
        ew_i, ew_f = ew
    B, h = rec_rep.shape[0], rec_rep.shape[-1]
    layers = params["edge_mlp"]["layers"]
    two_layer_ln = len(layers) == 2 and params["edge_mlp"]["ln"] is not None
    flat = (
        two_layer_ln
        and flat_eligible(edges, B, h)
        and ((er_i is not None and er_i.ndim == 2)
             or (er_i is None and ew_i is not None and ew_i.ndim == 2))
    )
    if flat:
        # transform-then-gather: owned rows transformed once per shard,
        # the collective (when lazy) moves the transformed table
        tf_o, tf_i = split_send_tf(params["edge_mlp"], send, B, cd)
        eo_i, virt_i = edge_round_flat(
            params["edge_mlp"], edges, None, rec_rep, er_i,
            ew=ew_i, compute_dtype=cd, consts=consts, send_tf=tf_o,
        )
        eo_f, virt_f = edge_round_flat(
            params["edge_mlp"], fr, None, rec_rep, er_f,
            ew=ew_f, compute_dtype=cd, consts=consts, send_tf=tf_i,
        )
        aggregated = (_fold_virt_flat(edges, virt_i)
                      + _fold_virt_flat(fr, virt_f))
        rec_out = rec_rep + _aggr_mlp_mixed(
            params["aggr_mlp"], rec_rep, aggregated, compute_dtype=cd
        )
    else:
        m_i, virt_i = edge_messages_and_virt(
            params["edge_mlp"], edges, send.owned, rec_rep, er_i,
            compute_dtype=cd, with_messages=update_edges, ew=ew_i,
        )
        m_f, virt_f = edge_messages_and_virt(
            params["edge_mlp"], fr, send.imports, rec_rep, er_f,
            compute_dtype=cd, with_messages=update_edges, ew=ew_f,
        )
        aggregated = _fold_virt(edges, virt_i) + _fold_virt(fr, virt_f)
        rec_out = rec_rep + apply_mlp_concat(
            params["aggr_mlp"], [rec_rep, aggregated],
            compute_dtype=cd,
        )
        eo_i = None if m_i is None else er_i + m_i
        eo_f = None if m_f is None else er_f + m_f
    if update_edges:
        return rec_out, (eo_i, eo_f)
    return rec_out


def apply_interaction_net(params: dict, edges: EdgeSet, send_rep, rec_rep,
                          edge_rep=None, *, update_edges: bool = True,
                          aggr: str = "sum", use_gather_table: bool = True,
                          compute_dtype=None, ew=None, psum_axis=None,
                          psum_mode="allreduce", consts=None, win=None):
    # psum_axis: inside shard_map, combine per-shard partial aggregations
    # over this mesh axis (spatially partitioned sender edges).
    # psum_mode="scatter": reduce-scatter the partials to the receiver's
    # owner shard instead (half the bytes), slice rec_rep to the owned
    # rows and return OWNED rec_out — the mesh-node-sharded scheme.
    """One interaction-net round; see module docstring for the math.

    send_rep: (..., N_send, d)   rec_rep: (..., N_rec, d)
    edge_rep: (..., M, d)
    Returns rec_out (and edge_out when update_edges).
    """
    assert aggr in ("sum", "mean"), f"Unknown aggregation method: {aggr}"
    if isinstance(send_rep, _SPLIT_SEND_TYPES):
        assert psum_axis is None, (
            "split sets are receiver-owned: aggregation is shard-local"
        )
        return _apply_inet_split(
            params, edges, send_rep, rec_rep, edge_rep,
            update_edges=update_edges, aggr=aggr,
            compute_dtype=compute_dtype, ew=ew, consts=consts,
        )
    assert edges.frontier is None, (
        "edge set has a frontier split: pass a SplitSend sender table"
    )
    mode = _pallas_mode()
    if edges.dense_k:
        layers = params["edge_mlp"]["layers"]
        two_layer_ln = (
            len(layers) == 2 and params["edge_mlp"]["ln"] is not None
        )
        if two_layer_ln and send_rep.ndim == 3:
            B, h = send_rep.shape[0], send_rep.shape[-1]
            # the flat path takes either a flat (M, B*h) evolving edge
            # state (updated when update_edges, read-only otherwise —
            # e.g. hierarchical read-out sweeps) or a static ew (M, h)
            flat_edge = (
                edge_rep if (edge_rep is not None and edge_rep.ndim == 2
                             and edge_rep.shape[-1] == B * h)
                else None
            )
            static_ew = (ew if (not update_edges and flat_edge is None
                                and ew is not None and ew.ndim == 2)
                         else None)
            if ((flat_edge is not None or static_ew is not None)
                    and flat_eligible(edges, B, h)):
                return _apply_inet_flat(
                    params, edges, send_rep, rec_rep, flat_edge,
                    update_edges=update_edges, aggr=aggr,
                    compute_dtype=compute_dtype, ew=static_ew,
                    psum_axis=psum_axis, psum_mode=psum_mode, consts=consts,
                    win=win,
                )
        fused_layer = (
            update_edges and mode != "off"
            and len(layers) == 2 and params["edge_mlp"]["ln"] is not None
            and send_rep.ndim == 3
        )
        if fused_layer:
            # full fused layer: ew matmul + (gather) + tail + edge residual
            # all inside the kernel
            from .pallas_edge import edge_layer

            w0, b0 = layers[0]["w"], layers[0]["b"]
            d = w0.shape[0] // 3
            w_e, w_j, w_i = w0[:d], w0[d:2 * d], w0[2 * d:]
            send_t = jnp.dot(send_rep, w_j,
                             preferred_element_type=jnp.float32)
            rec_t = jnp.dot(rec_rep, w_i,
                            preferred_element_type=jnp.float32)
            if compute_dtype is not None:
                send_t = send_t.astype(compute_dtype)
                rec_t = rec_t.astype(compute_dtype)
                edge_rep = edge_rep.astype(compute_dtype)
            rec_rows = _gather_virt_rows(rec_t, edges)
            in_gather = False  # scalar-loop VMEM gather measured slower than XLA pre-gather
            gs = (edges.senders if in_gather
                  else gather_rows_batched(send_t, edges.senders))
            edge_out, virt = edge_layer(
                edge_rep, gs, send_t, rec_rows, edges.mask,
                w_e, b0, layers[1]["w"], layers[1]["b"],
                params["edge_mlp"]["ln"]["scale"],
                params["edge_mlp"]["ln"]["bias"],
                edges.dense_k, in_gather, mode == "interpret",
            )
            messages = None
        else:
            messages, virt = edge_messages_and_virt(
                params["edge_mlp"], edges, send_rep, rec_rep, edge_rep,
                compute_dtype=compute_dtype, with_messages=update_edges,
                ew=ew,
            )
        aggregated = _fold_virt(edges, virt)
        if psum_axis is not None:
            if callable(psum_mode):
                assert aggr == "sum", (
                    "fold modes implement sum aggregation"
                )
                aggregated, rec_rep = psum_mode(
                    aggregated, rec_rep,
                    agg_axis=aggregated.ndim - 2,
                    rec_axis=rec_rep.ndim - 2,
                )
            elif psum_mode == "scatter":
                assert aggr == "sum", (
                    "scatter mode implements sum aggregation"
                )
                aggregated, rec_rep = _scatter_to_owner(
                    aggregated, rec_rep, psum_axis,
                    agg_axis=aggregated.ndim - 2,
                    rec_axis=rec_rep.ndim - 2,
                )
            else:
                aggregated = jax.lax.psum(aggregated, psum_axis)
        if aggr == "mean":
            aggregated = aggregated / _virt_counts(edges)[..., :, None]
        rec_diff = apply_mlp_concat(
            params["aggr_mlp"], [rec_rep, aggregated],
            compute_dtype=compute_dtype,
        )
        rec_out = rec_rep + rec_diff
        if update_edges:
            if fused_layer:
                return rec_out, edge_out
            return rec_out, edge_rep + messages
        return rec_out

    messages = _edge_mlp_decomposed(
        params["edge_mlp"], edges, send_rep, rec_rep, edge_rep,
        compute_dtype=compute_dtype,
    )  # (..., M, d)

    if use_gather_table:
        aggregated = gather_sum(messages, edges.gather_table)
    else:
        aggregated = segment_sum(
            messages, edges.receivers, edges.num_rec, sorted_ids=True
        )
    if psum_axis is not None:
        if callable(psum_mode):
            assert aggr == "sum", "fold modes implement sum aggregation"
            aggregated, rec_rep = psum_mode(
                aggregated, rec_rep,
                agg_axis=aggregated.ndim - 2, rec_axis=rec_rep.ndim - 2,
            )
        elif psum_mode == "scatter":
            assert aggr == "sum", "scatter mode implements sum aggregation"
            aggregated, rec_rep = _scatter_to_owner(
                aggregated, rec_rep, psum_axis,
                agg_axis=aggregated.ndim - 2, rec_axis=rec_rep.ndim - 2,
            )
        else:
            aggregated = jax.lax.psum(aggregated, psum_axis)
    if aggr == "mean":
        counts = jnp.maximum(
            (edges.gather_table < edges.num_edges).sum(axis=-1), 1
        ).astype(messages.dtype)
        aggregated = aggregated / counts[..., :, None]

    rec_diff = apply_mlp_concat(
        params["aggr_mlp"], [rec_rep, aggregated],
        compute_dtype=compute_dtype,
    )
    rec_out = rec_rep + rec_diff
    if update_edges:
        return rec_out, edge_rep + messages
    return rec_out


def init_interaction_net_chunked(key, input_dim: int, n_edge_chunks: int,
                                 n_node_chunks: int, *, hidden_layers: int = 1,
                                 hidden_dim: int | None = None,
                                 dtype=jnp.float32) -> dict:
    """Parameters for a chunked interaction net: one MLP per chunk."""
    if hidden_dim is None:
        hidden_dim = input_dim
    edge_recipe = [3 * input_dim] + [hidden_dim] * (hidden_layers + 1)
    aggr_recipe = [2 * input_dim] + [hidden_dim] * (hidden_layers + 1)
    keys = jax.random.split(key, n_edge_chunks + n_node_chunks)
    return {
        "edge_mlps": [
            init_mlp(keys[i], edge_recipe, layer_norm=True, dtype=dtype)
            for i in range(n_edge_chunks)
        ],
        "aggr_mlps": [
            init_mlp(keys[n_edge_chunks + i], aggr_recipe, layer_norm=True, dtype=dtype)
            for i in range(n_node_chunks)
        ],
    }


