"""Spatial graph parallelism: shard grid nodes across chips.

The scaling axis Neural-LAM lacks (the reference replicates the whole graph
on every device, ref: neural_lam/models/base_graph_model.py:28-33; see
SURVEY.md §5 "long-context"). Design:

* Grid nodes are sharded over the mesh `space` axis in contiguous
  grid_index blocks (x-major ordering makes blocks geometric x-bands).
  All grid-side compute — grid embedder, residual grid MLP, m2g decoder,
  output map, i.e. the dominant FLOPs at N_grid ≈ 10 × N_mesh — runs on
  local rows only and never communicates.
* Mesh node arrays are small (N_mesh ≈ N_grid/10), so mesh node updates are
  computed replicated on every shard, while *edge* work (the per-edge MLPs,
  ≈ 8 edges/node) is partitioned:
    - g2m edges live with their sender's grid block (gather stays local);
      per-shard partial segment-sums into the full mesh array are combined
      with one `psum` over `space`.
    - m2m edges are split into balanced chunks; per-layer partial
      aggregation + `psum`; per-shard edge representations stay resident on
      their shard across processor layers.
    - m2g edges live with their receiver's grid block — with mesh
      representations replicated, messages and aggregation are fully local.
  Total communication per predict_step: (1 + processor_layers) psums of the
  (B, N_mesh, d_h) mesh array over ICI.

Per-shard edge lists are padded to equal static shapes; padding edges point
at a sentinel gather-table slot so they contribute nothing.

This module provides the partition builder and `SpatialGraphLAM`, a GraphLAM
whose predict_step runs under `shard_map` over a ('data', 'space') mesh —
data-parallel batch × spatial grid sharding in one program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph.storage import LoadedGraph
from ..ops.mlp import apply_mlp, layer_norm
from ..ops.segment import gather_sum
from ..models.graph_lam import GraphLAM


def _pad_to(arr, size, axis=0, fill=0):
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, size - arr.shape[axis])
    return np.pad(arr, pad, constant_values=fill)


def _build_shard_tables(shard_edges, n_rows, e_max):
    """Per-shard gather tables over n_rows receivers, sentinel = e_max."""
    from ..ops.segment import build_gather_table

    tables = []
    for recv in shard_edges:
        t, _ = build_gather_table(recv, n_rows)
        t = t.astype(np.int32)
        t[t == len(recv)] = e_max
        tables.append(t)
    k_max = max(t.shape[1] for t in tables)
    return np.stack([_pad_to(t, k_max, axis=1, fill=e_max) for t in tables])


def _build_split_tables(recv_parts, n_rows, ei, ef):
    """Per-shard gather tables for [interior (padded to ei) ++ frontier
    (padded to ef)] edge layouts: entries are COMBINED slot positions
    (frontier edge j sits at ei + j), sentinel = ei + ef (the zero row
    gather_sum appends)."""
    m_tot = ei + ef
    tables = []
    for recv_i, recv_f in recv_parts:
        pos = np.concatenate([
            np.arange(len(recv_i)), ei + np.arange(len(recv_f))
        ]).astype(np.int32)
        recv = np.concatenate([recv_i, recv_f])
        counts = np.bincount(recv, minlength=n_rows) if len(recv) else \
            np.zeros(n_rows, np.int64)
        k = max(int(counts.max()) if len(recv) else 1, 1)
        t = np.full((n_rows, k), m_tot, np.int32)
        if len(recv):
            order = np.argsort(recv, kind="stable")
            srt = recv[order]
            starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
            within = np.arange(len(recv)) - starts[srt]
            t[srt, within] = pos[order]
        tables.append(t)
    k_max = max(t.shape[1] for t in tables)
    return np.stack([_pad_to(t, k_max, axis=1, fill=m_tot) for t in tables])


def _split_pack(parts_i, parts_f):
    """Stack per-shard (send, recv_local, feat) interior/frontier tuples
    into [interior ++ frontier] padded arrays. Returns (send, recv, feat,
    ei, ef, recv_parts-for-tables)."""
    ei = max(max(len(p[0]) for p in parts_i), 1)
    ef = max(max(len(p[0]) for p in parts_f), 1)

    def pack(col, dtype):
        return np.stack([
            np.concatenate([
                _pad_to(np.asarray(pi[col], dtype), ei),
                _pad_to(np.asarray(pf[col], dtype), ef),
            ])
            for pi, pf in zip(parts_i, parts_f)
        ])

    send = pack(0, np.int32)
    recv = pack(1, np.int32)
    feat = np.stack([
        np.concatenate([
            _pad_to(np.asarray(pi[2], np.float32), ei),
            _pad_to(np.asarray(pf[2], np.float32), ef),
        ])
        for pi, pf in zip(parts_i, parts_f)
    ])
    recv_parts = [(pi[1], pf[1]) for pi, pf in zip(parts_i, parts_f)]
    return send, recv, feat, ei, ef, recv_parts


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpatialPartition:
    """Per-shard stacked (S, ...) edge structures for GraphLAM."""

    # g2m: partitioned by sender grid block
    g2m_send_local: jax.Array  # (S, Eg) int32
    g2m_recv: jax.Array  # (S, Eg) int32 (global mesh)
    g2m_feat: jax.Array  # (S, Eg, 3)
    g2m_table: jax.Array  # (S, N_mesh[, _pad], Kg)
    # m2m: balanced chunks ("psum") or receiver-block chunks ("rs")
    m2m_send: jax.Array  # (S, Emm)
    m2m_recv: jax.Array  # (S, Emm); scheme "rs": LOCAL receiver indices
    m2m_feat: jax.Array  # (S, Emm, 3)
    m2m_table: jax.Array  # (S, N_mesh, Kmm); "rs": (S, mblock, Kmm)
    # m2g: partitioned by receiver grid block
    m2g_send: jax.Array  # (S, Em)
    m2g_recv_local: jax.Array  # (S, Em)
    m2g_feat: jax.Array  # (S, Em, 3)
    m2g_table: jax.Array  # (S, block, Km)
    # padded grid statics + bottom mesh static features (replicated)
    grid_static: jax.Array  # (Ng_pad, d_static)
    mesh_static: jax.Array  # (N_mesh, 2)
    n_shards: int = dataclasses.field(metadata={"static": True})
    block: int = dataclasses.field(metadata={"static": True})
    num_grid: int = dataclasses.field(metadata={"static": True})
    num_mesh: int = dataclasses.field(metadata={"static": True})
    # scheme "rs" (mesh-node sharding): owned mesh rows per shard
    mblock: int = dataclasses.field(default=0, metadata={"static": True})
    scheme: str = dataclasses.field(default="psum",
                                    metadata={"static": True})
    # scheme "halo" (cut-edge halo exchange; see partition_graph docstring):
    # per-shard send lists + static per-offset ppermute plans
    mm_send_idx: jax.Array | None = None   # (S, Xmm) local mesh rows
    mg_send_idx: jax.Array | None = None   # (S, Xmg) local mesh rows
    g2m_add_pos: jax.Array | None = None   # (S, Yg) owner-local add positions
    # mesh static features in the compact [owned ++ pushed] row layout, so
    # mesh embedding / g2m receiver transforms are computed per shard on
    # exactly the rows its edges touch — no full-mesh replicated compute
    mesh_static_c: jax.Array | None = None  # (S, mblock + Yg, 2)
    mm_plan: tuple = dataclasses.field(default=(),
                                       metadata={"static": True})
    mg_plan: tuple = dataclasses.field(default=(),
                                       metadata={"static": True})
    g2m_plan: tuple = dataclasses.field(default=(),
                                        metadata={"static": True})
    # rs/halo: edge arrays are ordered [interior ++ frontier]; the first
    # m2m_e_i / m2g_e_i slots are interior edges (senders owned locally —
    # the segment whose messages do NOT depend on the sender collective,
    # so the exchange overlaps the interior edge MLP). 0 = unsplit (psum).
    m2m_e_i: int = dataclasses.field(default=0, metadata={"static": True})
    m2g_e_i: int = dataclasses.field(default=0, metadata={"static": True})

    @property
    def num_mesh_padded(self) -> int:
        return self.mblock * self.n_shards if self.scheme == "rs" \
            else self.num_mesh

    @property
    def num_grid_padded(self) -> int:
        return self.n_shards * self.block


def _build_gather_halo(send_global, dst_shard, owner_blk, S):
    """Plan a gather-type halo exchange: each shard sends the rows it owns
    that other shards' edges reference.

    send_global: (E,) global sender row ids; dst_shard: (E,) shard that
    consumes each edge; owner_blk: rows per owner block. Returns
    (plan, send_idx, remap):
      plan      static tuple of (offset, width) ppermute rounds, where
                offset = dst - src and width = max over shards of the
                unique rows sent for that offset;
      send_idx  (S, X_tot) int32 owner-LOCAL rows each shard sends,
                grouped by plan segment (padded with 0);
      remap     per-dst-shard dict {global row id -> extended-table
                position}, where the extended table is
                [owned rows (owner_blk) ++ import segments (X_tot)] and
                import segment d holds the rows received from shard s-d
                in the sender's list order.
    """
    send_global = np.asarray(send_global, np.int64)
    owner = np.minimum(send_global // owner_blk, S - 1)
    pairs = {}
    for dst in range(S):
        sel = dst_shard == dst
        for src in np.unique(owner[sel]):
            if src == dst:
                continue
            rows = np.unique(send_global[sel & (owner == src)])
            pairs[(int(src), dst)] = rows
    offsets = sorted({dst - src for (src, dst) in pairs})
    widths = {
        d: max([len(r) for (src, dst), r in pairs.items()
                if dst - src == d] or [0])
        for d in offsets
    }
    x_tot = sum(widths.values())
    send_idx = np.zeros((S, max(x_tot, 1)), np.int32)
    remap = [dict() for _ in range(S)]
    base = 0
    for d in offsets:
        for src in range(S):
            dst = src + d
            if not 0 <= dst < S:
                continue
            rows = pairs.get((src, dst))
            if rows is None:
                continue
            send_idx[src, base:base + len(rows)] = rows - src * owner_blk
            for j, gid in enumerate(rows):
                remap[dst][int(gid)] = owner_blk + base + j
        base += widths[d]
    plan = tuple((int(d), int(widths[d])) for d in offsets)
    return plan, send_idx[:, :max(x_tot, 1)], remap


def _build_push_halo(recv_global, src_shard, owner_blk, S):
    """Plan a push/scatter-type halo (partial aggregation rows to owners).

    recv_global: (E,) global receiver row ids; src_shard: (E,) shard that
    produces each edge's message. Returns (plan, compact_pos, add_pos,
    y_tot): `compact_pos` maps each shard's edges into a compact
    aggregation layout [owned rows (owner_blk) ++ push segments (y_tot)];
    after exchanging push segments (plan rounds), the receiving shard adds
    segment d's rows at its owner-local `add_pos` positions (sentinel
    owner_blk marks padding).
    """
    recv_global = np.asarray(recv_global, np.int64)
    owner = np.minimum(recv_global // owner_blk, S - 1)
    pairs = {}
    for src in range(S):
        sel = src_shard == src
        for dst in np.unique(owner[sel]):
            if dst == src:
                continue
            rows = np.unique(recv_global[sel & (owner == dst)])
            pairs[(src, int(dst))] = rows
    offsets = sorted({dst - src for (src, dst) in pairs})
    widths = {
        d: max([len(r) for (src, dst), r in pairs.items()
                if dst - src == d] or [0])
        for d in offsets
    }
    y_tot = sum(widths.values())
    # per-source-shard: compact position of each pushed global row
    push_pos = [dict() for _ in range(S)]
    add_pos = np.full((S, max(y_tot, 1)), owner_blk, np.int32)
    base = 0
    for d in offsets:
        for src in range(S):
            dst = src + d
            if not 0 <= dst < S:
                continue
            rows = pairs.get((src, dst))
            if rows is None:
                continue
            for j, gid in enumerate(rows):
                push_pos[src][int(gid)] = owner_blk + base + j
            # receiver dst gets this segment from shard dst - d == src
            add_pos[dst, base:base + len(rows)] = rows - dst * owner_blk
        base += widths[d]
    plan = tuple((int(d), int(widths[d])) for d in offsets)
    return plan, push_pos, add_pos, y_tot


def partition_graph(graph: LoadedGraph, n_shards: int,
                    grid_static_features,
                    scheme: str = "psum") -> SpatialPartition:
    """Build the per-shard spatial partition of a flat (GraphLAM) graph.

    scheme "psum": mesh nodes replicated, edge chunks balanced, one psum
    of the full (B, N_mesh, h) per GNN (the round-1 design).
    scheme "rs" : mesh nodes SHARDED into contiguous blocks; m2m edges
    partitioned by receiver owner, aggregation fully local; the g2m
    partial is reduce-scattered to owners and sender transforms are
    all-gathered per layer — half the collective bytes of a psum each,
    and the aggr-MLPs run on owned rows only (see docs/SCALING.md).
    scheme "halo": like "rs" but every full-mesh collective is replaced by
    CUT-EDGE halo exchange (the BASELINE.json design): per processor layer
    and for m2g, each shard ppermutes to its neighbors only the owned
    sender rows their edges actually reference (~2-4% of the mesh for the
    MEPS lattice: x-major blocks make cuts thin bands, and the multiscale
    long-stride edges add a handful of rows at offsets beyond +-1); the
    g2m partial is aggregated in a compact [owned ++ pushed] layout and
    only the pushed boundary rows travel. Exchange plans are static
    per-offset ppermute rounds built here.
    """
    assert scheme in ("psum", "rs", "halo")
    assert not graph.hierarchical, "spatial partitioning of flat graphs only"
    ng = graph.num_grid_nodes
    nm = graph.level_sizes[0]

    def real_edges(es):
        """(senders, receivers, features) with dense padding slots removed."""
        send = np.asarray(es.senders)
        recv = np.asarray(es.receivers)
        feat = np.asarray(es.features)
        if es.dense_k:
            keep = np.asarray(es.mask)[:, 0] > 0
            return send[keep], recv[keep], feat[keep]
        return send, recv, feat
    block = -(-ng // n_shards)
    ng_pad = block * n_shards
    mblock = -(-nm // n_shards)
    nm_pad = mblock * n_shards

    def split_by_block(owner_idx, arrays, blk=block):
        """Group edge-array rows by owner block; pad each group to max."""
        shard_of = np.asarray(owner_idx) // blk
        groups = [
            [a[shard_of == s] for a in arrays] for s in range(n_shards)
        ]
        e_max = max(g[0].shape[0] for g in groups) if groups else 1
        return groups, e_max

    halo = scheme == "halo"
    halo_extra = {}

    def mesh_owner(gids):
        return np.minimum(np.asarray(gids, np.int64) // mblock, n_shards - 1)

    def remap_rows(gids, s, remap):
        """Global mesh row ids -> extended-table positions at shard s."""
        return _remap_to_extended(gids, s, mblock, remap, n_shards)

    # --- g2m (partition by sender grid node) ---
    send, recv, feat = real_edges(graph.g2m)
    groups, eg = split_by_block(send, [send, recv, feat])
    g2m_send_local = np.stack([
        _pad_to(g[0] - s * block, eg) for s, g in enumerate(groups)
    ]).astype(np.int32)
    g2m_recv = np.stack([_pad_to(g[1], eg) for g in groups]).astype(np.int32)
    g2m_feat = np.stack([_pad_to(g[2], eg) for g in groups]).astype(np.float32)
    if halo:
        # compact [owned ++ pushed] aggregation layout; only the pushed
        # boundary rows travel to their owners
        src_shard = np.minimum(send // block, n_shards - 1)
        g2m_plan, g2m_push_pos, g2m_add_pos, yg = _build_push_halo(
            recv, src_shard, mblock, n_shards
        )
        compact = [
            _remap_to_extended(g[1], s, mblock, g2m_push_pos, n_shards)
            for s, g in enumerate(groups)
        ]
        g2m_table = _build_shard_tables(compact, mblock + yg, eg)
        # g2m receivers in compact positions (rec_t is computed on the
        # compact row set, see mesh_static_c)
        g2m_recv = np.stack(
            [_pad_to(c, eg) for c in compact]
        ).astype(np.int32)
        # mesh statics gathered into each shard's compact layout
        ms = np.asarray(graph.mesh_static_features[0], np.float32)
        ms = _pad_to(ms, nm_pad)
        ms_c = np.zeros((n_shards, mblock + yg, ms.shape[1]), np.float32)
        for s in range(n_shards):
            ms_c[s, :mblock] = ms[s * mblock:(s + 1) * mblock]
            for gid, pos in g2m_push_pos[s].items():
                ms_c[s, pos] = ms[gid]
        halo_extra["g2m_plan"] = g2m_plan
        halo_extra["g2m_add_pos"] = jnp.asarray(g2m_add_pos)
        halo_extra["mesh_static_c"] = jnp.asarray(ms_c)
    else:
        # "rs": table rows span nm_pad so the partial reduce-scatters evenly
        g2m_table = _build_shard_tables(
            [g[1] for g in groups], nm_pad if scheme == "rs" else nm, eg
        )

    # --- m2m ---
    send, recv, feat = real_edges(graph.m2m[0])
    split_extra = {}
    if scheme in ("rs", "halo"):
        # partition by receiver owner block (aggregation shard-local),
        # each chunk ordered [interior ++ frontier]: interior senders are
        # owner-local rows (no collective), frontier senders index the
        # halo import buffer ("halo") / the all-gathered table ("rs")
        groups, _ = split_by_block(recv, [send, recv, feat], blk=mblock)
        if halo:
            mm_plan, mm_send_idx, mm_remap = _build_gather_halo(
                send, mesh_owner(recv), mblock, n_shards
            )
            halo_extra["mm_plan"] = mm_plan
            halo_extra["mm_send_idx"] = jnp.asarray(mm_send_idx)
        parts_i, parts_f = [], []
        for s, g in enumerate(groups):
            snd, rcv, ft = g
            rcv = rcv - s * mblock
            if halo:
                mapped = remap_rows(snd, s, mm_remap)
                im = mapped < mblock
                int_send, fr_send = mapped[im], mapped[~im] - mblock
            else:
                im = mesh_owner(snd) == s
                int_send, fr_send = snd[im] - s * mblock, snd[~im]
            parts_i.append((int_send, rcv[im], ft[im]))
            parts_f.append((fr_send, rcv[~im], ft[~im]))
        m2m_send, m2m_recv, m2m_feat, ei, ef, rps = _split_pack(
            parts_i, parts_f
        )
        m2m_table = _build_split_tables(rps, mblock, ei, ef)
        split_extra["m2m_e_i"] = ei
    else:
        # contiguous balanced chunks, full-mesh tables, psum
        E = send.shape[0]
        bounds = [E * s // n_shards for s in range(n_shards + 1)]
        emm = max(bounds[s + 1] - bounds[s] for s in range(n_shards))
        m2m_send = np.stack([
            _pad_to(send[bounds[s]:bounds[s + 1]], emm)
            for s in range(n_shards)
        ]).astype(np.int32)
        m2m_recv = np.stack([
            _pad_to(recv[bounds[s]:bounds[s + 1]], emm)
            for s in range(n_shards)
        ]).astype(np.int32)
        m2m_feat = np.stack([
            _pad_to(feat[bounds[s]:bounds[s + 1]], emm)
            for s in range(n_shards)
        ]).astype(np.float32)
        m2m_table = _build_shard_tables(
            [recv[bounds[s]:bounds[s + 1]] for s in range(n_shards)], nm, emm
        )

    # --- m2g (partition by receiver grid node) ---
    send, recv, feat = real_edges(graph.m2g)
    groups, em = split_by_block(recv, [send, recv, feat])
    if halo:
        mg_plan, mg_send_idx, mg_remap = _build_gather_halo(
            send, np.minimum(recv // block, n_shards - 1), mblock, n_shards
        )
        halo_extra["mg_plan"] = mg_plan
        halo_extra["mg_send_idx"] = jnp.asarray(mg_send_idx)
    if scheme in ("rs", "halo"):
        # [interior ++ frontier] ordering as for m2m: the m2g sender
        # exchange overlaps the interior decode messages
        parts_i, parts_f = [], []
        for s, g in enumerate(groups):
            snd, rcv, ft = g
            rcv = rcv - s * block
            if halo:
                mapped = remap_rows(snd, s, mg_remap)
                im = mapped < mblock
                int_send, fr_send = mapped[im], mapped[~im] - mblock
            else:
                im = mesh_owner(snd) == s
                int_send, fr_send = snd[im] - s * mblock, snd[~im]
            parts_i.append((int_send, rcv[im], ft[im]))
            parts_f.append((fr_send, rcv[~im], ft[~im]))
        m2g_send, m2g_recv_local, m2g_feat, ei, ef, rps = _split_pack(
            parts_i, parts_f
        )
        m2g_table = _build_split_tables(rps, block, ei, ef)
        split_extra["m2g_e_i"] = ei
    else:
        m2g_send = np.stack(
            [_pad_to(g[0], em) for g in groups]
        ).astype(np.int32)
        m2g_recv_local = np.stack([
            _pad_to(g[1] - s * block, em) for s, g in enumerate(groups)
        ]).astype(np.int32)
        m2g_feat = np.stack(
            [_pad_to(g[2], em) for g in groups]
        ).astype(np.float32)
        m2g_table = _build_shard_tables(
            [g[1] - s * block for s, g in enumerate(groups)], block, em
        )

    grid_static = _pad_to(np.asarray(grid_static_features), ng_pad)

    return SpatialPartition(
        mesh_static=jnp.asarray(
            np.asarray(graph.mesh_static_features[0], np.float32)
        ),
        g2m_send_local=jnp.asarray(g2m_send_local),
        g2m_recv=jnp.asarray(g2m_recv),
        g2m_feat=jnp.asarray(g2m_feat),
        g2m_table=jnp.asarray(g2m_table),
        m2m_send=jnp.asarray(m2m_send),
        m2m_recv=jnp.asarray(m2m_recv),
        m2m_feat=jnp.asarray(m2m_feat),
        m2m_table=jnp.asarray(m2m_table),
        m2g_send=jnp.asarray(m2g_send),
        m2g_recv_local=jnp.asarray(m2g_recv_local),
        m2g_feat=jnp.asarray(m2g_feat),
        m2g_table=jnp.asarray(m2g_table),
        grid_static=jnp.asarray(grid_static),
        n_shards=int(n_shards),
        block=int(block),
        num_grid=int(ng),
        num_mesh=int(nm),
        mblock=int(mblock),
        scheme=scheme,
        **halo_extra,
        **split_extra,
    )


def _mm(x, w, cd):
    if cd is not None:
        x = x.astype(cd)
        w = w.astype(cd)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _halo_exchange(owned, send_idx, plan, n_shards):
    """Gather-type cut-edge halo: export owned rows other shards reference.

    owned: (B, R, h) locally-owned rows; send_idx: (X_tot,) local rows to
    export, grouped by plan segment; plan: static ((offset, width), ...)
    ppermute rounds. Returns the (B, X_tot, h) import buffer — segment for
    offset d holds the rows received from shard s-d, in the sender's list
    order (the host-side remap in `_build_gather_halo` indexes exactly
    this layout). Bytes per round = width*B*h — the cut-edge rows only,
    vs the full (B, N_mesh, h) an all_gather would move."""
    if not plan:
        return owned[:, :0]
    buf = jnp.take(owned, send_idx, axis=1)
    outs, base = [], 0
    for d, w in plan:
        seg = jax.lax.slice_in_dim(buf, base, base + w, axis=1)
        perm = [(s, s + d) for s in range(n_shards)
                if 0 <= s + d < n_shards]
        outs.append(jax.lax.ppermute(seg, "space", perm=perm))
        base += w
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def _remap_to_extended(gids, s, blk, remap, n_shards):
    """Owner-local position for shard s's OWNED rows, extended/compact
    position (from a halo plan's per-shard remap/push dict) for remote
    rows. Shared by the hand-rolled (this file) and production
    (grid_sharded) halo builders so the clamping/remap semantics live in
    exactly one place."""
    gids = np.asarray(gids, np.int64)
    own = np.minimum(gids // blk, n_shards - 1)
    out = gids - s * blk
    table = remap[s]
    for i in np.nonzero(own != s)[0]:
        out[i] = table[int(gids[i])]
    return out


def _halo_fold_agg(aggregated, agg_axis, add_pos, plan, mblock, n_shards):
    """Push-type cut-edge halo fold: compact [owned ++ pushed] partial
    aggregation -> owned rows. Each pushed segment (plan rounds) is
    ppermuted to its owner shard and added at static `add_pos` positions
    (sentinel mblock drops padding)."""
    a = jnp.moveaxis(aggregated, agg_axis, 0)
    own = jnp.pad(
        jax.lax.slice_in_dim(a, 0, mblock, axis=0),
        [(0, 1)] + [(0, 0)] * (a.ndim - 1),
    )  # sentinel row mblock absorbs padded positions
    base = mblock
    for d, w in plan:
        seg = jax.lax.slice_in_dim(a, base, base + w, axis=0)
        perm = [(s, s + d) for s in range(n_shards)
                if 0 <= s + d < n_shards]
        recv = jax.lax.ppermute(seg, "space", perm=perm)
        pos = jax.lax.slice_in_dim(add_pos, base - mblock,
                                   base - mblock + w, axis=0)
        own = own.at[pos].add(recv)
        base += w
    return jnp.moveaxis(
        jax.lax.slice_in_dim(own, 0, mblock, axis=0), 0, agg_axis
    )


def _halo_fold(aggregated, rec_rep, agg_axis, rec_axis, add_pos, plan,
               mblock, n_shards):
    """`_halo_fold_agg` + the owned-rows slice of rec_rep; signature
    matches the callable psum_mode hook of apply_interaction_net /
    _apply_inet_flat, handling both the flat (N, B*h) and batched
    (B, N, h) aggregation layouts via agg_axis/rec_axis."""
    own = _halo_fold_agg(aggregated, agg_axis, add_pos, plan, mblock,
                         n_shards)
    rec = jax.lax.slice_in_dim(rec_rep, 0, mblock, axis=rec_axis)
    return own, rec


def _edge_messages(params, edge_emb, send_t_rows, rec_t_rows, cd):
    """EdgeMLP tail given already-gathered decomposed first-layer pieces.

    edge_emb: (..., E, h) embedded edge features; send/rec_t_rows the
    gathered (..., E, h) node transforms. Applies We to edge_emb? No —
    edge_emb is the full embedded edge rep; caller passes e @ W_e rows.
    """
    layers = params["layers"]
    x = edge_emb + send_t_rows + rec_t_rows + layers[0]["b"].astype(jnp.float32)
    for i in range(1, len(layers)):
        x = jax.nn.silu(x)
        x = _mm(x, layers[i]["w"], cd) + layers[i]["b"].astype(jnp.float32)
    if cd is not None:
        x = x.astype(cd)
    if params["ln"] is not None:
        x = layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
    return x


class SpatialGraphLAM(GraphLAM):
    """GraphLAM with predict_step sharded over a ('data','space') mesh."""

    _array_fields = ("statics", "graph", "partition")

    def __init__(self, args, config, datastore, graph=None, mesh: Mesh = None,
                 scheme: str = "psum"):
        super().__init__(args, config, datastore, graph)
        assert mesh is not None and "space" in mesh.axis_names
        self.mesh = mesh
        n_space = mesh.shape["space"]
        self.partition = partition_graph(
            self.graph, n_space, self.statics.grid_static_features,
            scheme=scheme,
        )
        self._shard_step = self._build_shard_step()

    def _build_shard_step(self):
        part = self.partition
        cd = self.compute_dtype
        aggr = self.args.mesh_aggr
        assert aggr == "sum", "spatial sharding currently implements sum aggr"
        n_layers = self.args.processor_layers
        diff_mean = self.statics.diff_mean
        diff_std = self.statics.diff_std
        output_std = self.output_std

        def shard_fn(params, sp: SpatialPartition, grid_feats, prev_state_loc):
            """Per-shard body. grid_feats: (B, block, d_in) local rows."""
            idx = lambda a: a[0]  # (1, ...) -> (...)

            # 1. local grid embedding + residual MLP
            grid_emb = apply_mlp(params["grid_embedder"], grid_feats,
                                 compute_dtype=cd)  # (B, blk, h)
            grid_rep = grid_emb + apply_mlp(
                params["encoding_grid_mlp"], grid_emb, compute_dtype=cd
            )

            # 2. mesh embedding
            B = grid_feats.shape[0]
            halo = part.scheme == "halo"
            rs = part.scheme in ("rs", "halo")
            S = part.n_shards
            if halo:
                # compact per-shard rows (owned ++ pushed) — the only mesh
                # rows this shard's compute ever touches, so NOTHING about
                # the mesh is computed replicated
                mesh_emb = apply_mlp(
                    params["mesh_embedder"], idx(sp.mesh_static_c),
                    compute_dtype=cd,
                )  # (mblock + Yg, h)
                own0 = mesh_emb[:part.mblock]
                mesh_rep = jnp.broadcast_to(own0[None], (B,) + own0.shape)
            elif rs:
                mesh_emb = apply_mlp(
                    params["mesh_embedder"], sp.mesh_static,
                    compute_dtype=cd,
                )  # (Nm, h), replicated compute
                nm_pad = part.num_mesh_padded
                mesh_emb = jnp.pad(
                    mesh_emb, ((0, nm_pad - part.num_mesh), (0, 0))
                )
                s_idx = jax.lax.axis_index("space")
                own0 = jax.lax.dynamic_slice_in_dim(
                    mesh_emb, s_idx * part.mblock, part.mblock, axis=0
                )
                # owned mesh rows only: (B, mblock, h)
                mesh_rep = jnp.broadcast_to(own0[None], (B,) + own0.shape)
            else:
                mesh_emb = apply_mlp(
                    params["mesh_embedder"], sp.mesh_static,
                    compute_dtype=cd,
                )  # (Nm, h), replicated compute
                mesh_rep = jnp.broadcast_to(
                    mesh_emb[None], (B,) + mesh_emb.shape
                )

            # 3. g2m: local messages; "psum" combines full-mesh partials,
            # "rs" reduce-scatters them to the owner shard (half the bytes)
            g2m_p = params["g2m_gnn"]
            w0 = g2m_p["edge_mlp"]["layers"][0]["w"]
            h = mesh_emb.shape[-1]
            w_e, w_j, w_i = w0[:h], w0[h:2 * h], w0[2 * h:]
            g2m_emb = apply_mlp(
                params["g2m_embedder"], idx(sp.g2m_feat), compute_dtype=cd
            )  # (Eg, h)
            send_t = _mm(grid_emb, w_j, cd)  # (B, blk, h)
            rec_t = _mm(mesh_emb, w_i, cd)  # (Nm[, _pad], h)
            msgs = _edge_messages(
                g2m_p["edge_mlp"],
                _mm(g2m_emb, w_e, cd)[None],
                jnp.take(send_t, idx(sp.g2m_send_local), axis=-2),
                jnp.take(rec_t, idx(sp.g2m_recv), axis=-2)[None],
                cd,
            )  # (B, Eg, h)
            partial = gather_sum(msgs, idx(sp.g2m_table))
            if halo:
                # compact [owned ++ pushed] partial: ppermute only the
                # pushed boundary rows to their owners and add in place
                aggregated = _halo_fold_agg(
                    partial, 1, idx(sp.g2m_add_pos), part.g2m_plan,
                    part.mblock, S,
                )  # (B, mblock, h) owned rows
            elif rs:
                aggregated = jax.lax.psum_scatter(
                    partial, "space", scatter_dimension=1, tiled=True
                )  # (B, mblock, h) owned rows
            else:
                aggregated = jax.lax.psum(partial, "space")
            mesh_rep = mesh_rep + apply_mlp(
                g2m_p["aggr_mlp"],
                jnp.concatenate([mesh_rep, aggregated], axis=-1),
                compute_dtype=cd,
            )

            # 4. processor: per-shard m2m edge chunk. "psum": full-mesh
            # partial + psum per layer; "rs": all-gather the SENDER
            # transform of the owned rows (half the bytes of a psum),
            # receiver transform / aggregation / aggr-MLP stay local
            m2m_emb = apply_mlp(
                params["m2m_embedder"], idx(sp.m2m_feat), compute_dtype=cd
            )  # (Emm, h)
            edge_rep = jnp.broadcast_to(m2m_emb[None], (B,) + m2m_emb.shape)

            def seg(a, lo, size):
                return jax.lax.slice_in_dim(a, lo, lo + size, axis=-2)

            for li in range(n_layers):
                p = params["processor"][li]
                w0 = p["edge_mlp"]["layers"][0]["w"]
                w_e, w_j, w_i = w0[:h], w0[h:2 * h], w0[2 * h:]
                node_tj = _mm(mesh_rep, w_j, cd)  # (B, Nm|mblock, h)
                node_ti = _mm(mesh_rep, w_i, cd)
                ew_all = _mm(edge_rep, w_e, cd)
                rec_rows = jnp.take(node_ti, idx(sp.m2m_recv), axis=-2)
                send_ids = idx(sp.m2m_send)
                if rs:
                    # edges ordered [interior ++ frontier]: the interior
                    # messages read only owned rows, so the halo ppermute /
                    # all-gather has ONE consumer (the small frontier
                    # chunk) and overlaps the interior edge MLP
                    imports = (
                        _halo_exchange(node_tj, idx(sp.mm_send_idx),
                                       part.mm_plan, S)
                        if halo else jax.lax.all_gather(
                            node_tj, "space", axis=1, tiled=True
                        )
                    )
                    ei = part.m2m_e_i
                    ef = send_ids.shape[0] - ei
                    msgs_i = _edge_messages(
                        p["edge_mlp"], seg(ew_all, 0, ei),
                        jnp.take(node_tj, send_ids[:ei], axis=-2),
                        seg(rec_rows, 0, ei), cd,
                    )
                    msgs_f = _edge_messages(
                        p["edge_mlp"], seg(ew_all, ei, ef),
                        jnp.take(imports, send_ids[ei:], axis=-2),
                        seg(rec_rows, ei, ef), cd,
                    )
                    msgs = jnp.concatenate([msgs_i, msgs_f], axis=-2)
                    aggregated = gather_sum(msgs, idx(sp.m2m_table))
                else:
                    msgs = _edge_messages(
                        p["edge_mlp"], ew_all,
                        jnp.take(node_tj, send_ids, axis=-2),
                        rec_rows, cd,
                    )  # (B, Emm, h)
                    partial = gather_sum(msgs, idx(sp.m2m_table))
                    aggregated = jax.lax.psum(partial, "space")
                mesh_rep = mesh_rep + apply_mlp(
                    p["aggr_mlp"],
                    jnp.concatenate([mesh_rep, aggregated], axis=-1),
                    compute_dtype=cd,
                )
                edge_rep = edge_rep + msgs

            # 5. m2g: mesh senders -> local grid receivers ("rs": one
            # all-gather of the sender transform of the owned rows)
            m2g_p = params["m2g_gnn"]
            w0 = m2g_p["edge_mlp"]["layers"][0]["w"]
            w_e, w_j, w_i = w0[:h], w0[h:2 * h], w0[2 * h:]
            m2g_emb = apply_mlp(
                params["m2g_embedder"], idx(sp.m2g_feat), compute_dtype=cd
            )
            send_t = _mm(mesh_rep, w_j, cd)  # (B, Nm|mblock, h)
            rec_t = _mm(grid_rep, w_i, cd)  # (B, blk, h)
            mg_ew = _mm(m2g_emb, w_e, cd)[None]
            mg_rec_rows = jnp.take(rec_t, idx(sp.m2g_recv_local), axis=-2)
            mg_send_ids = idx(sp.m2g_send)
            if rs:
                # [interior ++ frontier] as in the processor: the m2g
                # sender exchange overlaps the interior decode messages
                imports = (
                    _halo_exchange(send_t, idx(sp.mg_send_idx),
                                   part.mg_plan, S)
                    if halo else jax.lax.all_gather(
                        send_t, "space", axis=1, tiled=True
                    )
                )
                ei = part.m2g_e_i
                ef = mg_send_ids.shape[0] - ei
                msgs_i = _edge_messages(
                    m2g_p["edge_mlp"], seg(mg_ew, 0, ei),
                    jnp.take(send_t, mg_send_ids[:ei], axis=-2),
                    seg(mg_rec_rows, 0, ei), cd,
                )
                msgs_f = _edge_messages(
                    m2g_p["edge_mlp"], seg(mg_ew, ei, ef),
                    jnp.take(imports, mg_send_ids[ei:], axis=-2),
                    seg(mg_rec_rows, ei, ef), cd,
                )
                msgs = jnp.concatenate([msgs_i, msgs_f], axis=-2)
            else:
                msgs = _edge_messages(
                    m2g_p["edge_mlp"], mg_ew,
                    jnp.take(send_t, mg_send_ids, axis=-2),
                    mg_rec_rows, cd,
                )  # (B, Em, h)
            aggregated = gather_sum(msgs, idx(sp.m2g_table))  # (B, blk, h)
            grid_rep = grid_rep + apply_mlp(
                m2g_p["aggr_mlp"],
                jnp.concatenate([grid_rep, aggregated], axis=-1),
                compute_dtype=cd,
            )

            # 6. output + delta rescale + residual (local)
            net_output = apply_mlp(params["output_map"], grid_rep,
                                   compute_dtype=cd)
            if output_std:
                pred_delta_mean, pred_std_raw = jnp.split(net_output, 2, axis=-1)
                pred_std = jax.nn.softplus(pred_std_raw)
            else:
                pred_delta_mean = net_output
                pred_std = jnp.zeros_like(net_output)
            new_state = prev_state_loc + (
                pred_delta_mean * diff_std + diff_mean
            )
            return new_state, pred_std

        part_specs = SpatialPartition(
            mesh_static=P(),
            g2m_send_local=P("space"), g2m_recv=P("space"),
            g2m_feat=P("space"), g2m_table=P("space"),
            m2m_send=P("space"), m2m_recv=P("space"),
            m2m_feat=P("space"), m2m_table=P("space"),
            m2g_send=P("space"), m2g_recv_local=P("space"),
            m2g_feat=P("space"), m2g_table=P("space"),
            grid_static=P("space"),
            n_shards=part.n_shards, block=part.block,
            num_grid=part.num_grid, num_mesh=part.num_mesh,
            mblock=part.mblock, scheme=part.scheme,
            mm_send_idx=None if part.mm_send_idx is None else P("space"),
            mg_send_idx=None if part.mg_send_idx is None else P("space"),
            g2m_add_pos=None if part.g2m_add_pos is None else P("space"),
            mesh_static_c=None if part.mesh_static_c is None
            else P("space"),
            mm_plan=part.mm_plan, mg_plan=part.mg_plan,
            g2m_plan=part.g2m_plan,
            m2m_e_i=part.m2m_e_i, m2g_e_i=part.m2g_e_i,
        )
        return shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(), part_specs, P("data", "space", None),
                      P("data", "space", None)),
            out_specs=(P("data", "space", None), P("data", "space", None)),
            check_vma=False,
        )

    def precompute_rollout_ctx(self, params, batch_size=None):
        return None  # the shard_map body embeds statics internally

    def predict_step(self, params, prev_state, prev_prev_state, forcing,
                     ctx=None):
        part = self.partition
        ng, ng_pad = part.num_grid, part.num_grid_padded
        pad = ng_pad - ng

        def padg(x):
            return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

        B = prev_state.shape[0]
        grid_feats = jnp.concatenate(
            (
                padg(prev_state),
                padg(prev_prev_state),
                padg(forcing),
                jnp.broadcast_to(
                    part.grid_static[None], (B,) + part.grid_static.shape
                ),
            ),
            axis=-1,
        )
        new_state, pred_std = self._shard_step(
            params, part, grid_feats, padg(prev_state)
        )
        new_state = new_state[:, :ng]
        if self.output_std:
            return new_state, pred_std[:, :ng]
        return new_state, None
