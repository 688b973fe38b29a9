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

    @property
    def num_mesh_padded(self) -> int:
        return self.mblock * self.n_shards if self.scheme == "rs" \
            else self.num_mesh

    @property
    def num_grid_padded(self) -> int:
        return self.n_shards * self.block


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
    """
    assert scheme in ("psum", "rs")
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

    # --- g2m (partition by sender grid node) ---
    send, recv, feat = real_edges(graph.g2m)
    groups, eg = split_by_block(send, [send, recv, feat])
    g2m_send_local = np.stack([
        _pad_to(g[0] - s * block, eg) for s, g in enumerate(groups)
    ]).astype(np.int32)
    g2m_recv = np.stack([_pad_to(g[1], eg) for g in groups]).astype(np.int32)
    g2m_feat = np.stack([_pad_to(g[2], eg) for g in groups]).astype(np.float32)
    # "rs": table rows span nm_pad so the partial reduce-scatters evenly
    g2m_table = _build_shard_tables(
        [g[1] for g in groups], nm_pad if scheme == "rs" else nm, eg
    )

    # --- m2m ---
    send, recv, feat = real_edges(graph.m2m[0])
    if scheme == "rs":
        # partition by receiver owner block; aggregation is shard-local
        groups, emm = split_by_block(recv, [send, recv, feat], blk=mblock)
        m2m_send = np.stack(
            [_pad_to(g[0], emm) for g in groups]
        ).astype(np.int32)
        m2m_recv = np.stack([
            _pad_to(g[1] - s * mblock, emm) for s, g in enumerate(groups)
        ]).astype(np.int32)
        m2m_feat = np.stack(
            [_pad_to(g[2], emm) for g in groups]
        ).astype(np.float32)
        m2m_table = _build_shard_tables(
            [g[1] - s * mblock for s, g in enumerate(groups)], mblock, emm
        )
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
    m2g_send = np.stack([_pad_to(g[0], em) for g in groups]).astype(np.int32)
    m2g_recv_local = np.stack([
        _pad_to(g[1] - s * block, em) for s, g in enumerate(groups)
    ]).astype(np.int32)
    m2g_feat = np.stack([_pad_to(g[2], em) for g in groups]).astype(np.float32)
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
    )


def _mm(x, w, cd):
    if cd is not None:
        x = x.astype(cd)
        w = w.astype(cd)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


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

            # 2. mesh embedding (replicated compute; small)
            mesh_emb = apply_mlp(params["mesh_embedder"], sp.mesh_static,
                                 compute_dtype=cd)  # (Nm, h)
            B = grid_feats.shape[0]
            rs = part.scheme == "rs"
            if rs:
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
            if rs:
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
            for li in range(n_layers):
                p = params["processor"][li]
                w0 = p["edge_mlp"]["layers"][0]["w"]
                w_e, w_j, w_i = w0[:h], w0[h:2 * h], w0[2 * h:]
                node_tj = _mm(mesh_rep, w_j, cd)  # (B, Nm|mblock, h)
                node_ti = _mm(mesh_rep, w_i, cd)
                if rs:
                    node_tj = jax.lax.all_gather(
                        node_tj, "space", axis=1, tiled=True
                    )  # (B, nm_pad, h)
                msgs = _edge_messages(
                    p["edge_mlp"],
                    _mm(edge_rep, w_e, cd),
                    jnp.take(node_tj, idx(sp.m2m_send), axis=-2),
                    jnp.take(node_ti, idx(sp.m2m_recv), axis=-2),
                    cd,
                )  # (B, Emm, h)
                partial = gather_sum(msgs, idx(sp.m2m_table))
                if rs:
                    aggregated = partial  # receiver-owned chunk: local
                else:
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
            if rs:
                send_t = jax.lax.all_gather(
                    send_t, "space", axis=1, tiled=True
                )  # (B, nm_pad, h)
            rec_t = _mm(grid_rep, w_i, cd)  # (B, blk, h)
            msgs = _edge_messages(
                m2g_p["edge_mlp"],
                _mm(m2g_emb, w_e, cd)[None],
                jnp.take(send_t, idx(sp.m2g_send), axis=-2),
                jnp.take(rec_t, idx(sp.m2g_recv_local), axis=-2),
                cd,
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
