"""Hi-LAM Parallel: all hierarchical edge sets processed in one fused round.

ref: neural_lam/models/hi_lam_parallel.py:12-99 — the reference concatenates
m2m + up + down edge sets into ONE edge array and runs a single
interaction-net stack whose MLPs are chunked per edge set / node level
(SplitMLPs). Semantics per layer:

    messages_c  = EdgeMLP_c(edge chunk c)                 (per chunk)
    aggregated  = sum of all chunks' messages per node    (all chunks)
    node_l     += AggrMLP_l(concat(node_l, aggregated_l)) (per level)
    edges_c    += messages_c

The TPU-native realization keeps node states as per-level arrays and edge
chunks as the graph's dense constant-degree EdgeSets: each chunk's messages
use the decomposed edge MLP (+ Pallas tail kernel), aggregate by masked
reshape-sum, and add into the destination level's accumulator — no
concatenated mega edge array and no cross-level gathers, while every chunk
still shares the one fused round per processor layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.message_passing import (
    _SPLIT_SEND_TYPES,
    _fold_virt,
    _fold_virt_flat,
    edge_messages_and_virt,
    edge_round_flat,
    init_interaction_net_chunked,
    split_send_tf,
    unflatten_nodes,
)
from ..ops.mlp import apply_mlp_concat
from .base_hi_graph_model import BaseHiGraphModel


class HiLAMParallel(BaseHiGraphModel):
    def __init__(self, args, config, datastore, graph=None):
        super().__init__(args, config, datastore, graph)
        # chunk order: m2m levels, then up, then down
        # (ref: hi_lam_parallel.py:26-32); chunk c: send level / rec level
        L = self.num_levels
        self._chunk_send_level = (
            list(range(L)) + list(range(L - 1)) + list(range(1, L))
        )
        self._chunk_rec_level = (
            list(range(L)) + list(range(1, L)) + list(range(L - 1))
        )

    def _chunk_edge_sets(self):
        g = self.graph
        return list(g.m2m) + list(g.up) + list(g.down)

    def init_hi_processor_params(self, key) -> dict:
        h, hl = self.args.hidden_dim, self.args.hidden_layers
        P = self.args.processor_layers
        keys = jax.random.split(key, max(P, 1))
        n_chunks = len(self._chunk_send_level)
        return {
            "processor": [
                init_interaction_net_chunked(
                    k, h, n_edge_chunks=n_chunks,
                    n_node_chunks=self.num_levels, hidden_layers=hl,
                )
                for k in keys[:P]
            ],
        }

    def hi_processor_step(self, params, mesh_rep_levels, mesh_same_rep,
                          mesh_up_rep, mesh_down_rep):
        """(ref: hi_lam_parallel.py:55-99) — per-level fused rounds."""
        L = self.num_levels
        cd = self.compute_dtype
        edge_sets = self._chunk_edge_sets()
        edge_reps = list(mesh_same_rep) + list(mesh_up_rep) + list(
            mesh_down_rep
        )

        # chunk order mirrors _chunk_edge_sets: m2m levels, up, down
        chunk_kinds = (
            [("m2m", i) for i in range(L)]
            + [("up", i) for i in range(L - 1)]
            + [("down", i) for i in range(L - 1)]
        )
        for p in params["processor"]:
            aggregated = [None] * L
            new_edge_reps = []
            for c, es in enumerate(edge_sets):
                send_l = self._chunk_send_level[c]
                rec_l = self._chunk_rec_level[c]
                # under the rs/halo schemes only the m2m[0] chunk needs a
                # distributed sender table (one exchange per fused layer);
                # up[0] is sender-owned, everything else replicated
                send_rep = self._hi_sender_rep(
                    mesh_rep_levels[send_l], *chunk_kinds[c]
                )
                B = mesh_rep_levels[rec_l].shape[0]
                if isinstance(send_rep, _SPLIT_SEND_TYPES):
                    # split sharded chunk: interior round reads only owned
                    # rows; the frontier round is the collective's sole
                    # consumer (overlap — see ops SplitSend)
                    fr = es.frontier
                    er_i, er_f = edge_reps[c]
                    if er_i.ndim == 2:
                        # transform-then-gather (split_send_tf): the
                        # collective moves transformed rows
                        tf_o, tf_i = split_send_tf(
                            p["edge_mlps"][c], send_rep, B, cd
                        )
                        ne_i, virt_i = edge_round_flat(
                            p["edge_mlps"][c], es, None,
                            mesh_rep_levels[rec_l], er_i, compute_dtype=cd,
                            send_tf=tf_o,
                        )
                        ne_f, virt_f = edge_round_flat(
                            p["edge_mlps"][c], fr, None,
                            mesh_rep_levels[rec_l], er_f, compute_dtype=cd,
                            send_tf=tf_i,
                        )
                        agg_c = unflatten_nodes(
                            _fold_virt_flat(es, virt_i)
                            + _fold_virt_flat(fr, virt_f), B,
                        )
                    else:
                        m_i, virt_i = edge_messages_and_virt(
                            p["edge_mlps"][c], es, send_rep.owned,
                            mesh_rep_levels[rec_l], er_i, compute_dtype=cd,
                        )
                        m_f, virt_f = edge_messages_and_virt(
                            p["edge_mlps"][c], fr, send_rep.imports,
                            mesh_rep_levels[rec_l], er_f, compute_dtype=cd,
                        )
                        agg_c = _fold_virt(es, virt_i) + _fold_virt(
                            fr, virt_f
                        )
                        ne_i, ne_f = er_i + m_i, er_f + m_f
                    new_edge = (ne_i, ne_f)
                elif edge_reps[c].ndim == 2:
                    # flat-lane chunk (see ops/pallas_edge_flat.py); the
                    # per-level accumulator stays batched so mixed-layout
                    # chunks can aggregate into the same level
                    new_edge, virt = edge_round_flat(
                        p["edge_mlps"][c], es,
                        send_rep, mesh_rep_levels[rec_l],
                        edge_reps[c], compute_dtype=cd,
                        win=self._win(*chunk_kinds[c]),
                    )
                    agg_c = unflatten_nodes(_fold_virt_flat(es, virt), B)
                else:
                    messages, virt = edge_messages_and_virt(
                        p["edge_mlps"][c], es,
                        send_rep, mesh_rep_levels[rec_l],
                        edge_reps[c], compute_dtype=cd,
                    )
                    agg_c = _fold_virt(es, virt)
                    new_edge = edge_reps[c] + messages
                aggregated[rec_l] = (
                    agg_c if aggregated[rec_l] is None
                    else aggregated[rec_l] + agg_c
                )
                new_edge_reps.append(new_edge)
            edge_reps = new_edge_reps
            # sharded edge chunks: ONE psum per level per layer combines
            # the per-shard partial aggregations (grid_sharded.py); under
            # the rs scheme level 0 is receiver-owned (no collective)
            aggregated = [
                jax.lax.psum(a, ax)
                if (ax := self._hi_psum_axis(lvl)) is not None else a
                for lvl, a in enumerate(aggregated)
            ]
            mesh_rep_levels = [
                mesh_rep_levels[lvl] + apply_mlp_concat(
                    p["aggr_mlps"][lvl],
                    [mesh_rep_levels[lvl], aggregated[lvl]],
                    compute_dtype=cd,
                )
                for lvl in range(L)
            ]

        mesh_same_rep = edge_reps[:L]
        mesh_up_rep = edge_reps[L:L + (L - 1)]
        mesh_down_rep = edge_reps[L + (L - 1):]
        return mesh_rep_levels, mesh_same_rep, mesh_up_rep, mesh_down_rep
