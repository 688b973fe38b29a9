"""Hierarchical graph model base: per-level embedders, init/read-out sweeps.

ref: neural_lam/models/base_hi_graph_model.py:12-235 — mesh-init GNN sweep
bottom→top over up-edges, abstract processor, read-out sweep top→bottom over
down-edges (no edge update), only bottom level enters encode/decode.
"""

from __future__ import annotations

import jax

from ..ops.message_passing import (
    apply_interaction_net,
    embed_edge_features,
    expand_edge_rep,
    init_interaction_net,
)
from ..ops.mlp import apply_mlp, init_mlp
from .base_graph_model import BaseGraphModel, expand_to_batch


class BaseHiGraphModel(BaseGraphModel):
    # Spatial-sharding hooks (see parallel/grid_sharded.py). Defaults keep
    # the unsharded / scheme-1 behavior: every hierarchical GNN psums its
    # partial aggregation over `_mesh_psum_axis` (None outside shard_map)
    # and sender tables are used as-is. The mesh-node-sharded scheme (rs)
    # overrides these per level: level-0 receivers are owner-local (no
    # psum) and level-0 sender tables are all-gathered from owned rows.

    def _hi_psum_axis(self, rec_level):
        """Mesh axis to psum a hierarchical GNN's partial aggregation
        over, by the RECEIVER's level."""
        return self._mesh_psum_axis

    def _hi_sender_rep(self, rep, kind, idx):
        """Hook: the node array the edge set `kind` ("m2m"/"up"/"down")
        with per-level index `idx` gathers its SENDERS from. Identity by
        default; sharded schemes override it where the sender level's
        node state is distributed (e.g. all-gather / halo-exchange the
        owned level-0 rows for m2m[0])."""
        return rep

    _array_fields = BaseGraphModel._array_fields + ("hi_wins",)

    def __init__(self, args, config, datastore, graph=None):
        super().__init__(args, config, datastore, graph)
        assert self.hierarchical, "hierarchical model needs hierarchical graph"
        self.num_levels = len(self.graph.mesh_static_features)
        self.level_mesh_sizes = list(self.graph.level_sizes)
        # per-edge-set window layouts for the fused in-kernel sender
        # gather (None where the set is too small / non-local). Only the
        # bottom levels are big enough to matter at LAM scales, but the
        # build is cheap and the guard is per-set.
        g = self.graph
        self.hi_wins = {}
        self._hi_win_statics = {}
        for kind, sets in (("m2m", g.m2m), ("up", g.up), ("down", g.down)):
            arrs, stats = [], []
            for es in sets:
                win = self._build_edge_win(es)
                arrs.append(win[0] if win else None)
                stats.append(win[1] if win else None)
            self.hi_wins[kind] = arrs
            self._hi_win_statics[kind] = stats

    def _win(self, kind, idx):
        """(win_arrays, win_static) for edge set `kind`[`idx`], or None."""
        arrs = self.hi_wins[kind][idx]
        if arrs is None:
            return None
        return (arrs, self._hi_win_statics[kind][idx])

    def get_num_mesh(self):
        """All mesh nodes; all but bottom level are ignored in encode/decode
        (ref: base_hi_graph_model.py:102-113)."""
        num_mesh_nodes = sum(self.graph.level_sizes)
        num_ignore = num_mesh_nodes - self.graph.level_sizes[0]
        return num_mesh_nodes, num_ignore

    def init_extra_params(self, key) -> dict:
        g = self.graph
        h, hl = self.args.hidden_dim, self.args.hidden_layers
        mesh_dim = g.mesh_static_features[0].shape[1]
        same_dim = g.m2m[0].features.shape[1]
        up_dim = g.up[0].features.shape[1]
        down_dim = g.down[0].features.shape[1]
        L = self.num_levels
        keys = iter(jax.random.split(key, 4 * L + 2 * (L - 1) + 16))
        params = {
            "mesh_embedders": [
                init_mlp(next(keys), [mesh_dim] + self.mlp_blueprint_end)
                for _ in range(L)
            ],
            "mesh_same_embedders": [
                init_mlp(next(keys), [same_dim] + self.mlp_blueprint_end)
                for _ in range(L)
            ],
            "mesh_up_embedders": [
                init_mlp(next(keys), [up_dim] + self.mlp_blueprint_end)
                for _ in range(L - 1)
            ],
            "mesh_down_embedders": [
                init_mlp(next(keys), [down_dim] + self.mlp_blueprint_end)
                for _ in range(L - 1)
            ],
            "mesh_init_gnns": [
                init_interaction_net(next(keys), h, hidden_layers=hl)
                for _ in range(L - 1)
            ],
            "mesh_read_gnns": [
                init_interaction_net(next(keys), h, hidden_layers=hl)
                for _ in range(L - 1)
            ],
        }
        params.update(self.init_hi_processor_params(next(keys)))
        return params

    def init_hi_processor_params(self, key) -> dict:
        raise NotImplementedError

    def embedd_mesh_nodes(self, params):
        """Bottom level only (ref: base_hi_graph_model.py:115-122)."""
        return apply_mlp(
            params["mesh_embedders"][0], self.graph.mesh_static_features[0],
            compute_dtype=self.compute_dtype,
        )

    def precompute_process_ctx(self, params):
        """Level and edge-set embeddings, once per rollout."""
        g = self.graph
        cd = self.compute_dtype
        return {
            "upper_mesh_emb": [
                apply_mlp(emb, feat, compute_dtype=cd)
                for emb, feat in zip(
                    params["mesh_embedders"][1:], g.mesh_static_features[1:]
                )
            ],
            # (interior, frontier) pairs where the sharded sets are split
            "same_emb": [
                embed_edge_features(emb, es, compute_dtype=cd)
                for emb, es in zip(params["mesh_same_embedders"], g.m2m)
            ],
            "up_emb": [
                embed_edge_features(emb, es, compute_dtype=cd)
                for emb, es in zip(params["mesh_up_embedders"], g.up)
            ],
            "down_emb": [
                embed_edge_features(emb, es, compute_dtype=cd)
                for emb, es in zip(params["mesh_down_embedders"], g.down)
            ],
        }

    def process_step(self, params, mesh_rep, batch_size, ctx=None):
        """(ref: base_hi_graph_model.py:124-217)"""
        g = self.graph
        cd = self.compute_dtype
        if ctx is None:
            ctx = self.precompute_process_ctx(params)

        mesh_rep_levels = [mesh_rep] + [
            expand_to_batch(e, batch_size) for e in ctx["upper_mesh_emb"]
        ]
        # edge states in the layout apply_interaction_net will use per edge
        # set (flat (M, B*h) on the flat-lane kernel path)
        mesh_same_rep = [
            expand_edge_rep(es, e, batch_size)
            for es, e in zip(g.m2m, ctx["same_emb"])
        ]
        mesh_up_rep = [
            expand_edge_rep(es, e, batch_size)
            for es, e in zip(g.up, ctx["up_emb"])
        ]
        mesh_down_rep = [
            expand_edge_rep(es, e, batch_size)
            for es, e in zip(g.down, ctx["down_emb"])
        ]

        # MESH INIT: sweep bottom -> top over up edges (update edges)
        for level_l, gnn_p in enumerate(params["mesh_init_gnns"], start=1):
            new_node_rep, new_edge_rep = apply_interaction_net(
                gnn_p, g.up[level_l - 1],
                send_rep=self._hi_sender_rep(
                    mesh_rep_levels[level_l - 1], "up", level_l - 1
                ),
                rec_rep=mesh_rep_levels[level_l],
                edge_rep=mesh_up_rep[level_l - 1],
                update_edges=True, compute_dtype=cd,
                psum_axis=self._hi_psum_axis(level_l),
                win=self._win("up", level_l - 1),
            )
            mesh_rep_levels[level_l] = new_node_rep
            mesh_up_rep[level_l - 1] = new_edge_rep

        # PROCESSOR
        mesh_rep_levels, _, _, mesh_down_rep = self.hi_processor_step(
            params, mesh_rep_levels, mesh_same_rep, mesh_up_rep, mesh_down_rep
        )

        # READ OUT: sweep top -> bottom over down edges (no edge update)
        for level_l, gnn_p in zip(
            range(self.num_levels - 2, -1, -1),
            reversed(params["mesh_read_gnns"]),
        ):
            mesh_rep_levels[level_l] = apply_interaction_net(
                gnn_p, g.down[level_l],
                send_rep=self._hi_sender_rep(
                    mesh_rep_levels[level_l + 1], "down", level_l
                ),
                rec_rep=mesh_rep_levels[level_l],
                edge_rep=mesh_down_rep[level_l],
                update_edges=False, compute_dtype=cd,
                psum_axis=self._hi_psum_axis(level_l),
                win=self._win("down", level_l),
            )

        return mesh_rep_levels[0]

    def hi_processor_step(self, params, mesh_rep_levels, mesh_same_rep,
                          mesh_up_rep, mesh_down_rep):
        raise NotImplementedError
