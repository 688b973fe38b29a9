"""Flat (non-hierarchical) GraphCast/Keisler-style model.

ref: neural_lam/models/graph_lam.py:12-91 — mesh & m2m embedders, processor
stack of interaction nets over the single merged multiscale m2m edge set.
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
from .base_graph_model import BaseGraphModel


class GraphLAM(BaseGraphModel):
    _array_fields = BaseGraphModel._array_fields + ("m2m_win",)

    def __init__(self, args, config, datastore, graph=None):
        super().__init__(args, config, datastore, graph)
        assert not self.hierarchical, (
            "GraphLAM does not use a hierarchical mesh graph"
        )
        # window layout for fusing the m2m sender gather into the
        # processor edge-layer kernel (both endpoints mesh-ordered, so
        # per-tile sender windows are narrow)
        self.m2m_win = None
        self._m2m_win_static = None
        win = self._build_edge_win(self.m2m)
        if win is not None:
            self.m2m_win, self._m2m_win_static = win


    @property
    def m2m(self):
        return self.graph.m2m[0]

    @property
    def mesh_static(self):
        return self.graph.mesh_static_features[0]

    def get_num_mesh(self):
        return self.graph.level_sizes[0], 0

    def init_extra_params(self, key) -> dict:
        mesh_dim = self.mesh_static.shape[1]
        m2m_dim = self.m2m.features.shape[1]
        h, hl = self.args.hidden_dim, self.args.hidden_layers
        keys = jax.random.split(key, self.args.processor_layers + 2)
        return {
            "mesh_embedder": init_mlp(
                keys[0], [mesh_dim] + self.mlp_blueprint_end
            ),
            "m2m_embedder": init_mlp(keys[1], [m2m_dim] + self.mlp_blueprint_end),
            "processor": [
                init_interaction_net(k, h, hidden_layers=hl)
                for k in keys[2:]
            ],
        }

    def embedd_mesh_nodes(self, params):
        return apply_mlp(params["mesh_embedder"], self.mesh_static,
                         compute_dtype=self.compute_dtype)

    def precompute_process_ctx(self, params):
        return {
            # (interior, frontier) pair for split sharded m2m chunks
            "m2m_emb": embed_edge_features(
                params["m2m_embedder"], self.m2m,
                compute_dtype=self.compute_dtype,
            )
        }

    def attach_process_consts(self, params, ctx, batch_size):
        """Scan-hoisted widened kernel params, one tuple per processor
        layer (see BaseGraphModel._attach_flat_consts)."""
        from ..ops.message_passing import flat_eligible
        from ..ops.pallas_edge_flat import layer_consts

        h = self.args.hidden_dim
        if not flat_eligible(self.m2m, batch_size, h):
            return
        consts = []
        for p in params["processor"]:
            mlp = p["edge_mlp"]
            if len(mlp["layers"]) != 2 or mlp["ln"] is None:
                return
            w0, b0 = mlp["layers"][0]["w"], mlp["layers"][0]["b"]
            consts.append(jax.lax.stop_gradient(layer_consts(
                w0[:h], b0, mlp["layers"][1]["w"], mlp["layers"][1]["b"],
                mlp["ln"]["scale"], mlp["ln"]["bias"], batch_size,
            )))
        ctx["proc_consts"] = consts

    def process_step(self, params, mesh_rep, batch_size, ctx=None):
        """Processor stack sharing the single m2m edge set
        (ref: graph_lam.py:73-91)."""
        if ctx is None:
            ctx = self.precompute_process_ctx(params)
        # layout-appropriate initial edge state (flat (M, B*h) on the
        # flat-lane kernel path, batched (B, M, h) otherwise)
        edge_rep = expand_edge_rep(self.m2m, ctx["m2m_emb"], batch_size)
        proc_consts = ctx.get("proc_consts")
        win = (
            (self.m2m_win, self._m2m_win_static)
            if self.m2m_win is not None else None
        )
        for i, p in enumerate(params["processor"]):
            mesh_rep, edge_rep = apply_interaction_net(
                p, self.m2m, self._mesh_sender_rep(mesh_rep), mesh_rep,
                edge_rep,
                aggr=self.args.mesh_aggr, compute_dtype=self.compute_dtype,
                psum_axis=self._mesh_psum_axis,
                consts=proc_consts[i] if proc_consts else None,
                win=win,
            )
        return mesh_rep
