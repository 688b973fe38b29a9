"""Hi-LAM Parallel: all hierarchical edge sets fused into one kernel.

ref: neural_lam/models/hi_lam_parallel.py:12-99 — m2m + up + down edge sets
concatenated into ONE edge array processed by a single interaction-net stack
with per-chunk MLPs (SplitMLPs); node chunks are the mesh levels. On TPU
this is exactly one fused gather → chunked edge-MLP → segment-sum per layer
over the whole hierarchy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.message_passing import (
    EdgeSet,
    apply_interaction_net_chunked,
    init_interaction_net_chunked,
)
from .base_hi_graph_model import BaseHiGraphModel


class HiLAMParallel(BaseHiGraphModel):
    _array_fields = ("statics", "graph", "joint_edges")

    def __init__(self, args, config, datastore, graph=None):
        super().__init__(args, config, datastore, graph)

        # joint edge set in the global mesh-node index space, chunk order
        # m2m levels, then up, then down (ref: hi_lam_parallel.py:26-32)
        first_index = np.concatenate(
            ([0], np.cumsum(self.level_mesh_sizes[:-1]))
        ).astype(np.int64)
        total_mesh = sum(self.level_mesh_sizes)

        sets = []
        for lev, es in enumerate(self.graph.m2m):
            sets.append((np.asarray(es.senders) + first_index[lev],
                         np.asarray(es.receivers) + first_index[lev],
                         np.asarray(es.features), np.asarray(es.mask)))
        for lev, es in enumerate(self.graph.up):
            sets.append((np.asarray(es.senders) + first_index[lev],
                         np.asarray(es.receivers) + first_index[lev + 1],
                         np.asarray(es.features), np.asarray(es.mask)))
        for lev, es in enumerate(self.graph.down):
            sets.append((np.asarray(es.senders) + first_index[lev + 1],
                         np.asarray(es.receivers) + first_index[lev],
                         np.asarray(es.features), np.asarray(es.mask)))

        self.edge_split_sections = [s[0].shape[0] for s in sets]
        joint = EdgeSet.from_local(
            senders=np.concatenate([s[0] for s in sets]),
            receivers=np.concatenate([s[1] for s in sets]),
            features=np.concatenate([s[2] for s in sets]),
            num_send=total_mesh, num_rec=total_mesh,
            sort=False,  # keep chunk order for SplitMLPs semantics
        )
        import dataclasses as _dc
        import jax.numpy as _jnp

        self.joint_edges = _dc.replace(
            joint, mask=_jnp.asarray(np.concatenate([s[3] for s in sets]))
        )
        self.chunk_meta = {
            "edge_sizes": self.edge_split_sections,
            "node_sizes": self.level_mesh_sizes,
        }

    def init_hi_processor_params(self, key) -> dict:
        h, hl = self.args.hidden_dim, self.args.hidden_layers
        P = self.args.processor_layers
        keys = jax.random.split(key, max(P, 1))
        return {
            "processor": [
                init_interaction_net_chunked(
                    k, h,
                    n_edge_chunks=len(self.edge_split_sections),
                    n_node_chunks=self.num_levels,
                    hidden_layers=hl,
                )
                for k in keys[:P]
            ],
        }

    def hi_processor_step(self, params, mesh_rep_levels, mesh_same_rep,
                          mesh_up_rep, mesh_down_rep):
        """(ref: hi_lam_parallel.py:55-99)"""
        L = self.num_levels
        mesh_rep = jnp.concatenate(mesh_rep_levels, axis=-2)  # (B, N_mesh, d)
        mesh_edge_rep = jnp.concatenate(
            list(mesh_same_rep) + list(mesh_up_rep) + list(mesh_down_rep),
            axis=-2,
        )  # (B, M_total, d)

        for p in params["processor"]:
            mesh_rep, mesh_edge_rep = apply_interaction_net_chunked(
                p, self.chunk_meta, self.joint_edges, mesh_rep, mesh_edge_rep,
                compute_dtype=self.compute_dtype,
            )

        # split back per level / edge set
        sizes = np.cumsum(self.level_mesh_sizes)[:-1]
        mesh_rep_levels = list(jnp.split(mesh_rep, sizes, axis=-2))
        esizes = np.cumsum(self.edge_split_sections)[:-1]
        sections = jnp.split(mesh_edge_rep, esizes, axis=-2)
        mesh_same_rep = sections[:L]
        mesh_up_rep = sections[L : L + (L - 1)]
        mesh_down_rep = sections[L + (L - 1) :]
        return mesh_rep_levels, mesh_same_rep, mesh_up_rep, mesh_down_rep
