"""Hi-LAM: sequential down/up sweeps through the hierarchy per layer.

ref: neural_lam/models/hi_lam.py:11-207 — per processor layer, a Down sweep
(top→bottom alternating down-edge GNN + same-level GNN) then an Up sweep
(bottom→top alternating up-edge GNN + same-level GNN); distinct GNN stacks
per direction per layer.
"""

from __future__ import annotations

import jax

from ..ops.message_passing import apply_interaction_net, init_interaction_net
from .base_hi_graph_model import BaseHiGraphModel


class HiLAM(BaseHiGraphModel):
    def init_hi_processor_params(self, key) -> dict:
        h, hl = self.args.hidden_dim, self.args.hidden_layers
        L = self.num_levels
        P = self.args.processor_layers
        n_per_layer = (L - 1) + L + (L - 1) + L
        keys = iter(jax.random.split(key, max(P * n_per_layer, 1)))

        def gnns(n):
            return [
                init_interaction_net(next(keys), h, hidden_layers=hl)
                for _ in range(n)
            ]

        return {
            "mesh_down_gnns": [gnns(L - 1) for _ in range(P)],
            "mesh_down_same_gnns": [gnns(L) for _ in range(P)],
            "mesh_up_gnns": [gnns(L - 1) for _ in range(P)],
            "mesh_up_same_gnns": [gnns(L) for _ in range(P)],
        }

    def mesh_down_step(self, mesh_rep_levels, mesh_same_rep, mesh_down_rep,
                       down_gnns, same_gnns):
        """(ref: hi_lam.py:82-124)"""
        g, cd = self.graph, self.compute_dtype
        top = self.num_levels - 1
        # same-level processing on top level L
        mesh_rep_levels[-1], mesh_same_rep[-1] = apply_interaction_net(
            same_gnns[-1], g.m2m[-1],
            self._hi_sender_rep(mesh_rep_levels[-1], "m2m", top),
            mesh_rep_levels[-1],
            mesh_same_rep[-1], compute_dtype=cd,
            psum_axis=self._hi_psum_axis(top),
            win=self._win("m2m", top),
        )
        for level_l, down_gnn, same_gnn in zip(
            range(self.num_levels - 2, -1, -1),
            reversed(down_gnns),
            reversed(same_gnns[:-1]),
        ):
            new_node_rep, mesh_down_rep[level_l] = apply_interaction_net(
                down_gnn, g.down[level_l],
                send_rep=self._hi_sender_rep(
                    mesh_rep_levels[level_l + 1], "down", level_l
                ),
                rec_rep=mesh_rep_levels[level_l],
                edge_rep=mesh_down_rep[level_l], compute_dtype=cd,
                psum_axis=self._hi_psum_axis(level_l),
                win=self._win("down", level_l),
            )
            mesh_rep_levels[level_l], mesh_same_rep[level_l] = (
                apply_interaction_net(
                    same_gnn, g.m2m[level_l],
                    self._hi_sender_rep(new_node_rep, "m2m", level_l),
                    new_node_rep,
                    mesh_same_rep[level_l], compute_dtype=cd,
                    psum_axis=self._hi_psum_axis(level_l),
                    win=self._win("m2m", level_l),
                )
            )
        return mesh_rep_levels, mesh_same_rep, mesh_down_rep

    def mesh_up_step(self, mesh_rep_levels, mesh_same_rep, mesh_up_rep,
                     up_gnns, same_gnns):
        """(ref: hi_lam.py:126-163)"""
        g, cd = self.graph, self.compute_dtype
        # same-level processing on level 0
        mesh_rep_levels[0], mesh_same_rep[0] = apply_interaction_net(
            same_gnns[0], g.m2m[0],
            self._hi_sender_rep(mesh_rep_levels[0], "m2m", 0),
            mesh_rep_levels[0],
            mesh_same_rep[0], compute_dtype=cd,
            psum_axis=self._hi_psum_axis(0),
            win=self._win("m2m", 0),
        )
        for level_l, (up_gnn, same_gnn) in enumerate(
            zip(up_gnns, same_gnns[1:]), start=1
        ):
            new_node_rep, mesh_up_rep[level_l - 1] = apply_interaction_net(
                up_gnn, g.up[level_l - 1],
                send_rep=self._hi_sender_rep(
                    mesh_rep_levels[level_l - 1], "up", level_l - 1
                ),
                rec_rep=mesh_rep_levels[level_l],
                edge_rep=mesh_up_rep[level_l - 1], compute_dtype=cd,
                psum_axis=self._hi_psum_axis(level_l),
                win=self._win("up", level_l - 1),
            )
            mesh_rep_levels[level_l], mesh_same_rep[level_l] = (
                apply_interaction_net(
                    same_gnn, g.m2m[level_l],
                    self._hi_sender_rep(new_node_rep, "m2m", level_l),
                    new_node_rep,
                    mesh_same_rep[level_l], compute_dtype=cd,
                    psum_axis=self._hi_psum_axis(level_l),
                    win=self._win("m2m", level_l),
                )
            )
        return mesh_rep_levels, mesh_same_rep, mesh_up_rep

    def hi_processor_step(self, params, mesh_rep_levels, mesh_same_rep,
                          mesh_up_rep, mesh_down_rep):
        """(ref: hi_lam.py:165-207)"""
        for down_gnns, down_same_gnns, up_gnns, up_same_gnns in zip(
            params["mesh_down_gnns"],
            params["mesh_down_same_gnns"],
            params["mesh_up_gnns"],
            params["mesh_up_same_gnns"],
        ):
            mesh_rep_levels, mesh_same_rep, mesh_down_rep = self.mesh_down_step(
                mesh_rep_levels, mesh_same_rep, mesh_down_rep,
                down_gnns, down_same_gnns,
            )
            mesh_rep_levels, mesh_same_rep, mesh_up_rep = self.mesh_up_step(
                mesh_rep_levels, mesh_same_rep, mesh_up_rep,
                up_gnns, up_same_gnns,
            )
        return mesh_rep_levels, mesh_same_rep, mesh_up_rep, mesh_down_rep
