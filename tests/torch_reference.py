"""Faithful torch re-expression of the reference model math, with the
reference's state-dict naming, for cross-framework parity tests.

This mirrors neural_lam's make_mlp (utils.py:191-214), InteractionNet
(interaction_net.py:10-131, minus PyG — scatter_add over local indices),
BaseGraphModel.predict_step (base_graph_model.py:106-177), GraphLAM
(graph_lam.py), the hierarchical models (base_hi_graph_model.py, hi_lam.py,
hi_lam_parallel.py) and ARModel.unroll_prediction (ar_model.py:220-267).
"""

import numpy as np
import torch
from torch import nn


def make_mlp(blueprint, layer_norm=True):
    hidden_layers = len(blueprint) - 2
    layers = []
    for layer_i, (d1, d2) in enumerate(zip(blueprint[:-1], blueprint[1:])):
        layers.append(nn.Linear(d1, d2))
        if layer_i != hidden_layers:
            layers.append(nn.SiLU())
    if layer_norm:
        layers.append(nn.LayerNorm(blueprint[-1]))
    return nn.Sequential(*layers)


def scatter_sum(messages, index, n_rows):
    """(B, M, d) -> (B, n_rows, d) sum by receiver index."""
    B, M, d = messages.shape
    out = torch.zeros(B, n_rows, d, dtype=messages.dtype)
    idx = torch.as_tensor(index, dtype=torch.int64)[None, :, None].expand(B, M, d)
    return out.scatter_add(1, idx, messages)


class SplitMLPs(nn.Module):
    def __init__(self, mlps, chunk_sizes):
        super().__init__()
        self.mlps = nn.ModuleList(mlps)
        self.chunk_sizes = chunk_sizes

    def forward(self, x):
        chunks = torch.split(x, self.chunk_sizes, dim=-2)
        return torch.cat(
            [mlp(chunk) for mlp, chunk in zip(self.mlps, chunks)], dim=-2
        )


class InteractionNet(nn.Module):
    """Reference InteractionNet over local sender/receiver index arrays."""

    def __init__(self, senders, receivers, n_send, n_rec, hidden_dim,
                 hidden_layers=1, update_edges=True, aggr="sum",
                 edge_chunk_sizes=None, aggr_chunk_sizes=None):
        super().__init__()
        self.senders = np.asarray(senders)
        self.receivers = np.asarray(receivers)
        self.n_rec = n_rec
        self.update_edges = update_edges
        self.aggr = aggr
        edge_recipe = [3 * hidden_dim] + [hidden_dim] * (hidden_layers + 1)
        aggr_recipe = [2 * hidden_dim] + [hidden_dim] * (hidden_layers + 1)
        if edge_chunk_sizes is None:
            self.edge_mlp = make_mlp(edge_recipe)
        else:
            self.edge_mlp = SplitMLPs(
                [make_mlp(edge_recipe) for _ in edge_chunk_sizes],
                edge_chunk_sizes,
            )
        if aggr_chunk_sizes is None:
            self.aggr_mlp = make_mlp(aggr_recipe)
        else:
            self.aggr_mlp = SplitMLPs(
                [make_mlp(aggr_recipe) for _ in aggr_chunk_sizes],
                aggr_chunk_sizes,
            )

    def forward(self, send_rep, rec_rep, edge_rep):
        x_j = send_rep[:, self.senders]
        x_i = rec_rep[:, self.receivers]
        messages = self.edge_mlp(torch.cat((edge_rep, x_j, x_i), dim=-1))
        aggregated = scatter_sum(messages, self.receivers, self.n_rec)
        if self.aggr == "mean":
            counts = np.maximum(
                np.bincount(self.receivers, minlength=self.n_rec), 1
            )
            aggregated = aggregated / torch.tensor(
                counts, dtype=aggregated.dtype
            )[None, :, None]
        rec_rep = rec_rep + self.aggr_mlp(
            torch.cat((rec_rep, aggregated), dim=-1)
        )
        if self.update_edges:
            return rec_rep, edge_rep + messages
        return rec_rep


def _es(edge_set):
    """EdgeSet -> (senders, receivers, features, n_send, n_rec)."""
    return (
        np.asarray(edge_set.senders),
        np.asarray(edge_set.receivers),
        torch.tensor(np.asarray(edge_set.features)),
        edge_set.num_send,
        edge_set.num_rec,
    )


class TorchBaseGraphModel(nn.Module):
    """predict_step of base_graph_model.py + unroll of ar_model.py."""

    def __init__(self, graph, statics, grid_dim, grid_output_dim,
                 hidden_dim=8, hidden_layers=1, output_std=False):
        super().__init__()
        self.graph = graph
        self.output_std = output_std
        self.register_buffer("grid_static_features",
                             torch.tensor(np.asarray(statics.grid_static_features)))
        self.register_buffer("diff_mean", torch.tensor(np.asarray(statics.diff_mean)))
        self.register_buffer("diff_std", torch.tensor(np.asarray(statics.diff_std)))
        self.register_buffer("boundary_mask",
                             torch.tensor(np.asarray(statics.boundary_mask)))
        self.register_buffer("interior_mask",
                             torch.tensor(np.asarray(statics.interior_mask)))

        mlp_end = [hidden_dim] * (hidden_layers + 1)
        self.mlp_blueprint_end = mlp_end
        self.hidden_dim = hidden_dim
        self.hidden_layers = hidden_layers
        self.grid_embedder = make_mlp([grid_dim] + mlp_end)
        s, r, f, ns, nr = _es(graph.g2m)
        self.g2m_features = f
        self.g2m_embedder = make_mlp([f.shape[1]] + mlp_end)
        self.g2m_gnn = InteractionNet(s, r, ns, nr, hidden_dim, hidden_layers,
                                      update_edges=False)
        self.encoding_grid_mlp = make_mlp([hidden_dim] + mlp_end)
        s, r, f, ns, nr = _es(graph.m2g)
        self.m2g_features = f
        self.m2g_embedder = make_mlp([f.shape[1]] + mlp_end)
        self.m2g_gnn = InteractionNet(s, r, ns, nr, hidden_dim, hidden_layers,
                                      update_edges=False)
        self.output_map = make_mlp(
            [hidden_dim] * (hidden_layers + 1) + [grid_output_dim],
            layer_norm=False,
        )

    def embedd_mesh_nodes(self):
        raise NotImplementedError

    def process_step(self, mesh_rep):
        raise NotImplementedError

    def predict_step(self, prev_state, prev_prev_state, forcing):
        B = prev_state.shape[0]
        grid_features = torch.cat(
            (prev_state, prev_prev_state, forcing,
             self.grid_static_features.unsqueeze(0).expand(B, -1, -1)),
            dim=-1,
        )
        grid_emb = self.grid_embedder(grid_features)
        g2m_emb = self.g2m_embedder(self.g2m_features)
        m2g_emb = self.m2g_embedder(self.m2g_features)
        mesh_emb = self.embedd_mesh_nodes()

        mesh_rep = self.g2m_gnn(
            grid_emb,
            mesh_emb.unsqueeze(0).expand(B, -1, -1),
            g2m_emb.unsqueeze(0).expand(B, -1, -1),
        )
        grid_rep = grid_emb + self.encoding_grid_mlp(grid_emb)
        mesh_rep = self.process_step(mesh_rep)
        grid_rep = self.m2g_gnn(
            mesh_rep, grid_rep, m2g_emb.unsqueeze(0).expand(B, -1, -1)
        )
        net_output = self.output_map(grid_rep)
        if self.output_std:
            pred_delta_mean, pred_std_raw = net_output.chunk(2, dim=-1)
            pred_std = torch.nn.functional.softplus(pred_std_raw)
        else:
            pred_delta_mean = net_output
            pred_std = None
        rescaled = pred_delta_mean * self.diff_std + self.diff_mean
        return prev_state + rescaled, pred_std

    def unroll_prediction(self, init_states, forcing_features, true_states):
        prev_prev_state = init_states[:, 0]
        prev_state = init_states[:, 1]
        prediction_list = []
        for i in range(forcing_features.shape[1]):
            pred_state, _ = self.predict_step(
                prev_state, prev_prev_state, forcing_features[:, i]
            )
            new_state = (
                self.boundary_mask * true_states[:, i]
                + self.interior_mask * pred_state
            )
            prediction_list.append(new_state)
            prev_prev_state = prev_state
            prev_state = new_state
        return torch.stack(prediction_list, dim=1)


class TorchGraphLAM(TorchBaseGraphModel):
    def __init__(self, graph, *a, mesh_aggr="sum", n_proc=2, **kw):
        super().__init__(graph, *a, **kw)
        self.n_proc = n_proc
        mlp_end = self.mlp_blueprint_end
        self.mesh_static_features = torch.tensor(
            np.asarray(graph.mesh_static_features[0])
        )
        self.mesh_embedder = make_mlp(
            [self.mesh_static_features.shape[1]] + mlp_end
        )
        s, r, f, ns, nr = _es(graph.m2m[0])
        self.m2m_features = f
        self.m2m_embedder = make_mlp([f.shape[1]] + mlp_end)

        class _Proc(nn.Module):
            pass

        proc = _Proc()
        for i in range(self.n_proc):
            setattr(proc, f"module_{i}", InteractionNet(
                s, r, ns, nr, self.hidden_dim, self.hidden_layers,
                aggr=mesh_aggr,
            ))
        self.processor = proc

    def embedd_mesh_nodes(self):
        return self.mesh_embedder(self.mesh_static_features)

    def process_step(self, mesh_rep):
        B = mesh_rep.shape[0]
        edge_rep = self.m2m_embedder(self.m2m_features).unsqueeze(0).expand(
            B, -1, -1
        )
        for i in range(self.n_proc):
            net = getattr(self.processor, f"module_{i}")
            mesh_rep, edge_rep = net(mesh_rep, mesh_rep, edge_rep)
        return mesh_rep


class TorchHiLAM(TorchBaseGraphModel):
    def __init__(self, graph, *a, n_proc=2, **kw):
        super().__init__(graph, *a, **kw)
        self.n_proc = n_proc
        mlp_end = self.mlp_blueprint_end
        h, hl = self.hidden_dim, self.hidden_layers
        self.num_levels = len(graph.mesh_static_features)
        self.mesh_statics = [
            torch.tensor(np.asarray(f)) for f in graph.mesh_static_features
        ]
        mesh_dim = self.mesh_statics[0].shape[1]
        self.mesh_embedders = nn.ModuleList(
            [make_mlp([mesh_dim] + mlp_end) for _ in range(self.num_levels)]
        )
        self.mesh_same_embedders = nn.ModuleList(
            [make_mlp([3] + mlp_end) for _ in range(self.num_levels)]
        )
        self.mesh_up_embedders = nn.ModuleList(
            [make_mlp([3] + mlp_end) for _ in range(self.num_levels - 1)]
        )
        self.mesh_down_embedders = nn.ModuleList(
            [make_mlp([3] + mlp_end) for _ in range(self.num_levels - 1)]
        )

        def inet(es, update_edges=True):
            s, r, f, ns, nr = _es(es)
            return InteractionNet(s, r, ns, nr, h, hl,
                                  update_edges=update_edges)

        self.mesh_init_gnns = nn.ModuleList([inet(es) for es in graph.up])
        self.mesh_read_gnns = nn.ModuleList(
            [inet(es, update_edges=False) for es in graph.down]
        )
        self.mesh_down_gnns = nn.ModuleList([
            nn.ModuleList([inet(es) for es in graph.down])
            for _ in range(n_proc)
        ])
        self.mesh_down_same_gnns = nn.ModuleList([
            nn.ModuleList([inet(es) for es in graph.m2m])
            for _ in range(n_proc)
        ])
        self.mesh_up_gnns = nn.ModuleList([
            nn.ModuleList([inet(es) for es in graph.up])
            for _ in range(n_proc)
        ])
        self.mesh_up_same_gnns = nn.ModuleList([
            nn.ModuleList([inet(es) for es in graph.m2m])
            for _ in range(n_proc)
        ])
        self.graph_obj = graph

    def embedd_mesh_nodes(self):
        return self.mesh_embedders[0](self.mesh_statics[0])

    def process_step(self, mesh_rep):
        B = mesh_rep.shape[0]
        g = self.graph_obj
        exp = lambda t: t.unsqueeze(0).expand(B, -1, -1)
        mesh_rep_levels = [mesh_rep] + [
            exp(emb(feat))
            for emb, feat in zip(self.mesh_embedders[1:], self.mesh_statics[1:])
        ]
        same_rep = [
            exp(emb(torch.tensor(np.asarray(es.features))))
            for emb, es in zip(self.mesh_same_embedders, g.m2m)
        ]
        up_rep = [
            exp(emb(torch.tensor(np.asarray(es.features))))
            for emb, es in zip(self.mesh_up_embedders, g.up)
        ]
        down_rep = [
            exp(emb(torch.tensor(np.asarray(es.features))))
            for emb, es in zip(self.mesh_down_embedders, g.down)
        ]
        # init sweep
        for level_l, gnn in enumerate(self.mesh_init_gnns, start=1):
            new_node, new_edge = gnn(
                mesh_rep_levels[level_l - 1], mesh_rep_levels[level_l],
                up_rep[level_l - 1],
            )
            mesh_rep_levels[level_l] = new_node
            up_rep[level_l - 1] = new_edge
        # processor
        for p in range(self.n_proc):
            down_gnns = self.mesh_down_gnns[p]
            down_same = self.mesh_down_same_gnns[p]
            up_gnns = self.mesh_up_gnns[p]
            up_same = self.mesh_up_same_gnns[p]
            # down sweep
            mesh_rep_levels[-1], same_rep[-1] = down_same[-1](
                mesh_rep_levels[-1], mesh_rep_levels[-1], same_rep[-1]
            )
            for level_l, down_gnn, same_gnn in zip(
                range(self.num_levels - 2, -1, -1),
                reversed(list(down_gnns)),
                reversed(list(down_same)[:-1]),
            ):
                new_node, down_rep[level_l] = down_gnn(
                    mesh_rep_levels[level_l + 1], mesh_rep_levels[level_l],
                    down_rep[level_l],
                )
                mesh_rep_levels[level_l], same_rep[level_l] = same_gnn(
                    new_node, new_node, same_rep[level_l]
                )
            # up sweep
            mesh_rep_levels[0], same_rep[0] = up_same[0](
                mesh_rep_levels[0], mesh_rep_levels[0], same_rep[0]
            )
            for level_l, (up_gnn, same_gnn) in enumerate(
                zip(list(up_gnns), list(up_same)[1:]), start=1
            ):
                new_node, up_rep[level_l - 1] = up_gnn(
                    mesh_rep_levels[level_l - 1], mesh_rep_levels[level_l],
                    up_rep[level_l - 1],
                )
                mesh_rep_levels[level_l], same_rep[level_l] = same_gnn(
                    new_node, new_node, same_rep[level_l]
                )
        # read out
        for level_l, gnn in zip(
            range(self.num_levels - 2, -1, -1), reversed(self.mesh_read_gnns)
        ):
            mesh_rep_levels[level_l] = gnn(
                mesh_rep_levels[level_l + 1], mesh_rep_levels[level_l],
                down_rep[level_l],
            )
        return mesh_rep_levels[0]
