"""Encode-process-decode skeleton over a loaded graph.

ref: neural_lam/models/base_graph_model.py:12-177 — grid/g2m/m2g embedders,
g2m encoder GNN with residual grid MLP, abstract processor, m2g decoder GNN,
output MLP (no LayerNorm), delta-prediction with diff-stat rescale and
residual over prev_state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.storage import LoadedGraph
from ..ops.message_passing import apply_interaction_net, init_interaction_net
from ..ops.mlp import apply_mlp, apply_mlp_concat, init_mlp, mlp_blueprint
from .ar_model import ARModelBase, ModelArgs


def expand_to_batch(x, batch_size):
    """(N, d) -> (B, N, d) broadcast (ref: ar_model.py:204-209)."""
    return jnp.broadcast_to(x[None], (batch_size,) + x.shape)


class BaseGraphModel(ARModelBase):
    _array_fields = ("statics", "graph", "m2g_win")
    # set inside spatial shard_map bodies (see parallel/grid_sharded.py):
    # _g2m_psum_axis — mesh axis to psum partial g2m aggregations over;
    # _mesh_psum_axis — mesh axis to psum partial mesh-level (m2m/up/down)
    # aggregations over, set when those edge sets are sharded edge-chunks
    _g2m_psum_axis = None
    _mesh_psum_axis = None
    # "scatter": reduce-scatter g2m partials to the receiver's owner shard
    # and keep mesh state OWNED-rows from there on (mesh-node sharding);
    # pairs with a _mesh_sender_rep override that all-gathers senders
    _g2m_psum_mode = "allreduce"

    def _mesh_sender_rep(self, mesh_rep):
        """Hook: the mesh array edge SENDERS gather from. Identity when
        mesh state is replicated; the mesh-node-sharded scheme overrides
        this with an all-gather of the owned rows (or a cut-edge halo
        exchange)."""
        return mesh_rep

    def _m2g_sender_rep(self, mesh_rep):
        """Hook: the sender table for the m2g decoder specifically.
        Defaults to `_mesh_sender_rep`; the halo scheme overrides it with
        the m2g-specific exchange (its cut-edge set differs from the
        processor's)."""
        return self._mesh_sender_rep(mesh_rep)

    def _m2g_sender_tf(self, mesh_rep, w_j, cd):
        """Hook: the TRANSFORMED flat m2g sender table (N_send, B*h) the
        fused decoder gathers from. The mesh-node-sharded rs scheme
        overrides this to transform the owned rows first and all-gather
        the transformed (cast) table — no shard transforms rows it does
        not own, and bf16 halves the gathered bytes."""
        from ..ops.message_passing import node_transform_flat

        send_tf = node_transform_flat(self._m2g_sender_rep(mesh_rep),
                                      w_j, cd)
        if cd is not None:
            send_tf = send_tf.astype(cd)
        return send_tf

    def __init__(self, args: ModelArgs, config, datastore,
                 graph: LoadedGraph | None = None):
        super().__init__(args, config, datastore)
        if graph is None:
            # load from <datastore root>/graph/<name>
            # (ref: base_graph_model.py:24-33)
            from ..graph.storage import load_graph

            graph_dir = datastore.root_path / "graph" / args.graph
            if not (graph_dir / "meta.json").exists():
                # auto-build by archetype name ("hierarchical"/"1level"/
                # multiscale default) so the train CLI is self-sufficient —
                # essential for datastores with per-process roots (dummy).
                # Built in a pid-unique dir + atomic rename: on a SHARED
                # root several ranks may race here, first one wins.
                import os

                print(f"graph '{args.graph}' not found under "
                      f"{graph_dir.parent}; building it")
                name = args.graph.lower()
                tmp = graph_dir.parent / f".{args.graph}.tmp{os.getpid()}"
                if getattr(datastore, "is_global", False):
                    # planar lattices are wrong on the sphere: global
                    # datastores get an icosahedral mesh
                    from ..graph.global_mesh import create_global_graph

                    create_global_graph(
                        str(tmp),
                        datastore.get_xy("state", stacked=True),
                        n_levels=2 if "hier" in name else None,
                        hierarchical="hier" in name,
                    )
                else:
                    from ..graph.build import create_graph

                    create_graph(
                        str(tmp),
                        datastore.get_xy("state", stacked=False),
                        n_max_levels=1 if "1level" in name else None,
                        hierarchical="hier" in name,
                    )
                try:
                    os.rename(tmp, graph_dir)
                except OSError:  # another rank won the race
                    import shutil

                    shutil.rmtree(tmp, ignore_errors=True)
            _, graph = load_graph(str(graph_dir))
        self.graph = graph
        assert graph.num_grid_nodes == self.num_grid_nodes, (
            f"graph has {graph.num_grid_nodes} grid nodes but datastore has "
            f"{self.num_grid_nodes}"
        )
        self.hierarchical = graph.hierarchical
        # [hidden_dim] * (hidden_layers + 1)
        # (ref: base_graph_model.py:48)
        self.mlp_blueprint_end = [args.hidden_dim] * (args.hidden_layers + 1)
        self.num_mesh_nodes, _ = self.get_num_mesh()
        # host-side window layout for the fused in-kernel m2g sender
        # gather (ops/pallas_grid_update.prep_window_gather); None when the
        # graph's sender locality doesn't support it
        self.m2g_win = None
        self._m2g_win_static = None
        m2g = graph.m2g
        if m2g.dense_k and m2g.virt_identity:
            from ..ops.pallas_grid_update import prep_window_gather

            win = prep_window_gather(
                np.asarray(m2g.senders), np.asarray(m2g.mask),
                m2g.num_virt, m2g.dense_k, m2g.num_send,
            )
            if win is not None:
                self.m2g_win, self._m2g_win_static = win

    def _build_edge_win(self, edges, target_rows=None):
        """Host-side window layout (prep_window_gather) for fusing an edge
        set's sender gather into its Pallas kernel; None when the set's
        sender locality doesn't support it. target_rows picks the kernel
        tile (NLT_WIN_ROWS overrides; the one-hot reconstruct cost scales
        with the window width, which shrinks with the tile)."""
        if not edges.dense_k:
            return None
        import os

        from ..ops.pallas_grid_update import prep_window_gather

        env = os.environ.get("NLT_WIN_ROWS")
        if env:
            target_rows = int(env)
        senders = np.asarray(edges.senders)
        mask = np.asarray(edges.mask)
        if target_rows is not None:
            return prep_window_gather(
                senders, mask, edges.num_virt, edges.dense_k,
                edges.num_send, target_rows=target_rows,
            )
        # the default kernel tile can be so large that a tile's sender
        # window exceeds max_wrows (e.g. the global icosahedral level-0
        # mesh, where the divisor search lands on a 1312-row tile);
        # retry smaller tiles and keep the narrowest window — the
        # one-hot reconstruct cost scales with wrows, smaller tiles
        # only add grid steps
        best = None
        for tr in (None, 4096, 2048, 1024):
            win = prep_window_gather(
                senders, mask, edges.num_virt, edges.dense_k,
                edges.num_send, target_rows=tr,
            )
            if win is None:
                continue
            if best is None or win[1]["wrows"] < best[1]["wrows"]:
                best = win
            if best[1]["wrows"] <= 512:
                break
        return best

    # --- abstract over mesh structure (ref: base_graph_model.py:82-104) ---

    def get_num_mesh(self):
        raise NotImplementedError

    def embedd_mesh_nodes(self, params):
        raise NotImplementedError

    def process_step(self, params, mesh_rep, batch_size, ctx=None):
        raise NotImplementedError

    def init_extra_params(self, key) -> dict:
        """Subclass parameters (mesh embedders + processor)."""
        raise NotImplementedError

    # --- parameters ---

    def init_params(self, key) -> dict:
        g2m_dim = self.graph.g2m.features.shape[1]
        m2g_dim = self.graph.m2g.features.shape[1]
        keys = jax.random.split(key, 8)
        h = self.args.hidden_dim
        hl = self.args.hidden_layers
        params = {
            "grid_embedder": init_mlp(
                keys[0], [self.grid_dim] + self.mlp_blueprint_end
            ),
            "g2m_embedder": init_mlp(keys[1], [g2m_dim] + self.mlp_blueprint_end),
            "m2g_embedder": init_mlp(keys[2], [m2g_dim] + self.mlp_blueprint_end),
            "g2m_gnn": init_interaction_net(keys[3], h, hidden_layers=hl),
            "encoding_grid_mlp": init_mlp(
                keys[4], [h] + self.mlp_blueprint_end
            ),
            "m2g_gnn": init_interaction_net(keys[5], h, hidden_layers=hl),
            "output_map": init_mlp(
                keys[6],
                [h] * (hl + 1) + [self.grid_output_dim],
                layer_norm=False,  # no output LN (ref: base_graph_model.py:76-80)
            ),
        }
        params.update(self.init_extra_params(keys[7]))
        return params

    # --- forward (ref: base_graph_model.py:106-177) ---

    def _static_edge_ctx(self, inet_params, embedder_params, edges):
        """Rollout-invariant edge tensor for an update_edges=False GNN:
        the dense path takes ew = emb @ W_e + b0 directly. Split sharded
        sets get an extra "ew_f" for the frontier chunk."""
        import jax.numpy as jnp

        cd = self.compute_dtype
        emb = apply_mlp(embedder_params, edges.features, compute_dtype=cd)
        if not edges.dense_k:
            return {"emb": emb}
        w0 = inet_params["edge_mlp"]["layers"][0]["w"]
        b0 = inet_params["edge_mlp"]["layers"][0]["b"]
        d = w0.shape[0] // 3
        ctx = {"ew": jnp.dot(emb, w0[:d],
                             preferred_element_type=jnp.float32) + b0}
        if edges.frontier is not None:
            emb_f = apply_mlp(embedder_params, edges.frontier.features,
                              compute_dtype=cd)
            ctx["ew_f"] = jnp.dot(
                emb_f, w0[:d], preferred_element_type=jnp.float32
            ) + b0
        if cd is not None:
            # store the rollout-invariant edge tensor in the compute
            # dtype: trace_summary showed the g2m/m2g kernels streaming
            # f32[M,64] ew operands (~94 MB/step combined) in bf16 mode
            ctx = {k: v.astype(cd) for k, v in ctx.items()}
        return ctx

    def precompute_rollout_ctx(self, params, batch_size=None):
        """Embeddings of static graph features, computed once per rollout
        (the reference recomputes them every step,
        ref: base_graph_model.py:127-130).

        When batch_size is known, also hoists the flat kernels' widened
        parameter buffers out of the rollout scan (XLA's loop LICM
        declines to; probes/compose_gap.py measured ~0.8 ms/step of
        re-widening for the decode kernel alone)."""
        ctx = {
            "mesh_emb": self.embedd_mesh_nodes(params),
            "g2m": self._static_edge_ctx(
                params["g2m_gnn"], params["g2m_embedder"], self.graph.g2m
            ),
            "m2g": self._static_edge_ctx(
                params["m2g_gnn"], params["m2g_embedder"], self.graph.m2g
            ),
        }
        ctx.update(self.precompute_process_ctx(params))
        if batch_size is not None:
            self._attach_flat_consts(params, ctx, batch_size)
        return ctx

    def precompute_process_ctx(self, params):
        """Subclass hook: processor-related rollout-invariant tensors."""
        return {}

    def _attach_flat_consts(self, params, ctx, batch_size):
        """Attach scan-hoisted widened kernel params for the flat paths.
        All consts are stop_gradient'd: they are forward-value shortcuts —
        parameter gradients flow through the raw params the kernels also
        receive."""
        from ..ops.message_passing import flat_eligible
        from ..ops.pallas_edge_flat import tail_consts
        from ..ops.pallas_grid_update import (
            grid_update_applicable,
            pack_grid_update_params,
            prep_grid_update_consts,
        )

        h = self.args.hidden_dim
        B = batch_size
        sg = jax.lax.stop_gradient

        def tail_ok(inet_params, edges):
            mlp = inet_params["edge_mlp"]
            return (
                flat_eligible(edges, B, h)
                and len(mlp["layers"]) == 2 and mlp["ln"] is not None
            )

        def tail_of(inet_params):
            mlp = inet_params["edge_mlp"]
            return sg(tail_consts(
                mlp["layers"][1]["w"], mlp["layers"][1]["b"],
                mlp["ln"]["scale"], mlp["ln"]["bias"], B,
            ))

        from ..ops.pallas_embed import embed_applicable, embed_consts

        emb_p = params["grid_embedder"]
        if embed_applicable(emb_p, B, h) and 128 % B == 0:
            import math

            m = 128 // math.gcd(B, 128)
            d_in = emb_p["layers"][0]["w"].shape[0]
            d_pad = -(-d_in // m) * m
            ctx["embed_consts"] = sg(embed_consts(
                emb_p["layers"][0]["w"], emb_p["layers"][0]["b"],
                emb_p["layers"][1]["w"], emb_p["layers"][1]["b"],
                emb_p["ln"]["scale"], emb_p["ln"]["bias"], B, d_pad,
            ))
        if "ew" in ctx["g2m"] and tail_ok(params["g2m_gnn"], self.graph.g2m):
            ctx["g2m"]["consts"] = tail_of(params["g2m_gnn"])
        if "ew" in ctx["m2g"]:
            if grid_update_applicable(params, self.graph.m2g, B, h):
                ctx["m2g"]["dec_consts"] = sg(prep_grid_update_consts(
                    pack_grid_update_params(params), B
                ))
            elif tail_ok(params["m2g_gnn"], self.graph.m2g):
                ctx["m2g"]["consts"] = tail_of(params["m2g_gnn"])
        self.attach_process_consts(params, ctx, batch_size)

    def attach_process_consts(self, params, ctx, batch_size):
        """Subclass hook: scan-hoisted consts for the processor layers."""

    def _inet_static(self, inet_params, edges, send_rep, rec_rep, ctx_entry,
                     batch_size, psum_axis=None, psum_mode="allreduce"):
        """update_edges=False interaction net with precomputed edge ctx."""
        cd = self.compute_dtype
        if "ew" in ctx_entry:
            ew = ctx_entry["ew"]
            if edges.frontier is not None:
                ew = (ew, ctx_entry["ew_f"])
            return apply_interaction_net(
                inet_params, edges, send_rep, rec_rep,
                update_edges=False, compute_dtype=cd, ew=ew,
                psum_axis=psum_axis, psum_mode=psum_mode,
                consts=ctx_entry.get("consts"),
            )
        return apply_interaction_net(
            inet_params, edges, send_rep, rec_rep,
            edge_rep=expand_to_batch(ctx_entry["emb"], batch_size),
            update_edges=False, compute_dtype=cd, psum_axis=psum_axis,
            psum_mode=psum_mode,
        )

    def _flat_grid_eligible(self, params, ctx, batch_size: int) -> bool:
        """Whether the fully-fused flat-grid decode path applies: flat
        kernels on for both g2m and m2g, virt_identity m2g, reference
        2-layer MLP structure (see ops/pallas_grid_update.py)."""
        from ..ops.message_passing import flat_eligible
        from ..ops.pallas_grid_update import grid_update_applicable

        h = self.args.hidden_dim
        g = self.graph
        return (
            "ew" in ctx.get("g2m", {})
            and "ew" in ctx.get("m2g", {})
            and grid_update_applicable(params, g.m2g, batch_size, h)
            and flat_eligible(g.g2m, batch_size, h)
            and len(params["g2m_gnn"]["edge_mlp"]["layers"]) == 2
            and params["g2m_gnn"]["edge_mlp"]["ln"] is not None
        )

    def _finish_output(self, net_output, prev_state):
        """Split std head, rescale the delta, residual over prev_state
        (ref: base_graph_model.py:160-177)."""
        if self.output_std:
            pred_delta_mean, pred_std_raw = jnp.split(net_output, 2, axis=-1)
            pred_std = jax.nn.softplus(pred_std_raw)
        else:
            pred_delta_mean = net_output
            pred_std = None
        rescaled_delta_mean = (
            pred_delta_mean * self.statics.diff_std + self.statics.diff_mean
        )
        return prev_state + rescaled_delta_mean, pred_std

    def _embed_grid_f(self, params, prev_state, prev_prev_state, forcing,
                      ctx, B):
        """Flat (N, B*h) grid embedding; fused Pallas kernel when
        eligible (ops/pallas_embed.py), else the XLA flat path."""
        import math

        from ..ops.message_passing import (
            _pallas_mode,
            apply_mlp_concat_flat,
            flatten_nodes,
        )
        from ..ops.pallas_embed import embed_applicable, embed_grid_flat

        cd = self.compute_dtype
        h = self.args.hidden_dim
        emb_p = params["grid_embedder"]
        stat = self.statics.grid_static_features
        parts = [prev_state, prev_prev_state, forcing]
        d_cat = sum(p.shape[-1] for p in parts) + stat.shape[-1]
        if (_pallas_mode() != "off" and embed_applicable(emb_p, B, h)
                and 128 % B == 0
                and d_cat == emb_p["layers"][0]["w"].shape[0]):
            # pack once into the flat-lane layout (feature pad -> one
            # XLA transpose), then one fused kernel pass fwd and one bwd
            d_pad = -(-d_cat // (128 // math.gcd(B, 128))) \
                * (128 // math.gcd(B, 128))
            xb = jnp.concatenate(
                parts + [jnp.broadcast_to(stat[None], (B,) + stat.shape)],
                axis=-1,
            )
            if cd is not None:
                # same input rounding as the XLA path's _einsum_f32acc
                xb = xb.astype(cd)
            xb = jnp.pad(xb, ((0, 0), (0, 0), (0, d_pad - d_cat)))
            return embed_grid_flat(
                flatten_nodes(xb), emb_p, B, d_pad,
                interpret=_pallas_mode() == "interpret",
                consts=ctx.get("embed_consts") if ctx else None,
                out_dtype=cd,
            )
        return apply_mlp_concat_flat(
            emb_p, parts + [stat], compute_dtype=cd,
        )

    def _predict_step_flat_grid(self, params, prev_state, prev_prev_state,
                                forcing, ctx, batch_size):
        """Fused flat-grid predict step: the grid side lives in flat
        (N, B*h) lane layout end to end — grid embedder emits flat, g2m
        consumes the flat sender directly, and the whole decoder
        (encoding_grid_mlp + m2g GNN + output_map) runs as ONE Pallas
        kernel pass (ops/pallas_grid_update.py). Mathematically identical
        to the batched path; engaged when `_flat_grid_eligible`."""
        from ..ops.message_passing import (
            _apply_inet_flat,
            _pallas_mode,
            apply_mlp_concat_flat,
            gather_send_flat,
            unflatten_nodes,
        )
        from ..ops.pallas_grid_update import (
            grid_update_flat,
            pack_grid_update_params,
        )

        cd = self.compute_dtype
        B = batch_size
        h = self.args.hidden_dim
        ge_f = self._embed_grid_f(params, prev_state, prev_prev_state,
                                  forcing, ctx, B)  # (N_grid, B*h)

        mesh_rep = _apply_inet_flat(
            params["g2m_gnn"], self.graph.g2m, ge_f,
            expand_to_batch(ctx["mesh_emb"], B),
            update_edges=False, aggr="sum", compute_dtype=cd,
            ew=ctx["g2m"]["ew"], psum_axis=self._g2m_psum_axis,
            psum_mode=self._g2m_psum_mode, consts=ctx["g2m"].get("consts"),
        )  # (B, N_mesh, h) — owned rows only under "scatter"

        mesh_rep = self.process_step(params, mesh_rep, B, ctx=ctx)

        m2g = self.graph.m2g
        w0m = params["m2g_gnn"]["edge_mlp"]["layers"][0]["w"]
        send_tf = self._m2g_sender_tf(mesh_rep, w0m[h:2 * h], cd)
        if cd is not None:
            ge_f = ge_f.astype(cd)
        win = self.m2g_win
        st = self._m2g_win_static
        # the layout must match the runtime edge set exactly — a graph
        # swapped via with_arrays with coincidentally matching shapes
        # would otherwise gather wrong rows (jnp.take clips, no error)
        win_ok = (
            win is not None
            and st["num_virt"] == m2g.num_virt
            and st["dense_k"] == m2g.dense_k
            and st["num_send"] == m2g.num_send
            and win["sl_local"].shape[0] == m2g.num_virt * m2g.dense_k
            and m2g.num_virt % st["tile_v"] == 0
        )
        if win_ok:
            # sender gather fused into the decode kernel (windowed
            # one-hot matmul) — skips the (M, B*h) HBM intermediate
            from ..ops.message_passing import decode_grid_fused

            net_f = decode_grid_fused(
                send_tf, ge_f, ctx["m2g"]["ew"], m2g,
                pack_grid_update_params(params),
                ctx["m2g"].get("dec_consts"), win, self._m2g_win_static,
            )  # (num_virt, B*d_out)
        else:
            gathered = gather_send_flat(send_tf, m2g)
            net_f = grid_update_flat(
                gathered, ctx["m2g"]["ew"], ge_f,
                m2g.mask.reshape(m2g.num_virt, m2g.dense_k),
                pack_grid_update_params(params), m2g.dense_k,
                _pallas_mode() == "interpret",
                consts=ctx["m2g"].get("dec_consts"),
            )  # (num_virt, B*d_out)
        net_f = jax.lax.slice_in_dim(net_f, 0, m2g.num_rec, axis=0)
        net_output = unflatten_nodes(net_f, B)  # (B, N_grid, d_out)
        return self._finish_output(net_output, prev_state)

    def predict_step(self, params, prev_state, prev_prev_state, forcing,
                     ctx=None):
        batch_size = prev_state.shape[0]
        cd = self.compute_dtype
        if ctx is None:
            ctx = self.precompute_rollout_ctx(params)

        if self._flat_grid_eligible(params, ctx, batch_size):
            return self._predict_step_flat_grid(
                params, prev_state, prev_prev_state, forcing, ctx,
                batch_size,
            )

        grid_emb = apply_mlp_concat(
            params["grid_embedder"],
            [prev_state, prev_prev_state, forcing,
             expand_to_batch(self.statics.grid_static_features, batch_size)],
            compute_dtype=cd,
        )  # (B, N_grid, d_h)

        mesh_rep = self._inet_static(
            params["g2m_gnn"], self.graph.g2m, grid_emb,
            expand_to_batch(ctx["mesh_emb"], batch_size), ctx["g2m"],
            batch_size, psum_axis=self._g2m_psum_axis,
            psum_mode=self._g2m_psum_mode,
        )  # (B, N_mesh, d_h) — owned rows only under "scatter"
        grid_rep = grid_emb + apply_mlp(
            params["encoding_grid_mlp"], grid_emb, compute_dtype=cd
        )

        mesh_rep = self.process_step(params, mesh_rep, batch_size, ctx=ctx)

        grid_rep = self._inet_static(
            params["m2g_gnn"], self.graph.m2g,
            self._m2g_sender_rep(mesh_rep), grid_rep,
            ctx["m2g"], batch_size,
        )  # (B, N_grid, d_h)

        net_output = apply_mlp(params["output_map"], grid_rep,
                               compute_dtype=cd)  # (B, N_grid, d_out)

        return self._finish_output(net_output, prev_state)
