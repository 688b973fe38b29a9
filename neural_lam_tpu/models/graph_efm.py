"""Graph-EFM-style latent-variable ensemble models.

Goes beyond the reference repo (which has no latent-variable model; its
probabilistic story is the Gaussian output head, ref:
neural_lam/models/base_graph_model.py:161-171). Architecture follows the
graph-based ensemble forecasting recipe of Oskarsson et al. 2024
(arXiv:2406.04759, "probabilistic weather forecasting with hierarchical
graph neural networks"), built from this repo's TPU-native pieces:

* A latent random field z lives on the (bottom-level) mesh nodes, d_z per
  node.
* Prior p(z | X_t, X_{t-1}): one interaction-net round over the
  bottom-level m2m edge set on the encoded mesh representation, then an
  MLP head emitting (mu, sigma_raw); sigma = softplus(sigma_raw) + eps.
* Variational posterior q(z | X_t, X_{t-1}, Y): the TARGET state is
  embedded and encoded to the mesh through a dedicated g2m interaction
  net; the posterior GNN runs on mesh_rep + target_mesh and emits its own
  (mu, sigma).
* The sampled z (reparametrized) is mapped back to hidden width and added
  to the bottom-level mesh representation before the processor
  (GraphLAM's processor stack, or HiLAM's init/sweep/read-out pipeline).
* Stage 1 training maximizes a per-step ELBO over the AR unroll:
      loss = recon + kl_beta * mean KL(q || p)
  (recon = the configured loss; nll with --output_std is the proper
  Gaussian decoder likelihood). Stage 2 (--loss crps_ens) fine-tunes with
  fair-ensemble CRPS over prior-sampled member rollouts.
* Ensembles: draw z ~ p per member per step (ensemble.sample_rollout);
  deterministic eval uses the prior mean (eps = 0), so every inherited
  val/test metric path works unchanged.

Latent plumbing rides the rollout ctx dict: callers place "latent_eps"
(and, for training, "latent_post_mesh") into a per-step copy of ctx, and
`process_step` deposits the step's KL under "_latent_kl". The dict is
just a container for traced values inside one jit trace — no Python
state survives between steps.

Model registry names: `graph_efm` (flat multiscale mesh, incl. the global
icosahedral builder) and `hi_efm` (hierarchical mesh, the paper's
configuration).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.message_passing import init_interaction_net
from ..ops.mlp import apply_mlp, init_mlp
from .base_graph_model import expand_to_batch
from .graph_lam import GraphLAM
from .hi_lam import HiLAM

_SIGMA_FLOOR = 1e-4


class LatentMeshMixin:
    """Latent-field machinery shared by GraphEFM / HiEFM. Mix in BEFORE
    the base model class so process_step wraps the family's processor."""

    is_latent = True

    def __init__(self, args, config, datastore, graph=None):
        # --loss crps_ens selects the paper's second training stage:
        # fair-CRPS over prior-sampled ensemble rollouts (no posterior /
        # KL). Eval paths keep a pointwise loss (wmse) for the inherited
        # metric machinery.
        self.crps_train = getattr(args, "loss", "") == "crps_ens"
        if self.crps_train:
            args = dataclasses.replace(args, loss="wmse")
        super().__init__(args, config, datastore, graph)
        self.latent_dim = int(getattr(args, "latent_dim", 32) or 32)
        # the latent field lives on the BOTTOM mesh level (= all mesh
        # nodes for flat models; hierarchical num_mesh_nodes counts every
        # level)
        self.latent_num_nodes = int(self.graph.level_sizes[0])
        self.kl_beta = float(getattr(args, "kl_beta", 1e-3))
        self.crps_members = int(getattr(args, "crps_members", 4))

    @property
    def _latent_edges(self):
        """Bottom-level m2m edge set (the only m2m set for flat models)."""
        return self.graph.m2m[0]

    # --- parameters ---

    def init_extra_params(self, key) -> dict:
        keys = jax.random.split(key, 9)
        params = super().init_extra_params(keys[0])
        h, hl = self.args.hidden_dim, self.args.hidden_layers
        d_z = self.latent_dim
        m2m_dim = self._latent_edges.features.shape[1]
        params.update({
            "latent_m2m_embedder": init_mlp(
                keys[8], [m2m_dim] + self.mlp_blueprint_end
            ),
            "prior_gnn": init_interaction_net(keys[1], h, hidden_layers=hl),
            "prior_head": init_mlp(
                keys[2], [h] * (hl + 1) + [2 * d_z], layer_norm=False
            ),
            "post_target_embedder": init_mlp(
                keys[3], [self.num_state_vars] + self.mlp_blueprint_end
            ),
            "post_g2m_gnn": init_interaction_net(keys[4], h,
                                                 hidden_layers=hl),
            "post_gnn": init_interaction_net(keys[5], h, hidden_layers=hl),
            "post_head": init_mlp(
                keys[6], [h] * (hl + 1) + [2 * d_z], layer_norm=False
            ),
            "latent_map": init_mlp(keys[7], [d_z] + self.mlp_blueprint_end),
        })
        return params

    def precompute_process_ctx(self, params):
        ctx = super().precompute_process_ctx(params)
        # static edge products for the extra update_edges=False GNNs
        ctx["prior_m2m"] = self._static_edge_ctx(
            params["prior_gnn"], params["latent_m2m_embedder"],
            self._latent_edges,
        )
        ctx["post_m2m"] = self._static_edge_ctx(
            params["post_gnn"], params["latent_m2m_embedder"],
            self._latent_edges,
        )
        ctx["post_g2m"] = self._static_edge_ctx(
            params["post_g2m_gnn"], params["g2m_embedder"], self.graph.g2m
        )
        return ctx

    # --- latent machinery ---

    def _gauss_head(self, gnn_params, head_params, edge_ctx, mesh_rep, B):
        """One bottom-m2m interaction round + MLP head -> (mu, sigma).
        The sender table goes through `_mesh_sender_rep` so the heads run
        unchanged inside mesh-node-sharded bodies (owned rows + halo/
        all-gather imports)."""
        rep = self._inet_static(
            gnn_params, self._latent_edges,
            self._mesh_sender_rep(mesh_rep), mesh_rep, edge_ctx, B,
            psum_axis=self._mesh_psum_axis,
        )
        out = apply_mlp(head_params, rep, compute_dtype=self.compute_dtype)
        mu, sigma_raw = jnp.split(out, 2, axis=-1)
        return mu, jax.nn.softplus(sigma_raw) + _SIGMA_FLOOR

    def encode_target_mesh(self, params, target_state, ctx, B):
        """Posterior conditioning: embed the target state and encode it to
        the mesh through the dedicated g2m interaction net. Runs on local
        grid rows / owned mesh rows inside sharded bodies (the g2m psum
        axis/mode hooks apply as in the main encoder)."""
        tgt_emb = apply_mlp(
            params["post_target_embedder"], target_state,
            compute_dtype=self.compute_dtype,
        )
        return self._inet_static(
            params["post_g2m_gnn"], self.graph.g2m, tgt_emb,
            expand_to_batch(ctx["mesh_emb"], B), ctx["post_g2m"], B,
            psum_axis=self._g2m_psum_axis, psum_mode=self._g2m_psum_mode,
        )

    def process_step(self, params, mesh_rep, batch_size, ctx=None):
        if ctx is None:
            ctx = self.precompute_rollout_ctx(params)
        B = batch_size
        mu_p, sigma_p = self._gauss_head(
            params["prior_gnn"], params["prior_head"], ctx["prior_m2m"],
            mesh_rep, B,
        )
        post_mesh = ctx.get("latent_post_mesh")
        if post_mesh is None and ctx.get("latent_target") is not None:
            # posterior conditioning computed HERE (inside any sharded
            # body) from the per-step target carried in ctx — the target
            # rides the same grid sharding as the other inputs
            post_mesh = self.encode_target_mesh(
                params, ctx["latent_target"], ctx, B
            )
        if post_mesh is not None:
            mu_q, sigma_q = self._gauss_head(
                params["post_gnn"], params["post_head"], ctx["post_m2m"],
                mesh_rep + post_mesh, B,
            )
            # KL(q || p) per (batch, mesh node), summed over d_z
            kl = (
                jnp.log(sigma_p) - jnp.log(sigma_q)
                + (jnp.square(sigma_q) + jnp.square(mu_q - mu_p))
                / (2.0 * jnp.square(sigma_p))
                - 0.5
            ).sum(axis=-1)
            ctx["_latent_kl"] = kl
            mu, sigma = mu_q, sigma_q
        else:
            mu, sigma = mu_p, sigma_p
        eps = ctx.get("latent_eps")
        z = mu if eps is None else mu + sigma * eps
        mesh_rep = mesh_rep + apply_mlp(
            params["latent_map"], z, compute_dtype=self.compute_dtype
        )
        return super().process_step(params, mesh_rep, B, ctx=ctx)

    # --- training ---

    def _crps_training_loss(self, params, batch, rng):
        """Fine-tuning stage: fair-ensemble CRPS over prior-sampled
        rollouts (arXiv:2406.04759's CRPS training; no posterior, no KL).
        sample_rollout is pure jax, so this is differentiable end to end
        through every member's own trajectory."""
        from ..ensemble import crps_ensemble, sample_rollout

        init_states, target_states, forcing_features, _ = batch
        ens = sample_rollout(
            self, params, init_states, forcing_features, target_states,
            rng, n_members=self.crps_members,
        )
        crps = crps_ensemble(
            ens, target_states, mask=self.interior_mask_bool()
        )
        return jnp.mean(crps)

    def training_loss(self, params, batch, rng=None):
        """Per-step ELBO over the AR unroll (stage 1), or fair-CRPS
        (stage 2 with --loss crps_ens)."""
        init_states, target_states, forcing_features, batch_times = batch
        B, T = target_states.shape[:2]
        statics = self.statics
        ctx = self.precompute_rollout_ctx(params)
        if rng is None:
            # deterministic per-batch fallback when the trainer passes no
            # key: fold the batch times in so different batches differ
            seed = jnp.sum(batch_times.astype(jnp.float32)).astype(jnp.int32)
            rng = jax.random.fold_in(jax.random.PRNGKey(17), seed)
        if self.crps_train:
            return self._crps_training_loss(params, batch, rng)
        mask = self.interior_mask_bool()

        # sharded wrappers own more latent rows than the graph has (level-0
        # padding); KL on the padded tail is sliced off below
        latent_rows = getattr(self, "_latent_rows", self.latent_num_nodes)

        def step(carry, xs):
            prev_prev_state, prev_state, key = carry
            forcing_t, target_t = xs
            key, k_eps = jax.random.split(key)
            eps = jax.random.normal(
                k_eps, (B, latent_rows, self.latent_dim), jnp.float32,
            )
            # the per-step TARGET rides in ctx; process_step computes the
            # posterior conditioning from it (inside the sharded body when
            # the model is spatialized)
            ctx_t = {**ctx, "latent_eps": eps, "latent_target": target_t}
            pred, pred_std = self.predict_step(
                params, prev_state, prev_prev_state, forcing_t, ctx=ctx_t
            )
            kl = ctx_t["_latent_kl"][:, :self.latent_num_nodes]
            new_state = (
                statics.boundary_mask * target_t
                + statics.interior_mask * pred
            )
            std_out = (pred_std if self.output_std
                       else jnp.zeros((), jnp.float32))
            return (prev_state, new_state, key), (new_state, std_out, kl)

        carry0 = (init_states[:, 0], init_states[:, 1], rng)
        xs = (
            jnp.moveaxis(forcing_features, 1, 0),
            jnp.moveaxis(target_states, 1, 0),
        )
        _, (preds, stds, kls) = jax.lax.scan(step, carry0, xs)
        prediction = jnp.moveaxis(preds, 0, 1)  # (B, T, N, d)
        pred_std = (jnp.moveaxis(stds, 0, 1) if self.output_std
                    else statics.per_var_std)
        recon = jnp.mean(
            self.loss_fn(prediction, target_states, pred_std, mask=mask)
        )
        return recon + self.kl_beta * jnp.mean(kls)


class GraphEFM(LatentMeshMixin, GraphLAM):
    """Flat-mesh latent-variable model (works with the global icosahedral
    builder for the prob_model_global configuration)."""


class HiEFM(LatentMeshMixin, HiLAM):
    """Hierarchical latent-variable model — the configuration of
    arXiv:2406.04759. The latent field lives on the bottom mesh level
    (num_mesh_nodes is already the bottom-level count for hierarchical
    models) and is injected before the init sweep; the prior/posterior
    GNNs run over the bottom-level m2m edge set."""
