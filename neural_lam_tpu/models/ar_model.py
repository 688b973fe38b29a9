"""Autoregressive model core: statics, rollout, loss — TPU-functional.

The reference's ARModel is a LightningModule holding buffers and train/eval
hooks (ref: neural_lam/models/ar_model.py:21-267). Here the same state is an
explicit, side-effect-free structure:

* `ModelArgs` — the model/training hyperparameters (the argparse surface of
  ref: neural_lam/train_model.py:29-209 relevant to the model).
* `ARStatics` — non-trainable device arrays (grid static features,
  standardization stats, boundary/interior masks, per-feature loss weights)
  assembled from a datastore (ref: ar_model.py:40-151).
* `ARModelBase` — rollout via `lax.scan` with boundary overwrite
  (ref: ar_model.py:220-267), loss (ref: ar_model.py:287-309), and the eval
  metric computations (ref: ar_model.py:324-454). Subclasses implement
  `predict_step`/`init_params`.

Known reference defect deliberately fixed: with `output_std` the reference
computes `grid_dim` from the doubled output dim (ref: ar_model.py:111-116),
which mismatches the features actually concatenated in predict_step
(ref: base_graph_model.py:116-124); we use 2*num_state_vars as the input
contribution in all cases.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import metrics
from ..loss_weighting import get_state_feature_weighting


@dataclasses.dataclass
class ModelArgs:
    """Model + optimization hyperparameters
    (defaults per ref: neural_lam/train_model.py:53-209)."""

    graph: str = "multiscale"
    hidden_dim: int = 64
    hidden_layers: int = 1
    processor_layers: int = 4
    mesh_aggr: str = "sum"
    output_std: bool = False
    loss: str = "wmse"
    lr: float = 1e-3
    num_past_forcing_steps: int = 1
    num_future_forcing_steps: int = 1
    val_steps_to_log: tuple = (1, 2, 3, 5, 10, 15, 19)
    metrics_watch: tuple = ()
    var_leads_metrics_watch: dict = dataclasses.field(default_factory=dict)
    restore_opt: bool = False
    n_example_pred: int = 1
    # numerics: None = fp32 everywhere; "bfloat16" = bf16 matmuls (fp32 accum)
    compute_dtype: str | None = None
    # latent-variable models (graph_efm): per-mesh-node latent width and
    # ELBO KL weight
    latent_dim: int = 32
    kl_beta: float = 1e-3
    # members per training sample for --loss crps_ens fine-tuning
    crps_members: int = 4
    # gradient-checkpoint each predict step in the AR unroll (BPTT memory
    # O(T + step) instead of O(T * step); ~one extra fwd per step)
    remat: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ARStatics:
    """Non-trainable arrays the model closes over (ref: ar_model.py:40-151)."""

    grid_static_features: jax.Array  # (N_grid, d_static)
    state_mean: jax.Array  # (d_state,)
    state_std: jax.Array
    diff_mean: jax.Array
    diff_std: jax.Array
    feature_weights: jax.Array  # (d_state,)
    boundary_mask: jax.Array  # (N_grid, 1), 1 = boundary
    interior_mask: jax.Array  # (N_grid, 1)
    per_var_std: jax.Array  # (d_state,) = diff_std / sqrt(w)


def build_statics(config, datastore) -> ARStatics:
    """Assemble ARStatics from a datastore (ref: ar_model.py:40-131)."""
    da_static = datastore.get_dataarray(category="static", split=None)
    arr_static = np.asarray(da_static.values, np.float32)  # (N, d_static)

    stats = datastore.get_standardization_dataarray(category="state")
    state_mean = np.asarray(stats["state_mean"], np.float32)
    state_std = np.asarray(stats["state_std"], np.float32)
    diff_mean = np.asarray(stats["state_diff_mean"], np.float32)
    diff_std = np.asarray(stats["state_diff_std"], np.float32)

    weights = np.asarray(
        get_state_feature_weighting(config=config, datastore=datastore),
        np.float32,
    )
    boundary = np.asarray(datastore.boundary_mask.values, np.float32).reshape(-1, 1)
    return ARStatics(
        grid_static_features=jnp.asarray(arr_static),
        state_mean=jnp.asarray(state_mean),
        state_std=jnp.asarray(state_std),
        diff_mean=jnp.asarray(diff_mean),
        diff_std=jnp.asarray(diff_std),
        feature_weights=jnp.asarray(weights),
        boundary_mask=jnp.asarray(boundary),
        interior_mask=jnp.asarray(1.0 - boundary),
        per_var_std=jnp.asarray(diff_std / np.sqrt(weights)),
    )


class ARModelBase:
    """Rollout + loss over an abstract predict_step.

    IMPORTANT (TPU dispatch): model arrays (graph, statics) must enter jitted
    programs as *arguments*, never as baked-in constants — programs carrying
    large constants push this TPU runtime onto a slow dispatch path for the
    whole process. `arrays()` / `with_arrays()` + `jit_model_method` handle
    the threading; `_array_fields` lists the attributes involved.
    """

    _array_fields = ("statics",)

    def arrays(self) -> dict:
        """Pytree of all device arrays the model's methods reference."""
        return {name: getattr(self, name) for name in self._array_fields}

    def with_arrays(self, arrays: dict):
        """Shallow copy with the given array pytree attached."""
        import copy

        m = copy.copy(self)
        for name, value in arrays.items():
            setattr(m, name, value)
        return m

    def __init__(self, args: ModelArgs, config, datastore):
        self.args = args
        self.datastore = datastore
        self.statics = build_statics(config, datastore)

        self.num_state_vars = datastore.get_num_data_vars(category="state")
        self.num_forcing_vars = datastore.get_num_data_vars(category="forcing")
        self.num_grid_nodes, self.grid_static_dim = (
            self.statics.grid_static_features.shape
        )
        self.output_std = bool(args.output_std)
        self.grid_output_dim = (
            2 * self.num_state_vars if self.output_std else self.num_state_vars
        )
        # input contribution is always the two raw states (see module
        # docstring re reference defect at ar_model.py:111-116)
        self.grid_dim = (
            2 * self.num_state_vars
            + self.grid_static_dim
            + self.num_forcing_vars
            * (args.num_past_forcing_steps + args.num_future_forcing_steps + 1)
        )
        self.loss_fn = metrics.get_metric(args.loss)
        self.compute_dtype = (
            jnp.bfloat16 if args.compute_dtype == "bfloat16" else None
        )

    # --- abstract ---

    def init_params(self, key) -> dict:
        raise NotImplementedError

    def predict_step(self, params, prev_state, prev_prev_state, forcing,
                     ctx=None):
        """X_{t-1}, X_t -> X_{t+1} (ref: ar_model.py:211-218).

        ctx: optional rollout-invariant precomputations (static edge/node
        embeddings) from `precompute_rollout_ctx`, computed once per rollout
        instead of once per step.
        """
        raise NotImplementedError

    def precompute_rollout_ctx(self, params, batch_size=None):
        """Rollout-invariant tensors for predict_step (None = none).
        batch_size, when known, lets subclasses hoist batch-shaped
        loop-invariant buffers out of the rollout scan."""
        return None

    # --- rollout (ref: ar_model.py:220-267) ---

    def interior_mask_bool(self):
        return self.statics.interior_mask[:, 0] > 0.5

    def unroll_prediction(self, params, init_states, forcing_features,
                          true_states):
        """Scan the AR rollout with boundary overwrite.

        init_states: (B, 2, N, d); forcing_features: (B, T, N, d_f);
        true_states: (B, T, N, d). Returns prediction (B, T, N, d) and
        pred_std ((B, T, N, d) if output_std else (d,)).
        """
        statics = self.statics
        ctx = self.precompute_rollout_ctx(
            params, batch_size=init_states.shape[0]
        )
        predict = self.predict_step
        if getattr(self.args, "remat", False):
            # gradient checkpointing over the unroll: recompute each
            # predict step in the backward pass instead of storing its
            # activations — BPTT memory drops from O(T * step) to
            # O(T + step), trading ~one extra forward per step. The
            # reference stores everything (ref: ar_model.py:220-267).
            predict = jax.checkpoint(
                lambda p, s, ps, f, c: self.predict_step(p, s, ps, f,
                                                         ctx=c),
                static_argnums=(),
            )

        def step(carry, xs):
            prev_prev_state, prev_state = carry
            forcing, border_state = xs
            pred_state, pred_std = predict(
                params, prev_state, prev_prev_state, forcing, ctx
            )
            new_state = (
                statics.boundary_mask * border_state
                + statics.interior_mask * pred_state
            )
            std_out = pred_std if self.output_std else jnp.zeros((), jnp.float32)
            return (prev_state, new_state), (new_state, std_out)

        carry0 = (init_states[:, 0], init_states[:, 1])
        xs = (
            jnp.moveaxis(forcing_features, 1, 0),  # (T, B, N, d_f)
            jnp.moveaxis(true_states, 1, 0),
        )
        _, (preds, stds) = jax.lax.scan(step, carry0, xs)
        prediction = jnp.moveaxis(preds, 0, 1)  # (B, T, N, d)
        if self.output_std:
            pred_std = jnp.moveaxis(stds, 0, 1)
        else:
            pred_std = statics.per_var_std  # (d,)
        return prediction, pred_std

    def common_step(self, params, batch):
        """(ref: ar_model.py:269-285)"""
        init_states, target_states, forcing_features, batch_times = batch
        prediction, pred_std = self.unroll_prediction(
            params, init_states, forcing_features, target_states
        )
        return prediction, target_states, pred_std, batch_times

    def training_loss(self, params, batch, rng=None):
        """Mean loss over batch and unrolled steps (ref: ar_model.py:287-309).

        rng is accepted (and ignored) so the trainer can pass a per-step key
        uniformly; latent models (graph_efm) consume it."""
        prediction, target, pred_std, _ = self.common_step(params, batch)
        return jnp.mean(
            self.loss_fn(
                prediction, target, pred_std, mask=self.interior_mask_bool()
            )
        )

    # --- evaluation (ref: ar_model.py:324-454) ---

    def eval_step_metrics(self, params, batch):
        """Everything a val/test step computes, as a dict of arrays:

        time_step_loss (T,), mean_loss (), and per-(B, T, d) mse/mae entries
        for error maps, plus spatial loss (B, T, N).
        """
        prediction, target, pred_std, _ = self.common_step(params, batch)
        mask = self.interior_mask_bool()
        sample_step_loss = self.loss_fn(
            prediction, target, pred_std, mask=mask
        )  # (B, T) per-sample so padded eval rows can be dropped exactly
        out = {
            "time_step_loss": sample_step_loss,
            "mean_loss": jnp.mean(sample_step_loss),
            "mse": metrics.mse(prediction, target, None, mask=mask,
                               sum_vars=False),
            "mae": metrics.mae(prediction, target, None, mask=mask,
                               sum_vars=False),
            "spatial_loss": self.loss_fn(
                prediction, target, pred_std, average_grid=False
            ),
        }
        if self.output_std:
            w = mask.astype(pred_std.dtype)
            out["output_std"] = (
                jnp.sum(pred_std * w[:, None], axis=-2) / jnp.sum(w)
            )
        return out


def jit_model_method(model, method_name: str, **jit_kwargs):
    """Jit a model method with the model's arrays passed as arguments.

    Returns a callable with the method's signature (minus self). Keeping
    graph/static arrays out of the compiled program's constants is essential
    on this TPU runtime (see ARModelBase docstring).
    """
    import functools

    arrays = model.arrays()

    @functools.partial(jax.jit, **jit_kwargs)
    def wrapped(arrays, *args):
        return getattr(model.with_arrays(arrays), method_name)(*args)

    def call(*args):
        return wrapped(arrays, *args)

    return call
