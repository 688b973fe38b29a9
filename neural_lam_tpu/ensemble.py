"""Probabilistic ensemble forecasting from the Gaussian output head.

The reference trains models with `--output_std` (per-variable predicted
std-dev, ref: neural_lam/models/base_graph_model.py:161-171) and evaluates
with nll/crps_gauss; ensemble *generation* (à la Graph-EFM) is layered here
on top of any output_std model: at every autoregressive step each member
samples its next state from the predicted Gaussian (interior only — the
boundary stays forced), members advanced in parallel by folding the member
axis into the batch axis (one big jitted rollout, TPU-friendly).

Evaluation helpers: ensemble mean/spread, rank-free CRPS estimated with the
standard fair-ensemble estimator

    CRPS ≈ mean_i |x_i - y| - 1/(2 m (m-1)) sum_{i,j} |x_i - x_j|
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_rollout(model, params, init_states, forcing_features, true_states,
                   key, n_members: int = 5):
    """Sample an ensemble of AR rollouts.

    init_states (B, 2, N, d); forcing (B, T, N, d_f); true_states (B, T, N, d)
    (used only for boundary forcing). Returns (B, n_members, T, N, d).
    """
    is_latent = bool(getattr(model, "is_latent", False))
    assert model.output_std or is_latent, (
        "ensemble sampling needs an output_std or latent-variable model"
    )
    statics = model.statics
    B = init_states.shape[0]

    def rep(x):
        # fold member axis into batch: (B, ...) -> (B * m, ...)
        return jnp.repeat(x, n_members, axis=0)

    init_r = rep(init_states)
    forcing_r = rep(forcing_features)
    true_r = rep(true_states)
    ctx = model.precompute_rollout_ctx(params, batch_size=B * n_members)

    def step(carry, xs):
        prev_prev_state, prev_state, key = carry
        forcing, border_state = xs
        key, sub = jax.random.split(key)
        if is_latent:
            # Graph-EFM-style members: one prior latent draw per member
            # per step; the decoder mean is the member state
            eps_z = jax.random.normal(
                sub,
                (prev_state.shape[0],
                 getattr(model, "_latent_rows", model.latent_num_nodes),
                 model.latent_dim),
                jnp.float32,
            )
            ctx_t = {**ctx, "latent_eps": eps_z}
            sampled, _ = model.predict_step(
                params, prev_state, prev_prev_state, forcing, ctx=ctx_t
            )
        else:
            mean, std = model.predict_step(
                params, prev_state, prev_prev_state, forcing, ctx=ctx
            )
            eps = jax.random.normal(sub, mean.shape, mean.dtype)
            sampled = mean + std * eps
        new_state = (
            statics.boundary_mask * border_state
            + statics.interior_mask * sampled
        )
        return (prev_state, new_state, key), new_state

    xs = (jnp.moveaxis(forcing_r, 1, 0), jnp.moveaxis(true_r, 1, 0))
    carry0 = (init_r[:, 0], init_r[:, 1], key)
    _, preds = jax.lax.scan(step, carry0, xs)  # (T, B*m, N, d)
    preds = jnp.moveaxis(preds, 0, 1)  # (B*m, T, N, d)
    T, N, d = preds.shape[1:]
    return preds.reshape(B, n_members, T, N, d)


def ensemble_mean_spread(ens):
    """(B, m, T, N, d) -> mean and spread (std over members)."""
    return ens.mean(axis=1), ens.std(axis=1)


def crps_ensemble(ens, target, mask=None, average_grid=True, sum_vars=True):
    """Fair-ensemble CRPS estimate.

    ens: (B, m, T, N, d); target: (B, T, N, d). Reduction semantics follow
    metrics.mask_and_reduce_metric.
    """
    from .metrics import mask_and_reduce_metric

    m = ens.shape[1]
    skill = jnp.abs(ens - target[:, None]).mean(axis=1)  # (B, T, N, d)
    if m > 1:
        # sum_{i,j}|x_i - x_j| via the sorted identity
        # 2 * sum_k (2k - 1 - m) x_(k)  (k 1-indexed): exact, O(m log m),
        # and avoids the (B, m, m, T, N, d) pairwise tensor, which at
        # full eval scale (m=5, MEPS grid) is ~8 GB
        srt = jnp.sort(ens, axis=1)
        coeff = (2.0 * jnp.arange(1, m + 1) - 1.0 - m).astype(ens.dtype)
        pair_sum = 2.0 * jnp.tensordot(coeff, srt, axes=(0, 1))
        spread = pair_sum / (2.0 * m * (m - 1))
    else:
        spread = jnp.zeros_like(skill)
    entry = skill - spread
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


def rank_histogram(ens, target, mask=None):
    """Rank-histogram counts of the observation among ensemble members.

    ens: (B, m, T, N, d); target: (B, T, N, d); mask: bool (N,) selecting
    the grid points to count (interior). For each counted (point, var,
    lead time) the observation's rank is the number of members strictly
    below it (ties are measure-zero for continuous fields). Returns float
    counts of shape (B, T, m + 1); a calibrated ensemble is uniform
    across the m + 1 bins (Graph-EFM evaluates calibration this way).
    """
    m = ens.shape[1]
    ranks = (ens < target[:, None]).sum(axis=1)  # (B, T, N, d) in [0, m]
    if mask is None:
        w = jnp.ones(ens.shape[-2], jnp.float32)
    else:
        w = mask.astype(jnp.float32)
    # loop over the m+1 bins instead of one-hot: avoids a (B,T,N,d,m+1)
    # intermediate at eval scale (N*d ~ 1e6)
    counts = [
        ((ranks == r) * w[:, None]).sum(axis=(-2, -1)) for r in range(m + 1)
    ]
    return jnp.stack(counts, axis=-1)  # (B, T, m + 1)


def evaluate_ensemble(model, params, batch, key, n_members: int = 5,
                      per_sample: bool = False):
    """Per-lead-time ensemble metrics for one batch.

    Returns dict with crps, spread, rmse of the ensemble mean, mean
    ensemble variance (``ens_var``, ddof=1) and squared error of the
    ensemble mean (``ens_se``) — shape (T,) — plus rank-histogram counts
    ``rank_hist`` of shape (T, m + 1). With ``per_sample=True`` every
    entry gains a leading B axis (used by the Trainer so padded tail
    samples can be sliced off before averaging). The non-per-sample form
    also derives the spread-skill ratio ``ssr`` =
    sqrt((m+1)/m · ens_var / ens_se) — ≈ 1 for a calibrated ensemble.
    """
    init_states, target_states, forcing, _ = batch
    ens = sample_rollout(model, params, init_states, forcing, target_states,
                         key, n_members)
    mask = model.interior_mask_bool()
    mean, spread = ensemble_mean_spread(ens)
    crps = crps_ensemble(ens, target_states, mask=mask)  # (B, T)
    w = mask.astype(mean.dtype)
    se = jnp.square(mean - target_states) * w[:, None]
    rmse = jnp.sqrt(se.sum(axis=-2) / w.sum()).mean(axis=-1)  # (B, T)
    spread_t = (spread * w[:, None]).sum(axis=-2).mean(axis=-1) / w.sum()
    # masked grid+var means of ensemble variance (unbiased) and squared
    # error of the ensemble mean — the two ingredients of the
    # spread-skill ratio, aggregated separately so batches sum correctly
    if n_members > 1:
        var = ens.var(axis=1, ddof=1)  # (B, T, N, d)
    else:
        var = jnp.zeros_like(mean)
    ens_var = (var * w[:, None]).sum(axis=-2).mean(axis=-1) / w.sum()
    ens_se = se.sum(axis=-2).mean(axis=-1) / w.sum()  # (B, T)
    out = {
        "crps": crps, "ens_rmse": rmse, "spread": spread_t,
        "ens_var": ens_var, "ens_se": ens_se,
        "rank_hist": rank_histogram(ens, target_states, mask=mask),
    }
    if not per_sample:
        out = {k: v.mean(axis=0) for k, v in out.items()}
        out["ssr"] = spread_skill_ratio(out["ens_var"], out["ens_se"],
                                        n_members)
    return out


def spread_skill_ratio(ens_var, ens_se, n_members):
    """sqrt((m+1)/m · var / se), the fair spread-skill ratio.

    For a reliable m-member ensemble E[(mean - y)^2] = (m+1)/m · E[var]
    (ddof=1 variance), so this ratio is ~1 when calibrated, <1 when
    under-dispersed and >1 when over-dispersed.
    """
    import numpy as np

    scale = (n_members + 1) / max(n_members, 1)
    return np.sqrt(scale * np.asarray(ens_var)
                   / np.maximum(np.asarray(ens_se), 1e-30))
