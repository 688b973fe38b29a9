"""Pointwise error metrics with masking/reduction semantics of the reference.

ref: neural_lam/metrics.py — wmse/mse/wmae/mae/nll/crps_gauss, each taking
(pred, target, pred_std, mask, average_grid, sum_vars) where the mask selects
grid nodes (interior), average_grid reduces the grid axis by mean, and
sum_vars reduces the feature axis by sum (ref: metrics.py:21-53).

One deliberate TPU-side difference: the reference's boolean-mask indexing
(`vals[..., mask, :]`) produces a data-dependent shape. Under jit we keep
static shapes, so masked reduction is computed as a weighted mean over the
full grid axis — mathematically identical for `average_grid=True` (the only
masked mode the reference ever uses; it passes `mask=None` whenever
`average_grid=False`, ref: neural_lam/models/ar_model.py:294-298,429-431).
When `average_grid=False` with a mask, masked entries are zeroed.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def mask_and_reduce_metric(metric_entry_vals, mask, average_grid: bool,
                           sum_vars: bool):
    """Mask grid nodes and optionally reduce grid (mean) / var (sum) axes.

    metric_entry_vals: (..., N, d_state); mask: (N,) bool or None.
    """
    if mask is not None:
        w = mask.astype(metric_entry_vals.dtype)  # (N,)
        if average_grid:
            # Weighted mean over grid == mean over the masked subset.
            num = jnp.sum(metric_entry_vals * w[:, None], axis=-2)
            metric_entry_vals = num / jnp.sum(w)
        else:
            metric_entry_vals = metric_entry_vals * w[:, None]
    elif average_grid:
        metric_entry_vals = jnp.mean(metric_entry_vals, axis=-2)

    if sum_vars:
        metric_entry_vals = jnp.sum(metric_entry_vals, axis=-1)
    return metric_entry_vals


def wmse(pred, target, pred_std, mask=None, average_grid=True, sum_vars=True):
    """Weighted MSE: squared error / pred_std² (ref: metrics.py:56-84)."""
    entry = jnp.square(pred - target) / jnp.square(pred_std)
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


def mse(pred, target, pred_std=None, mask=None, average_grid=True, sum_vars=True):
    """Unweighted MSE (ref: metrics.py:87-108)."""
    entry = jnp.square(pred - target)
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


def wmae(pred, target, pred_std, mask=None, average_grid=True, sum_vars=True):
    """Weighted MAE: |error| / pred_std (ref: metrics.py:111-139)."""
    entry = jnp.abs(pred - target) / pred_std
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


def mae(pred, target, pred_std=None, mask=None, average_grid=True, sum_vars=True):
    """Unweighted MAE (ref: metrics.py:142-163)."""
    entry = jnp.abs(pred - target)
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


# plain-python constant: a module-level jnp call would initialize the XLA
# backend at import time, breaking jax.distributed.initialize() ordering
_LOG_SQRT_2PI = float(0.5 * math.log(2.0 * math.pi))


def nll(pred, target, pred_std, mask=None, average_grid=True, sum_vars=True):
    """Gaussian negative log likelihood (ref: metrics.py:166-190)."""
    z = (target - pred) / pred_std
    entry = 0.5 * jnp.square(z) + jnp.log(pred_std) + _LOG_SQRT_2PI
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


def _std_normal_pdf(x):
    return jnp.exp(-0.5 * jnp.square(x)) / jnp.sqrt(2.0 * jnp.pi)


def crps_gauss(pred, target, pred_std, mask=None, average_grid=True,
               sum_vars=True):
    """Closed-form Gaussian CRPS, negated as in the reference
    (ref: metrics.py:193-227)."""
    import jax.scipy.stats as jstats

    z = (target - pred) / pred_std
    entry = -pred_std * (
        jnp.pi ** (-0.5)
        - 2.0 * _std_normal_pdf(z)
        - z * (2.0 * jstats.norm.cdf(z) - 1.0)
    )
    return mask_and_reduce_metric(entry, mask, average_grid, sum_vars)


DEFINED_METRICS = {
    "mse": mse,
    "mae": mae,
    "wmse": wmse,
    "wmae": wmae,
    "nll": nll,
    "crps_gauss": crps_gauss,
}


def get_metric(metric_name: str):
    """Look up a metric by (case-insensitive) name (ref: metrics.py:5-18)."""
    name = metric_name.lower()
    assert name in DEFINED_METRICS, f"Unknown metric: {metric_name}"
    return DEFINED_METRICS[name]
