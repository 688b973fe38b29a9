"""Functional MLP kit with torch-parity math.

The reference builds every sub-network from one MLP recipe
(ref: neural_lam/utils.py:191-214): a stack of Linear layers with SiLU
(swish) between them and, optionally, a LayerNorm on the output
(GraphCast-style). We reproduce the exact math (SiLU, LayerNorm eps=1e-5,
fp32 accumulation) so that imported torch checkpoints give allclose outputs,
but store parameters as JAX pytrees:

    {"layers": [{"w": (d_in, d_out), "b": (d_out,)}, ...],
     "ln": {"scale": (d,), "bias": (d,)} | None}

Weights are stored (in, out) — i.e. transposed relative to torch Linear —
so the forward pass is a plain ``x @ w`` that XLA maps straight onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch.nn.LayerNorm default


def mlp_blueprint(d_in: int, hidden_dim: int, hidden_layers: int) -> list[int]:
    """Layer-size list [d_in, h, h, ...] with `hidden_layers + 1` Linear layers.

    Mirrors the recipe ``[input_dim] + [hidden_dim] * (hidden_layers + 1)``
    used throughout the reference (ref: neural_lam/models/base_graph_model.py:48).
    """
    return [d_in] + [hidden_dim] * (hidden_layers + 1)


def init_linear(key, d_in: int, d_out: int, dtype=jnp.float32) -> dict:
    """torch.nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in)) for w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (d_in**0.5)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def init_mlp(key, blueprint: list[int], layer_norm: bool = True, dtype=jnp.float32) -> dict:
    """Initialize an MLP pytree from a layer-size blueprint.

    blueprint[0] is the input dim, blueprint[-1] the output dim, and any
    sizes between are hidden layers (ref: neural_lam/utils.py:191-214).
    """
    assert len(blueprint) >= 2, "Invalid MLP blueprint"
    keys = jax.random.split(key, len(blueprint) - 1)
    layers = [
        init_linear(k, d1, d2, dtype)
        for k, d1, d2 in zip(keys, blueprint[:-1], blueprint[1:])
    ]
    ln = None
    if layer_norm:
        d = blueprint[-1]
        ln = {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}
    return {"layers": layers, "ln": ln}


def layer_norm(x, scale, bias, eps: float = LN_EPS):
    """LayerNorm over the last axis, fp32 statistics (torch semantics)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (normed * scale + bias).astype(x.dtype)


def apply_mlp_concat(params: dict, parts: list, *, compute_dtype=None):
    """apply_mlp(params, concat(parts, -1)) without materializing the concat.

    The first Linear over a concatenation decomposes into per-part matmuls
    summed — avoids writing + re-reading the concatenated tensor (the aggr
    MLP input is 2x hidden wide, ref: neural_lam/interaction_net.py:66).
    """
    w0 = params["layers"][0]["w"]
    b0 = params["layers"][0]["b"]

    def mm(x, w):
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    off = 0
    x = b0.astype(jnp.float32)
    for part in parts:
        d = part.shape[-1]
        x = x + mm(part, w0[off:off + d])
        off += d
    assert off == w0.shape[0], (off, w0.shape)
    return finish_mlp(params, x, compute_dtype=compute_dtype)


def finish_mlp(params: dict, x, *, compute_dtype=None):
    """Layers 1..n (+ optional LayerNorm) given the first layer's output x.

    Lets callers that compute the first Linear themselves (decomposed over
    concat parts or mixed array layouts) share the MLP tail."""
    n = len(params["layers"])
    for i in range(1, n):
        x = jax.nn.silu(x)
        w, b = params["layers"][i]["w"], params["layers"][i]["b"]
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b.astype(
            jnp.float32
        )
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if params["ln"] is not None:
        x = layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
    return x


def apply_mlp(params: dict, x, *, compute_dtype=None):
    """Apply the MLP: Linear (+ SiLU between layers), optional output LayerNorm.

    compute_dtype: optionally cast inputs/weights (e.g. bfloat16) for the
    matmuls while keeping fp32 accumulation via preferred_element_type.
    """
    n = len(params["layers"])
    for i, lyr in enumerate(params["layers"]):
        w, b = lyr["w"], lyr["b"]
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
        x = (
            jnp.dot(x, w, preferred_element_type=jnp.float32)
            + b.astype(jnp.float32)
        )
        if i != n - 1:
            x = jax.nn.silu(x)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
    if params["ln"] is not None:
        x = layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
    return x
