"""Serving export: serialize a checkpointed predict step to StableHLO.

Produces a self-contained artifact (jax.export serialization with the
parameters and graph arrays baked in as constants) that a serving process
can deserialize and call without the model code, plus a sidecar JSON with
the input/output contract:

    python -m neural_lam_tpu.export --config_path cfg.yaml \
        --model graph_lam --graph multiscale --load ckpt/min_val_loss \
        --batch_size 4 --out model.jaxexp

    from neural_lam_tpu.export import load_exported
    step = load_exported("model.jaxexp")
    next_state, pred_std = step(prev_state, prev_prev_state, forcing)

The artifact is lowered for the platform of the exporting process (CPU
here unless run on an accelerator); lowering is platform-checked at call
time by jax.export. Inputs/outputs are STANDARDIZED units, exactly the
in-training predict_step contract (ref: the reference has no export path
at all — serving would have to import torch + Lightning + the repo).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def export_predict_step(model, params, batch_size: int):
    """Return serialized bytes for a batch_size-shaped predict step."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    n = model.num_grid_nodes
    d = model.num_state_vars
    d_f = model.grid_dim - 2 * d - model.grid_static_dim
    arrays = model.arrays()

    def step(prev_state, prev_prev_state, forcing):
        m = model.with_arrays(arrays)
        ctx = m.precompute_rollout_ctx(params)
        pred, std = m.predict_step(params, prev_state, prev_prev_state,
                                   forcing, ctx=ctx)
        if std is None:
            std = jnp.zeros((), jnp.float32)
        return pred, std

    shapes = [
        jax.ShapeDtypeStruct((batch_size, n, d), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, n, d), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, n, d_f), jnp.float32),
    ]
    exp = jexport.export(jax.jit(step))(*shapes)
    meta = {
        "model": type(model).__name__,
        "batch_size": batch_size,
        "n_grid": n,
        "n_state_vars": d,
        "n_forcing_features": d_f,
        "output_std": bool(model.output_std),
        "platforms": list(exp.platforms),
        "units": "standardized (apply state_mean/std outside)",
    }
    return exp.serialize(), meta


def load_exported(path):
    """Deserialize an exported artifact; returns a callable
    (prev, prev_prev, forcing) -> (prediction, pred_std)."""
    from jax import export as jexport

    data = Path(path).read_bytes()
    exp = jexport.deserialize(data)
    return exp.call


def main(argv=None):
    from .predict import add_model_flags

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config_path", required=True)
    add_model_flags(parser)
    parser.add_argument("--load", required=True)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--out", required=True, help="output .jaxexp path")
    args = parser.parse_args(argv)

    from .predict import _build

    t0 = time.time()
    model, params, _, meta_ckpt = _build(args)
    data, meta = export_predict_step(model, params, args.batch_size)
    out = Path(args.out)
    out.write_bytes(data)
    meta["checkpoint_step"] = meta_ckpt.get("step")
    with open(out.with_suffix(out.suffix + ".json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps({
        "out": str(out),
        "bytes": len(data),
        "elapsed_s": round(time.time() - t0, 1),
        **{k: meta[k] for k in ("platforms", "batch_size", "n_grid")},
    }), flush=True)


if __name__ == "__main__":
    main()
