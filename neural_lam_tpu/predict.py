"""Inference CLI: roll a trained checkpoint forward and write a forecast.

The reference has no dedicated inference entry point (forecasting is only
reachable through `--eval`, ref: neural_lam/train_model.py:293-296); for
production serving this CLI loads a checkpoint, picks an initialization
from a datastore split, runs the AR rollout (optionally an ensemble of
prior/Gaussian samples), un-standardizes, and writes a self-describing
zarr (or .npz) with time stamps and feature names.

    python -m neural_lam_tpu.predict --config_path cfg.yaml \
        --model graph_lam --graph multiscale --load ckpt/min_val_loss \
        --ar_steps 10 --split test --sample_idx -1 --out forecast.zarr

Boundary handling matches evaluation: the boundary ring is forced with
the datastore's stored future states for the forecast window (a real
deployment feeds these from the host model's forecast instead).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def add_model_flags(parser):
    """Architecture flags shared by the predict and export CLIs. They must
    reconstruct the SAME model the checkpoint was trained with —
    structural mismatches fail loudly at restore, but parameter-free knobs
    (mesh_aggr) would silently change the math if dropped."""
    parser.add_argument("--model", default="graph_lam")
    parser.add_argument("--graph", default="multiscale")
    parser.add_argument("--hidden_dim", type=int, default=64)
    parser.add_argument("--hidden_layers", type=int, default=1)
    parser.add_argument("--processor_layers", type=int, default=4)
    parser.add_argument("--mesh_aggr", default="sum",
                        choices=["sum", "mean"])
    parser.add_argument("--output_std", action="store_true")
    parser.add_argument("--latent_dim", type=int, default=32)
    parser.add_argument("--num_past_forcing_steps", type=int, default=1)
    parser.add_argument("--num_future_forcing_steps", type=int, default=1)
    parser.add_argument("--precision", default="32")


def _build(args):
    import jax

    from .checkpoint import load_checkpoint
    from .config import load_config_and_datastore
    from .models import MODELS
    from .models.ar_model import ModelArgs

    config, datastore = load_config_and_datastore(
        config_path=args.config_path
    )
    model_args = ModelArgs(
        graph=args.graph,
        hidden_dim=args.hidden_dim,
        hidden_layers=args.hidden_layers,
        processor_layers=args.processor_layers,
        mesh_aggr=args.mesh_aggr,
        output_std=args.output_std,
        latent_dim=args.latent_dim,
        num_past_forcing_steps=args.num_past_forcing_steps,
        num_future_forcing_steps=args.num_future_forcing_steps,
        compute_dtype="bfloat16" if args.precision.startswith("bf16")
        else None,
    )
    model = MODELS[args.model](model_args, config, datastore)
    params = model.init_params(jax.random.PRNGKey(0))
    params, _, meta = load_checkpoint(args.load, params)
    return model, params, datastore, meta


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config_path", required=True)
    add_model_flags(parser)
    parser.add_argument("--load", required=True,
                        help="checkpoint directory to restore")
    parser.add_argument("--split", default="test",
                        choices=["train", "val", "test"])
    parser.add_argument("--sample_idx", type=int, default=-1,
                        help="initialization sample within the split "
                             "(-1 = latest available)")
    parser.add_argument("--ar_steps", type=int, default=10)
    parser.add_argument("--ensemble_members", type=int, default=0,
                        help="sample N members (needs an output_std or "
                             "latent model); 0 = deterministic forecast")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", required=True,
                        help="output path: *.zarr directory or *.npz")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .dataset import WeatherDataset, collate
    from .models.ar_model import jit_model_method

    t0 = time.time()
    model, params, datastore, meta = _build(args)
    ds = WeatherDataset(datastore, split=args.split, ar_steps=args.ar_steps)
    sample = ds[args.sample_idx]
    raw = collate([sample])
    batch = tuple(jnp.asarray(b) for b in raw)
    init_states, target_states, forcing, _ = batch
    # keep valid times on host: jnp.asarray would truncate int64-ns
    # timestamps to int32 under the default x64-disabled config
    target_times = raw[3]
    print(f"restored step-{meta.get('step', '?')} checkpoint, "
          f"init built in {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    if args.ensemble_members > 0:
        from .ensemble import sample_rollout

        ens = sample_rollout(
            model, params, init_states, forcing, target_states,
            jax.random.PRNGKey(args.seed), n_members=args.ensemble_members,
        )
        prediction = np.asarray(ens[0])  # (m, T, N, d)
        member_dim = True
    else:
        unroll = jit_model_method(model, "unroll_prediction")
        pred, _ = unroll(params, init_states, forcing, target_states)
        prediction = np.asarray(pred[0])  # (T, N, d)
        member_dim = False
    print(f"rollout ({args.ar_steps} steps"
          + (f", {args.ensemble_members} members" if member_dim else "")
          + f") in {time.time() - t0:.1f}s", flush=True)

    # un-standardize to physical units
    stats = datastore.get_standardization_dataarray(category="state")
    mean = np.asarray(stats["state_mean"], np.float32)
    std = np.asarray(stats["state_std"], np.float32)
    prediction = prediction * std + mean
    times = np.asarray(target_times[0]).astype("datetime64[ns]")
    names = list(datastore.get_vars_names("state"))

    out = Path(args.out)
    dims = (["member"] if member_dim else []) + [
        "time", "grid_index", "state_feature"
    ]
    if out.suffix == ".npz":
        np.savez_compressed(
            out, state=prediction, time=times.astype("int64"),
            state_feature=np.array(names),
        )
    else:
        from .datastore.zarr_reader import (
            consolidate_metadata,
            write_zarr_array,
        )

        out.mkdir(parents=True, exist_ok=True)
        write_zarr_array(
            out, "state", prediction, dims=dims,
            attrs={"units": "per-variable physical units",
                   "source_checkpoint": str(args.load),
                   "model": args.model},
        )
        write_zarr_array(out, "time", times, dims=["time"])
        write_zarr_array(out, "state_feature",
                         np.array(names, dtype=object),
                         dims=["state_feature"], compressor=None)
        consolidate_metadata(out)
    print(json.dumps({
        "out": str(out),
        "shape": list(prediction.shape),
        "dims": dims,
        "first_valid_time": str(times[0]),
        "last_valid_time": str(times[-1]),
    }), flush=True)


if __name__ == "__main__":
    main()
