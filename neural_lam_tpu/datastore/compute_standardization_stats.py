"""Pre-compute standardization statistics for the MEPS npy datastore.

ref: neural_lam/datastore/npyfilesmeps/compute_standardization_stats.py —
two passes over the train split:

1. raw pass: per-feature mean/std of the state and of the TOA flux
   (saved as parameter_mean.pt / parameter_std.pt / flux_stats.pt);
2. standardized pass: mean/std of one-step differences of the *standardized*
   state, with subsample-stride handling (ref: :302-325) — diffs taken at
   `--step_length` strides starting from every offset.

Stats are saved with torch.save for byte-format parity with the reference
(the datastore reads them back with torch.load). The reference optionally
distributes this over SLURM ranks with NCCL/Gloo (ref: :53-91); here the
samples are mapped over an `--n_workers` thread pool — the per-sample work
is npy mmap reads + numpy reductions, both of which release the GIL — and
reduced in sample order, so the outputs are bit-identical for any worker
count (the reference's rank-merge is order-dependent instead).

CLI: python -m neural_lam_tpu.datastore.compute_standardization_stats
"""

from __future__ import annotations

import os
from argparse import ArgumentParser
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from ..dataset import WeatherDataset
from .npyfilesmeps import NpyFilesDatastoreMEPS


def _map_samples(ds, fn, n_workers: int):
    """Map fn over dataset samples, yielding results in index order."""
    if n_workers <= 1:
        for i in range(len(ds)):
            yield fn(ds[i])
        return
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        yield from pool.map(lambda i: fn(ds[i]), range(len(ds)))


def main(datastore_config_path, step_length=3, n_workers=1):
    import torch

    datastore = NpyFilesDatastoreMEPS(config_path=datastore_config_path)
    static_dir_path = Path(datastore_config_path).parent / "static"
    os.makedirs(static_dir_path, exist_ok=True)

    T = datastore.config.dataset.num_timesteps
    ar_steps = T - 2

    # --- pass 1: raw state / flux moments (ref: :201-268) ---
    ds = WeatherDataset(
        datastore=datastore, split="train", ar_steps=ar_steps,
        standardize=False, num_past_forcing_steps=0,
        num_future_forcing_steps=0,
    )

    def raw_moments(item):
        init_states, target_states, forcing, _ = item
        sample = np.concatenate([init_states, target_states], axis=0)
        flux = forcing[:, :, 0]
        return (sample.mean(axis=(0, 1)), (sample**2).mean(axis=(0, 1)),
                flux.mean(), (flux**2).mean())

    means, squares, flux_means, flux_squares = [], [], [], []
    for m, sq, fm, fsq in _map_samples(ds, raw_moments, n_workers):
        means.append(m)
        squares.append(sq)
        flux_means.append(fm)
        flux_squares.append(fsq)

    mean = np.stack(means).mean(axis=0)
    second = np.stack(squares).mean(axis=0)
    std = np.sqrt(second - mean**2)
    flux_mean = np.mean(flux_means)
    flux_second = np.mean(flux_squares)
    flux_std = np.sqrt(flux_second - flux_mean**2)

    torch.save(torch.tensor(mean, dtype=torch.float32),
               static_dir_path / "parameter_mean.pt")
    torch.save(torch.tensor(std, dtype=torch.float32),
               static_dir_path / "parameter_std.pt")
    torch.save(torch.tensor([flux_mean, flux_std], dtype=torch.float32),
               static_dir_path / "flux_stats.pt")
    print(f"Saved parameter_mean/std.pt and flux_stats.pt to {static_dir_path}")

    # --- pass 2: one-step-difference moments on standardized data
    # (ref: :275-331) ---
    ds_standard = WeatherDataset(
        datastore=datastore, split="train", ar_steps=ar_steps,
        standardize=True, num_past_forcing_steps=0,
        num_future_forcing_steps=0,
    )
    used_subsample_len = (T // step_length) * step_length

    def diff_moments(item):
        init_states, target_states, _, _ = item
        sample = np.concatenate([init_states, target_states], axis=0)
        # strided subsampling from every offset (ref: :316-324)
        out = []
        for ss_i in range(step_length):
            sub = sample[ss_i:used_subsample_len:step_length]
            diffs = sub[1:] - sub[:-1]
            out.append((diffs.mean(axis=(0, 1)), (diffs**2).mean(axis=(0, 1))))
        return out

    diff_means, diff_squares = [], []
    for per_offset in _map_samples(ds_standard, diff_moments, n_workers):
        for dm, dsq in per_offset:
            diff_means.append(dm)
            diff_squares.append(dsq)

    diff_mean = np.stack(diff_means).mean(axis=0)
    diff_second = np.stack(diff_squares).mean(axis=0)
    diff_std = np.sqrt(diff_second - diff_mean**2)
    torch.save(torch.tensor(diff_mean, dtype=torch.float32),
               static_dir_path / "diff_mean.pt")
    torch.save(torch.tensor(diff_std, dtype=torch.float32),
               static_dir_path / "diff_std.pt")
    print(f"Saved diff_mean/std.pt to {static_dir_path}")


def cli(input_args=None):
    parser = ArgumentParser(
        description="Compute standardization statistics for npyfilesmeps"
    )
    parser.add_argument("--datastore_config_path", type=str, required=True)
    parser.add_argument("--step_length", type=int, default=3,
                        help="subsample step length (hours)")
    parser.add_argument("--n_workers", type=int, default=1,
                        help="thread-pool workers for the sample sweep")
    args = parser.parse_args(input_args)
    main(args.datastore_config_path, step_length=args.step_length,
         n_workers=args.n_workers)


if __name__ == "__main__":
    cli()
