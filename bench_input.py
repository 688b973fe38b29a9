"""Input-pipeline benchmark: can the host-side loader keep up with the chip?

Builds a MEPS-scale MDP-format zarr (268x238 grid, 17 state / 6 forcing /
4 static features, time-chunk 1 like the reference's danra chunking,
blosc-lz4) and measures:

  - raw zarr read bandwidth (native C++ parallel chunk decoder vs the
    pure-Python fallback, toggled via NLT_NO_NATIVE)
  - end-to-end WeatherDataLoader throughput (samples/s) through
    WeatherDataset windowing + standardization + collate + prefetch thread

and compares against the device step budget (batch-4 predict step) so
"the loader keeps up" is a measured statement, not an assumption.

Standalone CPU-only script (no jax). Prints one JSON line per measurement.
Callable as `measure_pipeline(...)` from bench.py's extras.
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# numpy's MADV_HUGEPAGE + THP defrag=madvise causes multi-second kernel
# compaction stalls on fresh batch-sized allocations; the package opts out
import neural_lam_tpu  # noqa: F401,E402  (runtime hugepage opt-out)

NX, NY = 268, 238
N_STATE, N_FORCING, N_STATIC = 17, 6, 4


def build_meps_zarr(root, n_t=24, seed=0, compressor="default"):
    """MEPS-scale synthetic MDP dataset; returns the config path.
    compressor: "default" (blosc-lz4) or None (training-ready raw
    chunks, the create_dataset --compression none mode)."""
    import yaml

    from neural_lam_tpu.datastore.zarr_reader import (
        consolidate_metadata,
        write_zarr_array,
    )

    root.mkdir(parents=True, exist_ok=True)
    zarr_path = root / "meps.datastore.zarr"
    zarr_path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_grid = NX * NY
    times = np.datetime64("2022-01-01T00", "ns") + np.arange(
        n_t
    ) * np.timedelta64(3, "h")

    x = np.arange(NX, dtype=np.float64) * 2500.0
    y = np.arange(NY, dtype=np.float64) * 2500.0
    xx, yy = np.meshgrid(x, y, indexing="ij")
    write_zarr_array(zarr_path, "time", times, dims=["time"])
    write_zarr_array(zarr_path, "x", xx.reshape(-1), dims=["grid_index"])
    write_zarr_array(zarr_path, "y", yy.reshape(-1), dims=["grid_index"])

    # smooth-ish fields so blosc-lz4 gets weather-like compressibility
    state = np.cumsum(
        rng.standard_normal((n_t, n_grid, N_STATE)).astype(np.float32) * 0.1,
        axis=0,
    )
    forcing = np.cumsum(
        rng.standard_normal((n_t, n_grid, N_FORCING)).astype(np.float32) * 0.1,
        axis=0,
    )
    static = rng.standard_normal((n_grid, N_STATIC)).astype(np.float32)
    write_zarr_array(zarr_path, "state", state, compressor=compressor,
                     dims=["time", "grid_index", "state_feature"],
                     chunks=[1, n_grid, N_STATE])
    write_zarr_array(zarr_path, "forcing", forcing, compressor=compressor,
                     dims=["time", "grid_index", "forcing_feature"],
                     chunks=[1, n_grid, N_FORCING])
    write_zarr_array(zarr_path, "static", static, compressor=compressor,
                     dims=["grid_index", "static_feature"])
    for cat, nf in [("state", N_STATE), ("forcing", N_FORCING),
                    ("static", N_STATIC)]:
        names = np.array([f"{cat}_{i}" for i in range(nf)], dtype=object)
        feat = f"{cat}_feature"
        write_zarr_array(zarr_path, feat, names, dims=[feat], compressor=None)
        write_zarr_array(zarr_path, f"{feat}_units",
                         np.array(["-"] * nf, dtype=object), dims=[feat],
                         compressor=None)
        write_zarr_array(zarr_path, f"{feat}_long_name", names, dims=[feat],
                         compressor=None)

    def tstr(i):
        return str(times[i].astype("datetime64[s]"))

    write_zarr_array(zarr_path, "splits",
                     np.array([[tstr(0), tstr(n_t - 1)]] * 3, dtype=object),
                     dims=["split_name", "split_part"], compressor=None)
    write_zarr_array(zarr_path, "split_name",
                     np.array(["train", "val", "test"], dtype=object),
                     dims=["split_name"], compressor=None)
    write_zarr_array(zarr_path, "split_part",
                     np.array(["start", "end"], dtype=object),
                     dims=["split_part"], compressor=None)
    # trivial standardization stats (keeps the standardize math in the
    # measured path without an expensive stats pass here)
    for cat, nf in [("state", N_STATE), ("forcing", N_FORCING)]:
        feat = f"{cat}_feature"
        write_zarr_array(zarr_path, f"{cat}__train__mean",
                         np.zeros(nf, np.float32), dims=[feat])
        write_zarr_array(zarr_path, f"{cat}__train__std",
                         np.ones(nf, np.float32), dims=[feat])
    for op in ("diff_mean", "diff_std"):
        write_zarr_array(zarr_path, f"state__train__{op}",
                         (np.zeros if op == "diff_mean" else np.ones)(
                             N_STATE, np.float32), dims=["state_feature"])
    consolidate_metadata(zarr_path)

    config_path = root / "meps.datastore.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump({"schema_version": "v0.5.0", "inputs": {}}, f)
    return config_path


def _measure_raw_read(config_path):
    """Full-array state read MB/s through ZarrArray (chunk-batch path)."""
    from neural_lam_tpu.datastore import zarr_reader
    from neural_lam_tpu.datastore.zarr_reader import ZarrGroup

    zarr_reader._chunk_cache = zarr_reader._ChunkCache(
        zarr_reader._chunk_cache.max_bytes
    )  # decode, not memcpy, is what we're measuring
    g = ZarrGroup(config_path.parent / "meps.datastore.zarr")
    arr = g["state"]
    nbytes = int(np.prod(arr.shape)) * arr.dtype.itemsize
    arr.read_slice0(0, 2)  # touch file cache
    t0 = time.perf_counter()
    arr.read_full()
    dt = time.perf_counter() - t0
    return nbytes / dt / 1e6


def _measure_loader(config_path, batch_size=4, ar_steps=3, num_workers=0):
    """End-to-end samples/s through WeatherDataLoader (prefetch on).

    Returns (cold, warm) samples/s: cold = first epoch with an empty
    decoded-chunk cache (large real datasets never leave this regime),
    warm = subsequent epoch where the dataset fits the chunk cache."""
    from neural_lam_tpu.dataset import WeatherDataLoader, WeatherDataset
    from neural_lam_tpu.datastore import zarr_reader
    from neural_lam_tpu.datastore.mdp import MDPDatastore

    ds = MDPDatastore(config_path=config_path)
    wds = WeatherDataset(ds, split="train", ar_steps=ar_steps)
    loader = WeatherDataLoader(wds, batch_size=batch_size, shuffle=True,
                               prefetch=2, num_workers=num_workers)
    for _ in loader:  # warm OS page cache / lazy imports (not measured)
        pass

    def epoch_rate(ep):
        loader.set_epoch(ep)
        n_samples = 0
        t0 = time.perf_counter()
        for batch in loader:
            n_samples += batch[0].shape[0]
        return n_samples / (time.perf_counter() - t0)

    # best-of-2 each: this 4-vcpu VM has ±2x wall-time noise
    from collections import OrderedDict

    cold = []
    for ep in range(2):
        zarr_reader._chunk_cache = zarr_reader._ChunkCache(
            zarr_reader._chunk_cache.max_bytes
        )  # empty chunk cache -> "cold" epoch measures decode, not disk
        # the standardized-slab cache must be cleared too or "cold"
        # epochs would serve pre-standardized data (round 5)
        wds._std_cache = OrderedDict()
        wds._std_bytes = 0
        cold.append(epoch_rate(ep))
    warm = [epoch_rate(ep) for ep in (2, 3)]
    return max(cold), max(warm)


def measure_pipeline(n_t=24, batch_size=4, ar_steps=3,
                     device_step_ms=None, keep_dir=None, quick=False,
                     train_step_ms=None):
    """Run all measurements; returns a dict of results. quick=True measures
    only the production config (native decoder + worker pool)."""
    from pathlib import Path

    tmp = keep_dir or tempfile.mkdtemp(prefix="nlt_bench_input_")
    root = Path(tmp)
    try:
        t0 = time.perf_counter()
        config_path = build_meps_zarr(root, n_t=n_t)
        os.sync()  # flush writeback so it doesn't tax the first measurement
        build_s = time.perf_counter() - t0

        results = {"build_s": round(build_s, 2)}
        workers = min(8, os.cpu_count() or 4)
        configs = [("native", None, workers)]
        if not quick:
            configs += [("native_1w", None, 0), ("python_1w", "1", 0)]
        for label, env, nw in configs:
            old = os.environ.pop("NLT_NO_NATIVE", None)
            if env:
                os.environ["NLT_NO_NATIVE"] = env
            # reset the cached native lib so the toggle takes effect
            import neural_lam_tpu.native as native

            native._lib, native._tried = None, False
            try:
                if nw == workers or label == "python_1w":
                    results[f"read_MBps_{label.split('_')[0]}"] = round(
                        _measure_raw_read(config_path), 1
                    )
                cold, warm = _measure_loader(
                    config_path, batch_size, ar_steps, num_workers=nw
                )
                results[f"samples_per_s_{label}"] = round(cold, 1)
                results[f"samples_per_s_{label}_cached"] = round(warm, 1)
            finally:
                if old is not None:
                    os.environ["NLT_NO_NATIVE"] = old
                else:
                    os.environ.pop("NLT_NO_NATIVE", None)
                native._lib, native._tried = None, False
        results["num_workers"] = workers

        if not quick:
            # training-ready uncompressed layout (create_dataset
            # --compression none): removes the blosc decode ceiling
            root_u = root / "uncompressed"
            cfg_u = build_meps_zarr(root_u, n_t=n_t, compressor=None)
            os.sync()
            results["read_MBps_uncompressed"] = round(
                _measure_raw_read(cfg_u), 1
            )
            cold, warm = _measure_loader(cfg_u, batch_size, ar_steps,
                                         num_workers=workers)
            results["samples_per_s_uncompressed"] = round(cold, 1)
            results["samples_per_s_uncompressed_cached"] = round(warm, 1)

        if device_step_ms:
            # one training sample = ar_steps predict steps, fwd+bwd costs
            # ~3x a forward predict step on this model
            train_step_s = ar_steps * (device_step_ms / 1e3) * 3
            need = batch_size / train_step_s
            results["device_predict_step_ms"] = device_step_ms
            results["required_samples_per_s"] = round(need, 1)
            results["pipeline_headroom_x"] = round(
                results["samples_per_s_native"] / need, 2
            )
        if train_step_ms:
            # exact budget from the MEASURED ar=1 train step (an ar_steps
            # sample costs ~ar_steps x the ar=1 step). Cold = first epoch
            # over never-seen data (chunk decode + standardization);
            # cached = steady state (chunk + standardized-slab caches
            # warm). N chips per host multiply the required rate.
            need_m = batch_size / (ar_steps * train_step_ms / 1e3)
            results["train_step_ms_measured"] = round(train_step_ms, 2)
            results["required_samples_per_s_measured"] = round(need_m, 1)
            results["pipeline_headroom_x_measured"] = round(
                results["samples_per_s_native"] / need_m, 2
            )
            results["pipeline_headroom_x_cached"] = round(
                results["samples_per_s_native_cached"] / need_m, 2
            )
            results["max_chips_per_host_cached"] = int(
                results["samples_per_s_native_cached"] / need_m
            )
        return results
    finally:
        if keep_dir is None:
            shutil.rmtree(tmp, ignore_errors=True)


def main():
    device_step_ms = float(os.environ.get("NLT_DEVICE_STEP_MS", 13.0))
    res = measure_pipeline(device_step_ms=device_step_ms)
    print(json.dumps({"metric": "input_pipeline", **res}), flush=True)


if __name__ == "__main__":
    main()
