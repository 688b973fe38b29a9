"""Weather dataset: time slicing, forcing windowing, standardization, batching.

Re-implements the sampling semantics of the reference's WeatherDataset
(ref: neural_lam/weather_dataset.py:16-496) on numpy + FieldArray (no torch
DataLoader): a sample at index `idx` is

    init_states   (2, N_grid, d_state)          — X_{t-1}, X_t
    target_states (ar_steps, N_grid, d_state)   — X_{t+1} ...
    forcing       (ar_steps, N_grid, d_forcing * (past + future + 1))
    target_times  (ar_steps,) int64 epoch-ns

with forcing windowed around each target step and flattened feature-major
(feature outer, window inner — xarray stack(("forcing_feature", "window")),
ref: weather_dataset.py:416-421). Handles analysis data (single `time` dim)
and forecast data (`analysis_time` × `elapsed_forecast_duration`, one sample
per analysis time, first ensemble member only).

Batching for TPU: `WeatherDataLoader` collates fixed-shape numpy batches
(drop_last) with optional shuffling and a background prefetch thread — the
host-side input pipeline that replaces torch DataLoader workers.
"""

from __future__ import annotations

import os
import queue
import threading
import warnings

import numpy as np

from .datastore.base import BaseDatastore, FieldArray


class WeatherDataset:
    """Dataset over a datastore split (ref: weather_dataset.py:16-117)."""

    def __init__(self, datastore: BaseDatastore, split="train", ar_steps=3,
                 num_past_forcing_steps=1, num_future_forcing_steps=1,
                 standardize=True):
        self.split = split
        self.ar_steps = ar_steps
        self.datastore = datastore
        self.num_past_forcing_steps = num_past_forcing_steps
        self.num_future_forcing_steps = num_future_forcing_steps

        self.da_state = datastore.get_dataarray(category="state", split=split)
        self.da_forcing = datastore.get_dataarray(category="forcing", split=split)

        # call __len__ directly: builtin len() raises its own unhelpful
        # "__len__() should return >= 0" before this guard can fire
        if self.__len__() <= 0:
            raise ValueError(
                "The provided datastore only provides "
                f"{self._n_time_total()} total time steps, which is too few "
                "to create a single sample for the WeatherDataset "
                f"configuration used in the `{split}` split. You could try "
                "either reducing the number of autoregressive steps "
                "(`ar_steps`) and/or the forcing window size "
                "(`num_past_forcing_steps` and `num_future_forcing_steps`)"
            )

        # dim-order contract check (ref: weather_dataset.py:80-95)
        parts = {"state": self.da_state}
        if self.da_forcing is not None:
            parts["forcing"] = self.da_forcing
        for part, da in parts.items():
            expected = datastore.expected_dim_order(category=part)
            if da.dims != expected:
                raise ValueError(
                    f"The dimension order of the `{part}` data ({da.dims}) "
                    f"does not match the expected dimension order ({expected})."
                )

        self.standardize = standardize
        if standardize:
            stats = datastore.get_standardization_dataarray(category="state")
            self.da_state_mean = np.asarray(stats["state_mean"], np.float32)
            self.da_state_std = np.asarray(stats["state_std"], np.float32)
            # multiply by the inverse instead of dividing: x86 vdivps has
            # ~5x the reciprocal throughput of vmulps and standardization
            # is the loader's hottest arithmetic
            self._state_inv_std = (1.0 / self.da_state_std).astype(
                np.float32)
            if self.da_forcing is not None:
                fstats = datastore.get_standardization_dataarray(category="forcing")
                self.da_forcing_mean = np.asarray(fstats["forcing_mean"], np.float32)
                self.da_forcing_std = np.asarray(fstats["forcing_std"], np.float32)
                self._forcing_inv_std = (1.0 / self.da_forcing_std).astype(
                    np.float32)

        # Per-time-step STANDARDIZED slab cache (analysis datasets).
        # Consecutive samples share all but one time step (a step appears
        # in up to 2 + ar_steps windows) and epochs repeat them, so
        # standardizing once per step and serving plain copies removes
        # the loader's dominant per-sample arithmetic (measured 77% of
        # the warm write_item in profiles). LRU-capped; NLT_STD_CACHE_MB
        # (default 768) bounds it, 0 disables.
        from collections import OrderedDict

        self._std_cache_on = standardize and not datastore.is_forecast
        self._std_lock = threading.Lock()
        self._std_cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        self._std_bytes = 0
        self._std_max_bytes = int(
            os.environ.get("NLT_STD_CACHE_MB", "768")) * (1 << 20)
        if self._std_max_bytes <= 0:
            self._std_cache_on = False

    def _std_step(self, kind: str, t: int) -> np.ndarray:
        """Standardized (N_grid, d) slab for absolute time index `t`
        ("s" = state, "f" = forcing). LRU-cached; a cache-racing thread
        may redundantly recompute (idempotent) but never sees a partial
        entry. Returned arrays are shared — callers must not mutate."""
        key = (kind, t)
        with self._std_lock:
            row = self._std_cache.get(key)
            if row is not None:
                self._std_cache.move_to_end(key)
                return row
        if kind == "s":
            raw = self.da_state.isel(time=slice(t, t + 1)).values[0]
            row = (np.asarray(raw, np.float32) - self.da_state_mean) \
                * self._state_inv_std
        else:
            raw = self.da_forcing.isel(time=slice(t, t + 1)).values[0]
            row = (np.asarray(raw, np.float32) - self.da_forcing_mean) \
                * self._forcing_inv_std
        with self._std_lock:
            if key in self._std_cache:
                return self._std_cache[key]
            self._std_cache[key] = row
            self._std_bytes += row.nbytes
            while (self._std_bytes > self._std_max_bytes
                   and len(self._std_cache) > 1):
                _, old = self._std_cache.popitem(last=False)
                self._std_bytes -= old.nbytes
        return row

    # --- length (ref: weather_dataset.py:117-161) ---

    def _n_time_total(self):
        if self.datastore.is_forecast:
            return self.da_state.sizes()["elapsed_forecast_duration"]
        return self.da_state.sizes()["time"]

    def __len__(self):
        if self.datastore.is_forecast:
            if self.datastore.is_ensemble:
                warnings.warn(
                    "only using first ensemble member, so dataset size is "
                    "effectively reduced by the number of ensemble members "
                    f"({self.da_state.sizes().get('ensemble_member')})",
                    UserWarning,
                )
            n_forecast_steps = self.da_state.sizes()["elapsed_forecast_duration"]
            if n_forecast_steps < 2 + self.ar_steps:
                raise ValueError(
                    f"The number of forecast steps available ({n_forecast_steps})"
                    f" is less than the required 2+ar_steps "
                    f"(2+{self.ar_steps}={2 + self.ar_steps}) for creating a "
                    "sample with initial and target states."
                )
            return self.da_state.sizes()["analysis_time"]
        return (
            self.da_state.sizes()["time"]
            - self.ar_steps
            - max(2, self.num_past_forcing_steps)
            - self.num_future_forcing_steps
        )

    # --- slicing (ref: weather_dataset.py:163-331) ---

    def _state_range(self, idx):
        """[start, end) absolute state time range (analysis datasets)."""
        init_steps = 2
        past = self.num_past_forcing_steps
        start = idx + max(0, past - init_steps)
        end = idx + max(init_steps, past) + self.ar_steps
        return start, end

    def _state_slice(self, idx):
        """(2 + ar_steps, N, d) standardize-ready state window + its times."""
        init_steps = 2
        n_steps = self.ar_steps
        past = self.num_past_forcing_steps
        if self.datastore.is_forecast:
            start = max(0, past - init_steps)
            end = max(init_steps, past) + n_steps
            da = self.da_state.isel(analysis_time=idx)
            if self.datastore.is_ensemble:
                da = da.isel(ensemble_member=0)
            vals = da.values[start:end]
            atime = np.asarray(self.da_state.coords["analysis_time"])[idx]
            efd = np.asarray(
                self.da_state.coords["elapsed_forecast_duration"]
            )[start:end]
            times = atime + efd
        else:
            start = idx + max(0, past - init_steps)
            end = idx + max(init_steps, past) + n_steps
            vals = self.da_state.isel(time=slice(start, end)).values
            times = np.asarray(self.da_state.coords["time"])[start:end]
        return np.asarray(vals, np.float32), times

    def _forcing_buf(self, idx):
        """Raw (ar_steps + W - 1, N, d_f) forcing range covering every
        window position; may be a view into datastore/cache memory —
        callers must not mutate it."""
        init_steps = 2
        past = self.num_past_forcing_steps
        future = self.num_future_forcing_steps
        n_steps = self.ar_steps

        if self.datastore.is_forecast:
            offset = max(init_steps, past)
            da = self.da_forcing.isel(analysis_time=idx)
            # whole needed range along elapsed_forecast_duration
            lo = offset - past
            hi = offset + (n_steps - 1) + future + 1
            return np.asarray(da.values[lo:hi], np.float32)
        offset = idx + max(init_steps, past)
        lo = offset - past
        hi = offset + (n_steps - 1) + future + 1
        return np.asarray(
            self.da_forcing.isel(time=slice(lo, hi)).values, np.float32
        )

    def _forcing_range(self, idx):
        """[lo, hi) absolute forcing time range covering every window."""
        init_steps = 2
        past = self.num_past_forcing_steps
        offset = idx + max(init_steps, past)
        lo = offset - past
        hi = offset + (self.ar_steps - 1) + self.num_future_forcing_steps + 1
        return lo, hi

    def _forcing_rows_std(self, idx):
        """List of standardized per-step (N, d_f) slabs (cached path)."""
        lo, hi = self._forcing_range(idx)
        return [self._std_step("f", t) for t in range(lo, hi)]

    def _forcing_windows(self, idx):
        """(ar_steps, N, d_f * W) windowed + flattened forcing, feature-major."""
        n_steps = self.ar_steps
        W = self.num_past_forcing_steps + self.num_future_forcing_steps + 1
        if self._std_cache_on:
            buf = np.stack(self._forcing_rows_std(idx))
        else:
            buf = self._forcing_buf(idx)
            if self.standardize:
                buf = buf - self.da_forcing_mean
                buf *= self._forcing_inv_std

        # windows over time, flattened feature-major (index = f * W + w).
        # stack-of-contiguous-slices + free reshape is ~3x faster than
        # sliding_window_view + strided reshape-copy at MEPS scale
        n_grid, d_f = buf.shape[1], buf.shape[2]
        win = np.stack([buf[w:w + n_steps] for w in range(W)], axis=-1)
        return win.reshape(n_steps, n_grid, d_f * W)

    def __getitem__(self, idx):
        """Sample tuple (init_states, target_states, forcing, target_times)
        (ref: weather_dataset.py:443-496)."""
        if idx < 0:
            idx += len(self)
        if not 0 <= idx < len(self):
            raise IndexError(idx)
        if self._std_cache_on:
            start, end = self._state_range(idx)
            state = np.stack(
                [self._std_step("s", t) for t in range(start, end)]
            )
            times = np.asarray(self.da_state.coords["time"])[start:end]
        else:
            state, times = self._state_slice(idx)
            if self.standardize:
                # one temporary (state may alias a memmap/cache; don't
                # mutate)
                state = state - self.da_state_mean
                state *= self._state_inv_std
        init_states = state[:2]
        target_states = state[2:]
        target_times = times[2:].astype("datetime64[ns]").astype(np.int64)

        if self.da_forcing is not None:
            forcing = self._forcing_windows(idx)
        else:
            forcing = np.empty(
                (self.ar_steps, state.shape[1], 0), dtype=np.float32
            )
        # views are fine here: collate's np.stack makes the batch copy
        return (init_states, target_states, forcing, target_times)

    def write_item(self, idx, out_init, out_target, out_forcing):
        """Write sample `idx` directly into preallocated batch-row arrays.

        Same math as __getitem__ (identical subtract-then-divide
        standardization order) but single-copy: the standardized state goes
        straight from the datastore slice into `out_init` (2, N, d_state) /
        `out_target` (ar_steps, N, d_state), and forcing windows are
        slice-assigned into `out_forcing` (ar_steps, N, d_f * W) without
        materializing the per-sample stacked array that `collate` would
        re-copy. Returns target_times (ar_steps,) int64 epoch-ns. This is
        the WeatherDataLoader hot path — at MEPS scale the double copy
        (sample stack + batch stack) was ~2x the loader's memory traffic.
        """
        if idx < 0:
            idx += len(self)
        if not 0 <= idx < len(self):
            raise IndexError(idx)
        if self._std_cache_on:
            # cached path: per-time-step standardized slabs are shared
            # across samples/epochs; this is plain contiguous copies
            start, end = self._state_range(idx)
            out_init[0] = self._std_step("s", start)
            out_init[1] = self._std_step("s", start + 1)
            for i, t in enumerate(range(start + 2, end)):
                out_target[i] = self._std_step("s", t)
            times = np.asarray(self.da_state.coords["time"])[start:end]
        else:
            state, times = self._state_slice(idx)
            if self.standardize:
                np.subtract(state[:2], self.da_state_mean, out=out_init)
                out_init *= self._state_inv_std
                np.subtract(state[2:], self.da_state_mean, out=out_target)
                out_target *= self._state_inv_std
            else:
                out_init[...] = state[:2]
                out_target[...] = state[2:]

        if self.da_forcing is not None and out_forcing.shape[-1]:
            n_steps = self.ar_steps
            W = (self.num_past_forcing_steps
                 + self.num_future_forcing_steps + 1)
            # feature-major flattening (index = f * W + w), written in
            # place: out4[..., w] strides W in the last dim — measured the
            # same cost as the np.stack(axis=-1) it replaces, minus the
            # batch-stack copy. The in-place write requires that reshape
            # returns a view; on a non-contiguous row it would silently
            # return a copy and drop every forcing write.
            assert out_forcing.flags["C_CONTIGUOUS"], (
                "write_item requires a C-contiguous out_forcing row"
            )
            if self._std_cache_on:
                rows = self._forcing_rows_std(idx)
                n_grid, d_f = rows[0].shape
                out4 = out_forcing.reshape(n_steps, n_grid, d_f, W)
                for w in range(W):
                    for s in range(n_steps):
                        out4[s, :, :, w] = rows[w + s]
            else:
                buf = self._forcing_buf(idx)
                if self.standardize:
                    # fresh copy: buf may alias datastore/chunk-cache
                    # memory
                    buf = buf - self.da_forcing_mean
                    buf *= self._forcing_inv_std
                n_grid, d_f = buf.shape[1], buf.shape[2]
                out4 = out_forcing.reshape(n_steps, n_grid, d_f, W)
                for w in range(W):
                    out4[..., w] = buf[w:w + n_steps]
        return times[2:].astype("datetime64[ns]").astype(np.int64)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def create_dataarray_from_tensor(self, tensor, time, category: str) -> FieldArray:
        """Inverse of __getitem__: array -> FieldArray with datastore coords
        (ref: weather_dataset.py:509-600)."""
        tensor = np.asarray(tensor)
        da_ref = getattr(self, f"da_{category}")
        feat = f"{category}_feature"
        feat_coord = da_ref.coords.get(feat)
        if tensor.ndim == 2:
            if np.ndim(time) != 0:
                raise ValueError("Expected a single time for a 2D tensor")
            dims = ("grid_index", feat)
            coords = {feat: feat_coord, "time": np.asarray(time)}
        elif tensor.ndim == 3:
            time = np.asarray(time)
            if time.ndim == 0:
                raise ValueError("Expected a list of times for a 3D tensor")
            dims = ("time", "grid_index", feat)
            coords = {"time": time, feat: feat_coord}
        else:
            raise ValueError(
                f"Expected tensor to have 2 or 3 dimensions, got {tensor.ndim}"
            )
        coords = {k: v for k, v in coords.items() if v is not None}
        return FieldArray(tensor, dims, coords)


def collate(samples):
    """Stack samples into fixed-shape numpy batch arrays."""
    return tuple(np.stack(parts, axis=0) for parts in zip(*samples))


_malloc_tuned = False


def _tune_malloc():
    """Raise glibc's mmap threshold so ~100 MB batch buffers are served
    from the (reusable) heap instead of fresh mmaps — otherwise every
    collate pays a page-fault storm on newly-zeroed pages (measured 0.03 s
    vs 0.9 s for the same np.stack). Set NLT_NO_MALLOC_TUNE to disable."""
    global _malloc_tuned
    if _malloc_tuned or os.environ.get("NLT_NO_MALLOC_TUNE"):
        return
    _malloc_tuned = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
    except OSError:  # non-glibc platform
        pass


class WeatherDataLoader:
    """Shuffling, fixed-shape, background-prefetching batch iterator.

    Replaces torch DataLoader (ref: weather_dataset.py:665-696). drop_last
    is always on so every batch has a static shape (jit-friendly); with
    `shard` = (num_shards, shard_id) each shard reads a disjoint strided
    subset of batches (multi-host data parallelism).
    """

    def __init__(self, dataset: WeatherDataset, batch_size=4, shuffle=False,
                 seed=0, prefetch=2, shard=(1, 0), drop_last=True,
                 num_workers=0):
        _tune_malloc()
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.num_shards, self.shard_id = shard
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.epoch = 0

    def __len__(self):
        n_full = len(self.dataset) // self.batch_size
        n = n_full // self.num_shards
        if not self.drop_last and self.shard_id == 0:
            remainder = len(self.dataset) - n_full * self.batch_size
            extra_full = n_full - n * self.num_shards
            n += extra_full + (1 if remainder else 0)
        return n

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            order = rng.permutation(n)
        n_batches = n // self.batch_size
        batches = [
            order[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        # equal batch count per shard: multi-host training runs the jitted
        # step in lockstep (each step is a cross-host collective program), so
        # every shard MUST yield the same number of batches — truncate the
        # stride-sharded list to a multiple of num_shards
        n_even = n_batches // self.num_shards * self.num_shards
        mine = batches[self.shard_id : n_even : self.num_shards]
        if not self.drop_last and self.shard_id == 0:
            # shard 0 additionally picks up leftover full batches + remainder
            # (eval only: evaluation is host-local, so unequal counts are ok)
            mine += batches[n_even:]
            remainder = order[n_batches * self.batch_size:]
            if remainder.size:
                mine.append(remainder)
        return mine

    def _alloc_batch(self, n_rows):
        """Fresh fixed-shape batch arrays for `n_rows` samples; rows are
        filled in place by WeatherDataset.write_item (single-copy path)."""
        ds = self.dataset
        sz = ds.da_state.sizes()
        n_grid = sz["grid_index"]
        d_state = sz["state_feature"]
        ar = ds.ar_steps
        if ds.da_forcing is not None:
            W = (ds.num_past_forcing_steps
                 + ds.num_future_forcing_steps + 1)
            d_fw = ds.da_forcing.sizes()["forcing_feature"] * W
        else:
            d_fw = 0
        return (
            np.empty((n_rows, 2, n_grid, d_state), np.float32),
            np.empty((n_rows, ar, n_grid, d_state), np.float32),
            np.empty((n_rows, ar, n_grid, d_fw), np.float32),
            np.empty((n_rows, ar), np.int64),
        )

    def _fill_batch(self, b):
        batch = self._alloc_batch(len(b))
        init, tgt, forc, tms = batch
        for j, i in enumerate(b):
            tms[j] = self.dataset.write_item(int(i), init[j], tgt[j],
                                             forc[j])
        return batch

    def __iter__(self):
        batches = self._batch_indices()
        if self.num_workers > 1:
            yield from self._iter_pooled(batches)
            return
        if self.prefetch <= 0:
            for b in batches:
                yield self._fill_batch(b)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for b in batches:
                    q.put(self._fill_batch(b))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def _iter_pooled(self, batches):
        """num_workers>1: per-sample fills run concurrently in a thread pool
        (the decode hot path — blosc/zlib via ctypes and the native chunk
        decoder — releases the GIL, as do numpy's large ufunc loops),
        batches are yielded in order. Thread workers replace torch
        DataLoader's worker *processes* (ref: weather_dataset.py:665-696):
        samples are written straight into shared batch arrays read from
        page-cached files, so there is no pickling/IPC, no per-sample
        stack + batch re-stack copy pair, and threads share the
        decoded-chunk cache."""
        from concurrent.futures import ThreadPoolExecutor

        # note: concurrent native decode calls are fine — the chunk cache's
        # in-flight dedup keeps workers off each other's chunks, so calls
        # rarely overlap; NLT_DECODE_THREADS stays a manual override
        window = max(self.prefetch, 1) + 1  # batches in flight
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            pending = []
            it = iter(batches)

            def submit_next():
                b = next(it, None)
                if b is None:
                    return
                batch = self._alloc_batch(len(b))
                init, tgt, forc, tms = batch

                def fill_row(j):
                    tms[j] = self.dataset.write_item(
                        int(b[j]), init[j], tgt[j], forc[j]
                    )

                pending.append(
                    (batch, [ex.submit(fill_row, j) for j in range(len(b))])
                )

            for _ in range(window):
                submit_next()
            while pending:
                batch, futs = pending.pop(0)
                for f in futs:
                    f.result()
                submit_next()
                yield batch


class WeatherDataModule:
    """Bundles train/val/test datasets + loaders
    (ref: weather_dataset.py:603-696)."""

    def __init__(self, datastore: BaseDatastore, ar_steps_train=3,
                 ar_steps_eval=25, standardize=True, num_past_forcing_steps=1,
                 num_future_forcing_steps=1, batch_size=4, shard=(1, 0),
                 num_workers=0):
        self._datastore = datastore
        self.ar_steps_train = ar_steps_train
        self.ar_steps_eval = ar_steps_eval
        self.standardize = standardize
        self.num_past_forcing_steps = num_past_forcing_steps
        self.num_future_forcing_steps = num_future_forcing_steps
        self.batch_size = batch_size
        self.shard = shard
        self.num_workers = num_workers
        self.train_dataset = None
        self.val_dataset = None
        self.test_dataset = None

    def setup(self, stage=None):
        common = dict(
            datastore=self._datastore,
            standardize=self.standardize,
            num_past_forcing_steps=self.num_past_forcing_steps,
            num_future_forcing_steps=self.num_future_forcing_steps,
        )
        if stage in ("fit", None):
            self.train_dataset = WeatherDataset(
                split="train", ar_steps=self.ar_steps_train, **common
            )
            self.val_dataset = WeatherDataset(
                split="val", ar_steps=self.ar_steps_eval, **common
            )
        if stage in ("test", None):
            self.test_dataset = WeatherDataset(
                split="test", ar_steps=self.ar_steps_eval, **common
            )

    def train_dataloader(self, seed=0):
        return WeatherDataLoader(
            self.train_dataset, batch_size=self.batch_size, shuffle=True,
            seed=seed, shard=self.shard, num_workers=self.num_workers,
        )

    def val_dataloader(self):
        return WeatherDataLoader(
            self.val_dataset, batch_size=self.batch_size, shard=self.shard,
            drop_last=False, num_workers=self.num_workers,
        )

    def test_dataloader(self):
        return WeatherDataLoader(
            self.test_dataset, batch_size=self.batch_size, shard=self.shard,
            drop_last=False, num_workers=self.num_workers,
        )
