"""Create a training-ready MDP zarr dataset from raw zarr sources.

Native equivalent of the external `mllam-data-prep` pipeline the reference
shells out to on first use (ref: neural_lam/datastore/mdp.py:70-72). Reads
the same config schema (ref: tests/datastore_examples/mdp/danra_100m_winds/
danra.datastore.yaml):

    output:
      variables: {state: [time, grid_index, state_feature], ...}
      coord_ranges: {time: {start, end, step}}
      chunking: {time: N}
      splitting:
        dim: time
        splits: {train: {start, end, compute_statistics: {ops, dims}}, ...}
    inputs:
      <name>:
        path: <local zarr path>          # http(s) needs egress -> error
        dims: [time, x, y, ...]
        variables: [name, ...] | {name: {coord: {values: [...], units}}}
        dim_mapping:
          time: {method: rename, dim: time}
          grid_index: {method: stack, dims: [x, y]}
          <cat>_feature: {method: stack_variables_by_var_name,
                          dims: [coord...], name_format: "{var_name}..."}
        target_output_variable: state | forcing | static
    extra: ...   (copied through untouched, e.g. projection)

and writes the layout `MDPDatastore` consumes: per-category stacked arrays,
feature/units/long-name coordinates, x/y per grid_index, the `splits`
table, and `{category}__{split}__{mean,std,diff_mean,diff_std}` statistics
variables (ref: neural_lam/datastore/mdp.py:288-320).

Grid stacking follows the listed `dims` order row-major — `dims: [x, y]`
gives the x-major `grid_index = ix*Ny + iy` used throughout this framework.

All IO goes through the native zarr reader/writer (datastore/
zarr_reader.py) — no xarray/zarr/mllam dependency.
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

import numpy as np
import yaml

from .zarr_reader import (
    ZarrGroup,
    consolidate_metadata,
    decode_cf_time,
    write_zarr_array,
)

CATEGORIES = ("state", "forcing", "static")


def _parse_duration(s: str) -> np.timedelta64:
    """ISO8601 duration subset: P{n}D, PT{n}H, PT{n}M, PT{n}S, P{n}DT{m}H."""
    m = re.fullmatch(
        r"P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?", s.strip()
    )
    if not m or not any(m.groups()):
        raise ValueError(f"unsupported ISO8601 duration: {s!r}")
    d, h, mi, sec = (int(g) if g else 0 for g in m.groups())
    total_s = ((d * 24 + h) * 60 + mi) * 60 + sec
    return np.timedelta64(total_s, "s").astype("timedelta64[ns]")


def _as_dt64(v) -> np.datetime64:
    return np.datetime64(str(v), "ns")


def _coord_of(src: ZarrGroup, name: str) -> np.ndarray:
    arr = src[name]
    vals = arr.read_full()
    units = arr.attrs.get("units", "")
    if "since" in units:
        vals = decode_cf_time(vals, units)
    return vals


class _InputResult:
    """One input dataset reduced to (feature_names, units, long_names,
    per-feature arrays with dims (time?, grid_index))."""

    def __init__(self):
        self.names: list[str] = []
        self.units: list[str] = []
        self.long_names: list[str] = []
        self.columns: list[np.ndarray] = []  # each (T, N_grid) or (N_grid,)
        self.times: np.ndarray | None = None
        self.xy: np.ndarray | None = None  # (N_grid, 2)


def _process_input(name: str, spec: dict, category: str) -> _InputResult:
    path = Path(spec["path"])
    if str(spec["path"]).startswith(("http://", "https://", "s3://")):
        raise ValueError(
            f"input {name!r} has remote path {spec['path']} — this "
            "environment has no egress; download the source zarr and point "
            "`path` at the local copy."
        )
    if not path.exists():
        raise FileNotFoundError(f"input {name!r}: {path} does not exist")
    src = ZarrGroup(path)

    dim_mapping = spec["dim_mapping"]
    feat_dim = f"{category}_feature"
    feat_map = dim_mapping.get(feat_dim, {})
    stack_dims = list(feat_map.get("dims", []))
    name_format = feat_map.get("name_format", "{var_name}")
    grid_map = dim_mapping.get("grid_index")
    if grid_map is None or grid_map.get("method") != "stack":
        raise ValueError(
            f"input {name!r}: dim_mapping.grid_index must use method: stack"
        )
    grid_dims = list(grid_map["dims"])

    time_dim = None
    if "time" in dim_mapping:
        time_dim = dim_mapping["time"].get("dim", "time")

    variables = spec["variables"]
    if isinstance(variables, dict):
        var_items = list(variables.items())
    else:
        var_items = [(v, None) for v in variables]

    res = _InputResult()

    # grid coordinate values (for the output x/y arrays): row-major over
    # the listed grid dims, matching the stacking below
    gcoords = [_coord_of(src, d) for d in grid_dims]
    mesh = np.meshgrid(*gcoords, indexing="ij")
    # output convention is columns (x, y) regardless of listed order
    by_name = dict(zip(grid_dims, mesh))
    res.xy = np.stack(
        [by_name[d].reshape(-1) for d in ("x", "y")], axis=-1
    ).astype(np.float64)

    for var_name, selection in var_items:
        arr = src[var_name]
        dims = list(arr.dims) or list(spec["dims"])
        data = arr.read_full()

        # coordinate selections ({altitude: {values: [100], units: m}})
        sel_values: dict[str, list] = {}
        if selection:
            for coord, sel in selection.items():
                coord_vals = _coord_of(src, coord)
                idxs = []
                for want in sel["values"]:
                    hits = np.nonzero(
                        np.isclose(coord_vals.astype(np.float64), float(want))
                    )[0]
                    if len(hits) == 0:
                        raise ValueError(
                            f"{var_name}: value {want} not found in "
                            f"coordinate {coord!r} of {path}"
                        )
                    idxs.append(int(hits[0]))
                ax = dims.index(coord)
                data = np.take(data, idxs, axis=ax)
                sel_values[coord] = list(sel["values"])

        # move time first (if any), then grid dims, then stacked feat dims
        order = []
        if time_dim is not None and time_dim in dims:
            order.append(dims.index(time_dim))
        order += [dims.index(d) for d in grid_dims]
        order += [dims.index(d) for d in stack_dims]
        if len(order) != len(dims):
            leftover = [d for i, d in enumerate(dims) if i not in order]
            raise ValueError(
                f"{var_name}: dims {leftover} not consumed by dim_mapping"
            )
        data = np.transpose(data, order)

        has_time = time_dim is not None and time_dim in dims
        t_sz = data.shape[0] if has_time else None
        n_grid = int(np.prod([len(c) for c in gcoords]))
        lead = (t_sz, n_grid) if has_time else (n_grid,)
        # (time?, *grid, *stacked) -> (time?, n_grid[, n_stacked])
        data = data.reshape(lead + ((-1,) if stack_dims else ()))

        units = arr.attrs.get("units", "-") or "-"
        long_name = arr.attrs.get("long_name", var_name) or var_name

        if stack_dims:
            combos = [()]
            for d in stack_dims:
                vals = sel_values.get(d)
                if vals is None:
                    vals = list(_coord_of(src, d))
                combos = [c + (v,) for c in combos for v in vals]
            for j, combo in enumerate(combos):
                fmt = {d: v for d, v in zip(stack_dims, combo)}
                res.names.append(
                    name_format.format(var_name=var_name, **fmt)
                )
                res.units.append(units)
                res.long_names.append(long_name)
                res.columns.append(data[..., j])
        else:
            res.names.append(name_format.format(var_name=var_name))
            res.units.append(units)
            res.long_names.append(long_name)
            res.columns.append(data)

        if has_time and res.times is None:
            res.times = _coord_of(src, time_dim)
    return res


# training-ready codec choices for the big category arrays. "none" writes
# raw chunks: ~4x larger on disk but removes the decode-bandwidth ceiling
# of the training loader (blosc-lz4 decodes at ~0.5 GB/s/core; raw chunks
# read at disk/page-cache speed) — see bench_input.py --compression
_COMPRESSORS = {
    "lz4": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    "zstd": {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 1},
    "none": None,
}


def create_dataset(config_path, force: bool = False,
                   compression: str | None = None) -> Path:
    """Run the pipeline; returns the path of the written zarr.

    compression overrides the config's `output.compression` ("lz4"
    default, "zstd", or "none" for training-ready uncompressed chunks).
    """
    config_path = Path(config_path)
    with open(config_path) as f:
        config = yaml.safe_load(f)
    out_path = config_path.parent / config_path.name.replace(".yaml", ".zarr")
    if out_path.exists() and not force:
        raise FileExistsError(
            f"{out_path} already exists (pass --force to overwrite)"
        )

    output = config["output"]
    comp_name = compression or output.get("compression", "lz4")
    if comp_name not in _COMPRESSORS:
        raise ValueError(
            f"unknown compression {comp_name!r} "
            f"(choices: {sorted(_COMPRESSORS)})"
        )
    cat_compressor = _COMPRESSORS[comp_name]
    out_vars = output["variables"]
    chunking = output.get("chunking", {})
    splitting = output.get("splitting", {})
    if splitting and splitting.get("dim", "time") != "time":
        raise ValueError("only time splitting is supported")

    # --- gather inputs per category (config order) ---
    per_cat: dict[str, list[_InputResult]] = {c: [] for c in CATEGORIES}
    for in_name, spec in (config.get("inputs") or {}).items():
        cat = spec["target_output_variable"]
        if cat not in out_vars:
            raise ValueError(
                f"input {in_name!r} targets {cat!r} which is not in "
                f"output.variables"
            )
        per_cat[cat].append(_process_input(in_name, spec, cat))

    # --- common time axis + coord_ranges slice ---
    times = None
    for results in per_cat.values():
        for r in results:
            if r.times is not None:
                if times is None:
                    times = r.times
                elif not np.array_equal(times, r.times):
                    raise ValueError(
                        "inputs disagree on the time coordinate"
                    )
    tr = (output.get("coord_ranges") or {}).get("time")
    lo, hi = 0, None if times is None else len(times)
    if tr is not None and times is not None:
        t0, t1 = _as_dt64(tr["start"]), _as_dt64(tr["end"])
        lo = int(np.searchsorted(times, t0, side="left"))
        hi = int(np.searchsorted(times, t1, side="right"))
        if "step" in tr:
            step = _parse_duration(tr["step"])
            actual = times[lo + 1] - times[lo] if hi - lo > 1 else step
            if actual != step:
                raise ValueError(
                    f"source time step {actual} != requested {tr['step']}"
                )
        times = times[lo:hi]

    # --- grid consistency ---
    xy = None
    for results in per_cat.values():
        for r in results:
            if xy is None:
                xy = r.xy
            elif not np.allclose(xy, r.xy):
                raise ValueError("inputs disagree on the grid coordinates")
    if xy is None:
        raise ValueError("no inputs provided")

    # --- assemble + write ---
    if out_path.exists():
        import shutil

        shutil.rmtree(out_path)
    out_path.mkdir(parents=True)

    if times is not None:
        write_zarr_array(out_path, "time", times.astype("datetime64[ns]"),
                         dims=["time"])
    write_zarr_array(out_path, "x", xy[:, 0], dims=["grid_index"])
    write_zarr_array(out_path, "y", xy[:, 1], dims=["grid_index"])

    cat_arrays: dict[str, np.ndarray] = {}
    for cat, results in per_cat.items():
        if not results:
            continue
        dims = list(out_vars[cat])
        has_time = "time" in dims
        cols, names, units, longs = [], [], [], []
        for r in results:
            for col in r.columns:
                cols.append(col[lo:hi] if has_time and col.ndim == 2 else col)
            names += r.names
            units += r.units
            longs += r.long_names
        data = np.stack(cols, axis=-1).astype(np.float32)
        want = (["time"] if has_time else []) + ["grid_index", f"{cat}_feature"]
        if dims != want:
            raise ValueError(
                f"output.variables.{cat} must be {want}, got {dims}"
            )
        t_chunk = int(chunking.get("time", 1)) if has_time else None
        chunks = ([min(t_chunk, data.shape[0])] if has_time else []) + list(
            data.shape[1 if has_time else 0:]
        )
        write_zarr_array(out_path, cat, data, dims=dims, chunks=chunks,
                         compressor=cat_compressor)
        feat = f"{cat}_feature"
        write_zarr_array(out_path, feat, np.array(names, dtype=object),
                         dims=[feat], compressor=None)
        write_zarr_array(out_path, f"{feat}_units",
                         np.array(units, dtype=object), dims=[feat],
                         compressor=None)
        write_zarr_array(out_path, f"{feat}_long_name",
                         np.array(longs, dtype=object), dims=[feat],
                         compressor=None)
        cat_arrays[cat] = data

    # --- splits + statistics ---
    splits = splitting.get("splits", {})
    if splits:
        if times is None:
            raise ValueError("splitting requires time-dependent inputs")
        split_names = list(splits)
        table = np.array(
            [[str(splits[s]["start"]), str(splits[s]["end"])]
             for s in split_names],
            dtype=object,
        )
        write_zarr_array(out_path, "splits", table,
                         dims=["split_name", "split_part"], compressor=None)
        write_zarr_array(out_path, "split_name",
                         np.array(split_names, dtype=object),
                         dims=["split_name"], compressor=None)
        write_zarr_array(out_path, "split_part",
                         np.array(["start", "end"], dtype=object),
                         dims=["split_part"], compressor=None)

        for split_name, spec in splits.items():
            stats = spec.get("compute_statistics")
            if not stats:
                continue
            ops = list(stats.get("ops", ["mean", "std"]))
            s_lo = int(np.searchsorted(times, _as_dt64(spec["start"]), "left"))
            s_hi = int(np.searchsorted(times, _as_dt64(spec["end"]), "right"))
            for cat, data in cat_arrays.items():
                if data.ndim != 3:
                    continue  # static: no time axis, no stats
                feat = f"{cat}_feature"
                window = data[s_lo:s_hi].astype(np.float64)
                diffs = np.diff(window, axis=0)
                for op in ops:
                    if op == "mean":
                        val = window.mean(axis=(0, 1))
                    elif op == "std":
                        val = window.std(axis=(0, 1))
                    elif op == "diff_mean":
                        val = diffs.mean(axis=(0, 1))
                    elif op == "diff_std":
                        val = diffs.std(axis=(0, 1))
                    else:
                        raise ValueError(f"unknown statistics op {op!r}")
                    write_zarr_array(
                        out_path, f"{cat}__{split_name}__{op}",
                        val.astype(np.float32), dims=[feat],
                    )

    consolidate_metadata(out_path)
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Create a training-ready MDP zarr from raw zarr sources "
        "(native mllam-data-prep equivalent)"
    )
    parser.add_argument("config_path", help="datastore config yaml")
    parser.add_argument("--force", action="store_true",
                        help="overwrite an existing output zarr")
    parser.add_argument("--compression", choices=sorted(_COMPRESSORS),
                        default=None,
                        help="override output.compression: lz4 (default), "
                             "zstd, or none (training-ready raw chunks — "
                             "~4x disk, no decode ceiling in the loader)")
    args = parser.parse_args(argv)
    out = create_dataset(args.config_path, force=args.force,
                        compression=args.compression)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
