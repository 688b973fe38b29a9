"""Summarize a jax.profiler trace: top device ops by total time.

The profiler (`--profile_steps`, `jax.profiler.trace`) writes XSpace
protobufs (`*.xplane.pb`). TensorBoard/xprof can render them, but
neither is installed in this environment — and a fleet box often has no
browser anyway — so this module decodes the wire format directly (a
protobuf parser needs no schema compiler: just field tags + lengths)
and aggregates event durations per op name per line ("XLA Ops",
"XLA Modules", TensorCore steps ...).

Usage:
  python -m neural_lam_tpu.trace_summary <run_dir or profile dir> \
      [--top 30] [--line "XLA Ops"] [--json]

Field numbers follow tensorflow/tsl/profiler/protobuf/xplane.proto:
  XSpace.planes=1; XPlane: id=1 name=2 lines=3 event_metadata=4;
  XLine: id=1 name=2 timestamp_ns=3 events=4 display_name=11;
  XEvent: metadata_id=1 offset_ps=2 duration_ps=3 num_occurrences=5;
  XEventMetadata: id=1 name=2 display_name=4.
(Validated against traces produced by this jax install — see
tests/test_trace_summary.py.)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _varint(buf: memoryview, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a message buffer.
    Length-delimited values come back as memoryviews."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _varint(buf, i)
        elif wt == 1:  # fixed64
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:  # fixed32
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:  # groups (3/4): not used by xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _parse_event(buf: memoryview) -> tuple[int, int, int]:
    """-> (metadata_id, duration_ps, occurrences)."""
    mid = dur = 0
    occ = 1
    for field, _, val in _fields(buf):
        if field == 1:
            mid = val
        elif field == 3:
            dur = val
        elif field == 5:
            occ = max(int(val), 1)
    return mid, dur, occ


def _parse_line(buf: memoryview) -> tuple[str, list]:
    name = ""
    display = ""
    events = []
    for field, wt, val in _fields(buf):
        if field == 2 and wt == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif field == 11 and wt == 2:
            display = bytes(val).decode("utf-8", "replace")
        elif field == 4 and wt == 2:
            events.append(_parse_event(val))
    return display or name, events


def _parse_event_metadata_entry(buf: memoryview) -> tuple[int, str]:
    """map<int64, XEventMetadata> entry -> (id, name)."""
    key = 0
    name = ""
    for field, wt, val in _fields(buf):
        if field == 1 and wt == 0:
            key = val
        elif field == 2 and wt == 2:
            for f2, w2, v2 in _fields(val):
                if f2 == 2 and w2 == 2:
                    name = bytes(v2).decode("utf-8", "replace")
                elif f2 == 4 and w2 == 2 and not name:
                    name = bytes(v2).decode("utf-8", "replace")
    return key, name


def parse_xplane(path: str) -> list[dict]:
    """-> [{plane, line, ops: {name: (total_ps, count)}}] per XLine."""
    with open(path, "rb") as f:
        space = memoryview(f.read())
    out = []
    for field, wt, plane_buf in _fields(space):
        if field != 1 or wt != 2:
            continue
        plane_name = ""
        lines = []
        metadata = {}
        for f2, w2, val in _fields(plane_buf):
            if f2 == 2 and w2 == 2:
                plane_name = bytes(val).decode("utf-8", "replace")
            elif f2 == 3 and w2 == 2:
                lines.append(_parse_line(val))
            elif f2 == 4 and w2 == 2:
                k, name = _parse_event_metadata_entry(val)
                metadata[k] = name
        for line_name, events in lines:
            ops: dict = {}
            for mid, dur, occ in events:
                name = metadata.get(mid, f"<id {mid}>")
                t, c = ops.get(name, (0, 0))
                ops[name] = (t + dur, c + occ)
            if ops:
                out.append({"plane": plane_name, "line": line_name,
                            "ops": ops})
    return out


def shorten_op(name: str, limit: int = 120) -> str:
    """Compress an HLO-text event name to `%result = kind(shape)`.

    TPU "XLA Ops" lines carry the full HLO instruction text (operands,
    layouts, metadata) as the event name — hundreds of chars. Keep the
    result id, the op kind and the result shape."""
    if "=" not in name or not name.startswith("%"):
        return name if len(name) <= limit else name[:limit] + "…"
    lhs, rhs = name.split("=", 1)
    rhs = rhs.strip()
    # split rhs into depth-0 tokens: [result type, kind(operands...), …]
    # (tuple types are parenthesized, so track (), {}, [] nesting)
    tokens = []
    depth = 0
    cur = []
    for ch in rhs:
        if ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        if ch == " " and depth == 0:
            if cur:
                tokens.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        tokens.append("".join(cur))
    if len(tokens) < 2:
        return name[:limit]
    rtype = tokens[0]
    kind = tokens[1].split("(", 1)[0]
    # drop layout annotations {…} from the type
    while "{" in rtype:
        a = rtype.index("{")
        b = rtype.find("}", a)
        if b == -1:
            break
        rtype = rtype[:a] + rtype[b + 1:]
    if len(rtype) > 48:  # huge tuple types (while carries) add nothing
        rtype = rtype[:48] + "…"
    out = f"{kind} {lhs.strip()} -> {rtype}"
    return out if len(out) <= limit else out[:limit] + "…"


def find_xplane_files(path: str) -> list[str]:
    """Accept a run dir, a profile dir, or a single .xplane.pb file."""
    if os.path.isfile(path):
        return [path]
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    return hits


def summarize(path: str, line_filter: str | None = None,
              top: int = 30) -> dict:
    """Aggregate op durations across all planes/lines (optionally only
    lines whose name contains `line_filter`). Times in ms."""
    files = find_xplane_files(path)
    if not files:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    agg: dict = {}
    lines_seen = []
    for fp in files:
        for entry in parse_xplane(fp):
            lines_seen.append(f"{entry['plane']}/{entry['line']}")
            if line_filter and line_filter.lower() not in (
                    entry["line"].lower() + entry["plane"].lower()):
                continue
            for name, (ps, cnt) in entry["ops"].items():
                t, c = agg.get(name, (0, 0))
                agg[name] = (t + ps, c + cnt)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    total_ms = sum(ps for ps, _ in agg.values()) / 1e9
    return {
        "files": files,
        "lines": sorted(set(lines_seen)),
        "total_ms": round(total_ms, 3),
        "top": [
            {"op": shorten_op(name), "ms": round(ps / 1e9, 3),
             "count": cnt}
            for name, (ps, cnt) in rows
        ],
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("path", help="run dir / profile dir / .xplane.pb file")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--line", type=str, default=None,
                    help="only lines whose plane/line name contains this "
                         "(e.g. 'XLA Ops', 'TensorCore')")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    s = summarize(args.path, line_filter=args.line, top=args.top)
    if args.json:
        print(json.dumps(s))
        return
    print(f"# {len(s['files'])} xplane file(s); lines: "
          f"{', '.join(s['lines'][:12])}", file=sys.stderr)
    print(f"{'total ms':>10s}  {'count':>8s}  op")
    for row in s["top"]:
        print(f"{row['ms']:10.3f}  {row['count']:8d}  {row['op']}")


if __name__ == "__main__":
    main()
