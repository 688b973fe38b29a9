"""trace_summary: wire-format xplane parser + aggregation.

Two layers of coverage: a hand-encoded minimal XSpace (validates the
field-number map without a profiler), and a REAL trace produced by this
jax install's profiler (validates against whatever xplane version jax
actually writes)."""

import os

import pytest

from neural_lam_tpu.trace_summary import (
    find_xplane_files,
    parse_xplane,
    summarize,
)


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wt: int, payload: bytes) -> bytes:
    head = _varint((num << 3) | wt)
    if wt == 2:
        return head + _varint(len(payload)) + payload
    return head + payload


def _msg(*fields) -> bytes:
    return b"".join(fields)


def _make_space(tmp_path):
    # XEventMetadata {id=1, name="opA"} / {id=2, name="opB"}
    md1 = _msg(_field(1, 0, _varint(1)), _field(2, 2, b"opA"))
    md2 = _msg(_field(1, 0, _varint(2)), _field(2, 2, b"opB"))
    # map entries: key=1 (varint), value=2 (message)
    e1 = _msg(_field(1, 0, _varint(1)), _field(2, 2, md1))
    e2 = _msg(_field(1, 0, _varint(2)), _field(2, 2, md2))
    # events: opA 2 ms x2, opB 1 ms (num_occurrences=3)
    ev_a1 = _msg(_field(1, 0, _varint(1)), _field(3, 0, _varint(2 * 10**9)))
    ev_a2 = _msg(_field(1, 0, _varint(1)), _field(3, 0, _varint(2 * 10**9)))
    ev_b = _msg(_field(1, 0, _varint(2)), _field(3, 0, _varint(10**9)),
                _field(5, 0, _varint(3)))
    line = _msg(_field(2, 2, b"XLA Ops"), _field(4, 2, ev_a1),
                _field(4, 2, ev_a2), _field(4, 2, ev_b))
    plane = _msg(_field(2, 2, b"/device:TPU:0"), _field(3, 2, line),
                 _field(4, 2, e1), _field(4, 2, e2))
    space = _field(1, 2, plane)
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(space)
    return str(p)


def test_parse_hand_encoded(tmp_path):
    path = _make_space(tmp_path)
    entries = parse_xplane(path)
    assert len(entries) == 1
    e = entries[0]
    assert e["plane"] == "/device:TPU:0"
    assert e["line"] == "XLA Ops"
    assert e["ops"]["opA"] == (4 * 10**9, 2)
    assert e["ops"]["opB"] == (10**9, 3)

    s = summarize(path, top=10)
    assert s["top"][0]["op"] == "opA"
    assert s["top"][0]["ms"] == pytest.approx(4.0)
    # line filter that misses everything
    s2 = summarize(path, line_filter="TensorCore", top=10)
    assert s2["top"] == []


def test_real_profiler_trace(tmp_path):
    """The parser must decode whatever xplane this jax version writes:
    a jitted matmul traced on CPU shows up with nonzero time."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x).sum()

    x = jnp.ones((256, 256))
    float(f(x))
    with jax.profiler.trace(str(tmp_path)):
        for _ in range(3):
            float(f(x))

    files = find_xplane_files(str(tmp_path))
    assert files, "profiler wrote no xplane file"
    s = summarize(str(tmp_path), top=50)
    assert s["total_ms"] > 0
    names = " ".join(row["op"] for row in s["top"])
    assert "dot" in names or "fusion" in names or "jit" in names, names
