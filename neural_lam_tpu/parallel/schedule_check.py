"""Verify collective/compute overlap from the COMPILED TPU schedule.

The spatial schemes are structured so collectives can hide behind
compute: the interior/frontier edge split gives each sender all-gather /
halo ppermute exactly one (small) consumer, leaving the interior edge
kernel data-independent of it (ops/message_passing.py `EdgeSet.frontier`;
structural test `tests/test_grid_sharded.py::test_split_sets_structure`).
Whether XLA's latency-hiding scheduler actually EXPLOITS that freedom is
a property of the compiled schedule — which this module checks without
multi-chip hardware: `jax.experimental.topologies.get_topology_desc`
exposes real TPU topologies (e.g. "v5e:2x4") for AOT compilation, and in
post-scheduling HLO the instruction order inside a computation IS the
execution order, with async collectives split into `-start`/`-done`
pairs. Everything scheduled between a start and its done runs while the
collective is in flight.

`analyze_collective_overlap` parses that schedule: for every
collective-permute/all-gather/reduce-scatter start it finds the matching
done, the substantive ops (fusion / custom-call, i.e. Pallas kernels /
dot / convolution) enclosed between them, and estimates a hide fraction
per pair as min(1, t_enclosed / t_collective) with t_enclosed bounded
below by enclosed output bytes / HBM bandwidth and t_collective =
payload bytes / ICI bandwidth + latency. The byte model is conservative
both ways (enclosed compute may also be MXU-bound and slower = more
hiding; the collective may contend for HBM = less), so the derived
fraction feeds probes/scaling_model.py as a measured-schedule bound, not
gospel — but it replaces a bare assumption with the compiler's actual
decision.
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1, "u64": 8, "u32": 4, "u16": 2,
    "u8": 1, "pred": 1,
}

_START_OPS = ("collective-permute-start", "all-gather-start",
              "reduce-scatter-start", "all-reduce-start")
_SUBSTANTIVE = ("fusion", "custom-call", "dot", "convolution")


def _first_shape_bytes(shape_text: str) -> int:
    """Bytes of the first array component in an HLO shape string like
    `f32[243712,256]{1,0:T(8,128)}` or `(f32[10,2]{..}, u32[]{..})`."""
    m = re.search(r"(\w+)\[([\d,]*)\]", shape_text)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def _parse_computations(hlo: str):
    """Yield (computation_name, [instruction dict, ...]) in schedule
    order. Instruction dict: name, op, shape_text, line."""
    comp = None
    instrs = []
    instr_re = re.compile(
        r"^\s+(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*(\([^=]*?\)|\S+)\s+"
        r"([\w\-]+)\("
    )
    comp_re = re.compile(r"^(?:ENTRY\s+)?%?([\w\.\-]+)\s+\([^)]*\)\s*->")
    for line in hlo.splitlines():
        mc = comp_re.match(line)
        if mc and "{" in line:
            if comp and instrs:
                yield comp, instrs
            comp, instrs = mc.group(1), []
            continue
        mi = instr_re.match(line)
        if mi and comp is not None:
            instrs.append({
                "name": mi.group(1),
                "shape": mi.group(2),
                "op": mi.group(3),
                "line": line,
            })
    if comp and instrs:
        yield comp, instrs


def analyze_collective_overlap(hlo: str, hbm_gbps: float = 621.0,
                               ici_gbps: float = 45.0,
                               latency_us: float = 1.0) -> dict:
    """See module docstring. Returns {pairs, enclosed_ops_min/mean,
    pairs_with_kernel, hide_mean, hide_min, details}."""
    details = []
    for comp, instrs in _parse_computations(hlo):
        by_name = {i["name"]: idx for idx, i in enumerate(instrs)}
        for idx, ins in enumerate(instrs):
            if ins["op"] not in _START_OPS:
                continue
            done_idx = None
            for j in range(idx + 1, len(instrs)):
                if instrs[j]["op"] == ins["op"].replace("-start", "-done") \
                        and re.search(r"\(%?" + re.escape(ins["name"])
                                      + r"\)", instrs[j]["line"]):
                    done_idx = j
                    break
            if done_idx is None:
                continue
            enclosed = [instrs[j] for j in range(idx + 1, done_idx)
                        if instrs[j]["op"] in _SUBSTANTIVE]
            enclosed_bytes = sum(_first_shape_bytes(e["shape"])
                                 for e in enclosed)
            payload = _first_shape_bytes(ins["shape"])
            t_enc_us = enclosed_bytes / (hbm_gbps * 1e3)
            t_coll_us = payload / (ici_gbps * 1e3) + latency_us
            details.append({
                "computation": comp,
                "collective": ins["op"],
                "payload_bytes": payload,
                "enclosed_ops": len(enclosed),
                "enclosed_kernels": sum(
                    1 for e in enclosed if e["op"] == "custom-call"),
                "enclosed_bytes": enclosed_bytes,
                "hide": min(1.0, t_enc_us / t_coll_us),
            })
    if not details:
        return {"pairs": 0}
    hides = [d["hide"] for d in details]
    encl = [d["enclosed_ops"] for d in details]
    return {
        "pairs": len(details),
        "enclosed_ops_min": min(encl),
        "enclosed_ops_mean": sum(encl) / len(encl),
        "pairs_with_kernel": sum(1 for d in details
                                 if d["enclosed_kernels"] > 0),
        "hide_mean": sum(hides) / len(hides),
        "hide_min": min(hides),
        "details": details,
    }


def compile_sharded_hlo(scheme: str = "halo", topology: str = "v5e:2x4",
                        model_name: str = "graph_lam",
                        grid_shape=(30, 30), hidden_dim: int = 8,
                        processor_layers: int = 2,
                        train: bool = False) -> str:
    """AOT-compile a spatially-sharded step against a real TPU topology
    (no devices needed) and return the optimized, scheduled HLO text."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from ..config import (
        DatastoreSelection, NeuralLAMConfig, TrainingConfig,
    )
    from ..datastore.dummy import DummyDatastore
    from ..graph.build import create_graph
    from ..graph.storage import graph_from_bundle
    from ..models import MODELS
    from ..models.ar_model import ModelArgs
    from .grid_sharded import spatialize, spatialize_rs

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    devs = np.array(topo.devices)
    n_space = 4 if devs.size % 4 == 0 else devs.size
    mesh = Mesh(devs.reshape(devs.size // n_space, n_space),
                ("data", "space"))

    ds = DummyDatastore(grid_shape=grid_shape, n_timesteps=20)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    graph = graph_from_bundle(create_graph(
        tempfile.mkdtemp(), ds.get_xy("state", stacked=False),
        n_max_levels=None, hierarchical=False))
    model = MODELS[model_name](
        ModelArgs(hidden_dim=hidden_dim,
                  processor_layers=processor_layers),
        config, ds, graph)
    if scheme in ("rs", "halo"):
        sp = spatialize_rs(model, mesh, halo=scheme == "halo")
    else:
        sp = spatialize(model, mesh)
    params = model.init_params(jax.random.PRNGKey(0))

    B = devs.size
    n = ds.num_grid_points
    d = ds.get_num_data_vars("state")
    d_f = ds.get_num_data_vars("forcing") * 3
    prev = jax.ShapeDtypeStruct((B, n, d), jnp.float32)
    pprev = jax.ShapeDtypeStruct((B, n, d), jnp.float32)
    forc = jax.ShapeDtypeStruct((B, n, d_f), jnp.float32)

    if train:
        tgt = jax.ShapeDtypeStruct((B, 1, n, d), jnp.float32)
        forc_t = jax.ShapeDtypeStruct((B, 1, n, d_f), jnp.float32)
        init = jax.ShapeDtypeStruct((B, 2, n, d), jnp.float32)
        times = jax.ShapeDtypeStruct((B, 1), jnp.int32)

        def step(params, arrays, batch):
            m = sp.with_arrays(arrays)
            return jax.grad(m.training_loss)(params, batch)

        lowered = jax.jit(step).lower(
            params, sp.arrays(), (init, tgt, forc_t, times))
    else:
        def step(params, arrays, a, b, c):
            m = sp.with_arrays(arrays)
            out, _ = m.predict_step(params, a, b, c)
            return out

        lowered = jax.jit(step).lower(params, sp.arrays(), prev, pprev,
                                      forc)
    return lowered.compile().as_text()
