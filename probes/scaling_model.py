"""Predicted scaling tables from the spatial-sharding communication model.

Multi-chip hardware is not reachable from this environment (one tunneled
chip), so this turns the analytic model (docs/SCALING.md) into numbers:
per model family, sharding scheme and shard count S,

- STRONG scaling (fixed MEPS problem split over S shards): per-shard
  time = overhead*t1*(repl + local/S) + comm_eff(S), where `repl` is the
  replicated mesh-NODE fraction of the step and comm_eff is the
  collective time NOT hidden behind independent compute (below).
- WEAK scaling (per-shard grid kept at MEPS size, domain grows with S):
  local work constant, replicated node work grows ~S, full-array
  collective payloads grow ~S, cut-edge halo payloads stay constant.

OVERLAP (round 4): since the interior/frontier edge split
(ops/message_passing.py `_apply_inet_split`, tested by
tests/test_grid_sharded.py::test_split_sets_structure) the sender
all-gathers and halo ppermutes have exactly ONE consumer — the small
frontier edge chunk — while the interior edge kernel is data-independent
of them, so XLA's latency-hiding scheduler can fly the collective under
the interior compute. The model therefore separates collectives into

  - HIDEABLE: sender all-gathers / halo ppermute rows. Effective cost
    = max(0, comm - alpha * hide_budget) where hide_budget is the
    measured compute of the consuming stages (per-layer processor +
    m2g decode; scales 1/S strong, constant weak). alpha is now
    SCHEDULE-DERIVED per scheme (SCHEDULE_ALPHA below; round 5): the
    compiled v5e-8 schedule hides 23/24 halo ppermutes but compiles
    the rs sender all-gathers synchronously, so halo gets 0.96 and rs
    0.0 by default; --overlap forces a uniform value instead.
  - FIXED: reductions (full-mesh psums, the g2m reduce-scatter) whose
    complete result gates every downstream op — nothing to hide them
    behind; charged in full.

Single-chip times are MEASURED (benchmarks.jsonl family matrix,
probes/stage_decomp.py); collective costs are first-order (ring
bandwidth + per-collective latency). Clearly a MODEL, not a measurement.

Usage: python probes/scaling_model.py [--ici_gbps 100] [--overlap 0.6]
        [--latency_us 5] [--json]
"""
import argparse
import json

# graph sizes at the bench config (measured from the builder; see
# docs/SCALING.md)
N_MESH_FLAT = 6561
HI_LEVELS = (6561, 729, 81)
B, D, P = 4, 64, 4
BYTES = 4  # fp32

# measured single-chip per-family times, ms (benchmarks.jsonl family
# matrix, fp32): predict step + full train step (fwd+bwd+AdamW).
# train ratio ~3.4x measured for graph_lam (probes/train_step.py: 26.1);
# hi families use the same measured ratio.
# round-5 single-chip fp32 (predict_ms, train_ms) at the MEPS bench
# config, after the windowed gathers + per-group kron matmuls
# (bench.py / probes dated 2026-08-20)
FAMILY_MS = {
    "graph_lam": (6.02, 25.3),
    "hi_lam": (8.91, 36.1),
    "hi_lam_parallel": (6.90, 28.6),
}

# measured stage decomposition, graph_lam fp32 (probes/stage_decomp.py):
# embed 0.39, g2m 1.20, processor 3.04 (0.76/layer), m2g 3.56
# (gather 1.10 + fused decode 2.46). Hide budgets per family = compute of
# the stages that consume a hideable collective:
#   - per-layer sender AG -> that layer's interior edge round
#   - m2g sender AG / halo -> the fused decode stage
# hierarchical processors: L0 rounds are ~70% of the sweep compute
# (6561-node level vs 729+81).
HIDE_BUDGET_MS = {
    "graph_lam": P * 0.76 + 3.56,                 # 6.60
    "hi_lam": 0.7 * 5.5 + 3.56,                   # 7.41
    "hi_lam_parallel": 0.7 * 3.3 + 3.56,          # 5.87
}


def psum_payloads(family):
    """Per predict step: psum'd array sizes (elements) under
    parallel/grid_sharded.py scheme='grid' (one psum per sharded GNN
    application). All FIXED — a psum's complete sum gates its consumer."""
    arr = lambda n: B * n * D
    if family == "graph_lam":
        return [arr(N_MESH_FLAT)] * (1 + P)
    if family == "hi_lam":
        out = [arr(N_MESH_FLAT)]                      # g2m
        out += [arr(n) for n in HI_LEVELS[1:]]        # init up-sweep
        for _ in range(P):                            # per-layer sweeps
            for lev in list(HI_LEVELS) + list(HI_LEVELS[-2::-1]):
                out.append(arr(lev))
            for lev in HI_LEVELS[:-1]:
                out.append(arr(lev))
        out += [arr(n) for n in HI_LEVELS[:-1]]       # read-out
        return out
    if family == "hi_lam_parallel":
        out = [arr(N_MESH_FLAT)]
        out += [arr(n) for n in HI_LEVELS[1:]]
        for _ in range(P):
            out += [arr(n) for n in HI_LEVELS]
        out += [arr(n) for n in HI_LEVELS[:-1]]
        return out
    raise ValueError(family)


def rs_collectives(family):
    """Per predict step under the rs scheme: list of (units, elements,
    hideable) where one-way bytes per device ~= units * (S-1)/S *
    elements * BYTES. psum = 2 units (fixed), reduce-scatter = 1 unit
    (fixed: its sum gates the mesh branch), sender all-gather = 1 unit
    (HIDEABLE: consumed only by the frontier edge chunk)."""
    arr = lambda n: B * n * D
    n0 = N_MESH_FLAT
    if family == "graph_lam_rs":
        # g2m reduce-scatter (fixed) + P per-layer sender all-gathers +
        # m2g sender all-gather (both hideable)
        return ([(1, arr(n0), False)]
                + [(1, arr(n0), True)] * (1 + P))
    n1, n2 = HI_LEVELS[1], HI_LEVELS[2]
    if family == "hi_lam_rs":
        # L0: g2m rs (fixed) + m2g ag + 2 ag/layer (hideable); up[0] is
        # sender-owned (no gather), down[0]/read-out receiver-owned.
        out = [(1, arr(n0), False)]
        out += [(1, arr(n0), True)] * (1 + 2 * P)
        # level-1 psums: init up[0], read-out down[1], and per layer
        # down[1] + same@1(down) + up[0] + same@1(up) — FIXED: the
        # sequential down/up sweeps consume each psum immediately, so
        # there is no independent compute to fly it under
        out += [(2, arr(n1), False)] * (2 + 4 * P)
        # level-2 psums: init up[1], per layer same@2(down) + up[1] +
        # same@2(up)
        out += [(2, arr(n2), False)] * (1 + 3 * P)
        return out
    if family == "hi_lam_parallel_rs":
        # L0: g2m rs (fixed) + m2g ag + one m2m[0] sender all-gather per
        # fused layer (hideable; up[0] sender-owned).
        out = [(1, arr(n0), False)]
        out += [(1, arr(n0), True)] * (1 + P)
        # upper-level psums: HIDEABLE in the fused variant — the chunk
        # loop emits every edge set of a layer as separate ops, so layer
        # t's L1/L2 psums have layer t+1's (small) upper chunks as sole
        # consumers while layer t+1's L0 interior kernel (the bulk) is
        # data-independent of them
        out += [(2, arr(n1), True)] * (2 + P)  # init, read-out, 1/layer
        out += [(2, arr(n2), True)] * (1 + P)
        return out
    raise ValueError(family)


# replicated mesh-NODE fraction of the single-chip step: aggr-MLP rows =
# ~1/(1+mean_degree K~8) of processor FLOPs; processor is ~35% of the
# graph_lam step (probes/stage_decomp.py) and dominates the hierarchical
# steps (~80%). The rs schemes shard the level-0 aggr-MLPs (89% of mesh
# rows), leaving the upper levels' aggr rows + the all-gathered sender
# transform as the replicated residue.
REPL_FRACTION = {"graph_lam": 0.04, "hi_lam": 0.09, "hi_lam_parallel": 0.09,
                 # rs after transform-then-gather (split_send_tf /
                 # _m2g_sender_tf, round 4): the full-table sender
                 # transforms — previously re-run by every shard on the
                 # all-gathered raw rows, ~2/3 of the rs residue by FLOP
                 # count ((1+P) transforms x nm x h x W vs the psum'd
                 # aggr rows) — now run on owned rows only; what remains
                 # replicated is receiver-side padding + (hi) the upper
                 # levels' sender reps and node MLPs
                 "graph_lam_rs": 0.005, "hi_lam_rs": 0.013,
                 "hi_lam_parallel_rs": 0.013,
                 # halo computes mesh embedding / g2m rec_t on the compact
                 # per-shard row set — no full-mesh replicated compute left
                 "graph_lam_halo": 0.003,
                 # per-level-owned halo: no replicated mesh compute; the
                 # residue is upper-level padding waste (tiny blocks pad
                 # to mblock_l, e.g. level-3's 9 rows pad to 2x8 at S=8)
                 "hi_lam_halo": 0.015, "hi_lam_parallel_halo": 0.015}

# halo's residue is per-shard PADDING waste — constant as the domain
# grows — so it enters as a constant body-overhead factor, not as
# replicated work growing with S (the rs/psum treatment)
REPL_IS_CONSTANT = {"graph_lam_halo", "hi_lam_halo", "hi_lam_parallel_halo"}

# scheme "halo": cut-edge ppermute rows measured from the MEPS graphs'
# exchange plans at S=8 (offsets +-1 dominate, longer strides add a
# handful of rows). Per-device one-way rows per exchange — these are
# BOUNDARY sizes: constant under weak scaling (domain grows, the cut
# band per shard doesn't) and ~constant under strong scaling. All
# HIDEABLE since the interior/frontier split (overlap commit).
HALO_ROWS = {"g2m": 477, "m2m_per_layer": 246, "m2g": 199}
HALO_ROUNDS = {"g2m": 2, "m2m_per_layer": 6, "m2g": 2}
# hierarchical graph (levels 6561/729/81/9), measured from
# build_rs_shard(halo=True) at S=8: per-exchange rows and ppermute rounds
HALO_HI = {
    "m2m": (164, 56, 20, 8), "up": (120, 59, 28), "down": (39, 14, 8),
    "g2m": 125, "m2g": 199,
    "rounds": {"m2m": (2, 2, 2, 4), "up": (2, 2, 5), "down": (2, 2, 5),
               "g2m": 2, "m2g": 2},
}


def halo_mix(family):
    """Halo schemes (parallel/spatial.py scheme='halo' and grid_sharded
    spatialize_rs(halo=True)): every LEVEL-0 collective — the per-layer
    m2m sender tables, the m2g sender table AND the g2m partial push —
    rides cut-edge halo rows; the hierarchical variants own every level
    (no psums remain). Returns (halo_rows, rounds)."""
    g2m_rows = HALO_ROWS["g2m"]
    if family == "graph_lam_halo":
        rows = (g2m_rows + P * HALO_ROWS["m2m_per_layer"]
                + HALO_ROWS["m2g"])
        rounds = (HALO_ROUNDS["g2m"] + P * HALO_ROUNDS["m2m_per_layer"]
                  + HALO_ROUNDS["m2g"])
        return rows, rounds
    hh = HALO_HI
    rr = hh["rounds"]
    s_mm, s_up, s_dn = sum(hh["m2m"]), sum(hh["up"]), sum(hh["down"])
    r_mm, r_up, r_dn = sum(rr["m2m"]), sum(rr["up"]), sum(rr["down"])
    if family == "hi_lam_halo":
        # init up-sweep + P x (down sweep: all m2m + all down; up sweep:
        # all m2m + all up) + read-out down-sweep + g2m push + m2g
        rows = (s_up + P * (2 * s_mm + s_up + s_dn) + s_dn
                + hh["g2m"] + hh["m2g"])
        rounds = (r_up + P * (2 * r_mm + r_up + r_dn) + r_dn
                  + rr["g2m"] + rr["m2g"])
        return rows, rounds
    if family == "hi_lam_parallel_halo":
        # init + P x (each chunk once) + read-out + g2m push + m2g
        rows = (s_up + P * (s_mm + s_up + s_dn) + s_dn
                + hh["g2m"] + hh["m2g"])
        rounds = (r_up + P * (r_mm + r_up + r_dn) + r_dn
                  + rr["g2m"] + rr["m2g"])
        return rows, rounds
    raise ValueError(family)


def comm_terms(family):
    """-> (n_fixed, n_hide, fixed_bytes, hideable_bytes, halo_bytes).

    fixed/hideable bytes are one-way per-device FULL-ARRAY totals (scale
    with (S-1)/S strong, (S-1) weak); halo_bytes are constant boundary
    rows (hideable)."""
    if family.endswith("_halo"):
        rows, rounds = halo_mix(family)
        return 0, rounds, 0.0, 0.0, rows * B * D * BYTES
    if family.endswith("_rs"):
        coll = rs_collectives(family)
        fixed = sum(u * e for u, e, h in coll if not h) * BYTES
        hide = sum(u * e for u, e, h in coll if h) * BYTES
        n_fixed = sum(1 for c in coll if not c[2])
        return n_fixed, len(coll) - n_fixed, float(fixed), float(hide), 0.0
    sizes = psum_payloads(family)
    return len(sizes), 0, 2.0 * sum(sizes) * BYTES, 0.0, 0.0


# Schedule-derived hide fractions (round 5): the v5e:2x4 AOT-compiled
# schedule (neural_lam_tpu/parallel/schedule_check.py — real TPU
# topology, no devices needed; in post-scheduling HLO the instruction
# order IS the execution order) shows
#   - halo: 23/24 collective-permute-start/done pairs enclose the
#     interior compute (8-62 fusions each; per-pair enclosed-bytes /
#     payload hide estimate 1.0); only a trailing 80-byte exchange has
#     nothing left to hide behind -> alpha = 23/24 ~= 0.96
#   - rs: the sender ALL-GATHERS compile SYNCHRONOUS on this toolchain
#     (25 plain all-gather ops, zero start/done pairs; the async
#     collective-fusion compiler options do not convert them) -> the
#     scheduler hides nothing: alpha = 0.0
# so the old uniform --overlap 0.6 assumption is replaced by these
# measured-schedule values (pass a number to override; --contention
# remains the one modeled knob).
SCHEDULE_ALPHA = {"rs": 0.0, "halo": 23.0 / 24.0}


def model_rows(ici_gbps, latency_us, overhead=1.0, alpha=None, beta=0.25):
    bw = ici_gbps * 1e9
    lat = latency_us * 1e-6
    rows = []
    for family in ("graph_lam", "hi_lam", "hi_lam_parallel",
                   "graph_lam_rs", "hi_lam_rs", "hi_lam_parallel_rs",
                   "graph_lam_halo", "hi_lam_halo", "hi_lam_parallel_halo"):
        base = family.split("_rs")[0].split("_halo")[0]
        if alpha is None:
            scheme = ("halo" if family.endswith("_halo")
                      else "rs" if family.endswith("_rs") else "grid")
            fam_alpha = SCHEDULE_ALPHA.get(scheme, 0.0)
        else:
            fam_alpha = alpha
        step_ms, train_ms = FAMILY_MS[base]
        hide_budget = HIDE_BUDGET_MS[base] / 1000.0  # s, S=1 scale
        n_fixed, n_hide, fx, hd, halo_b = comm_terms(family)
        repl = REPL_FRACTION[family]
        t1 = step_ms / 1000.0
        tr1 = train_ms / 1000.0
        for S in (2, 4, 8, 16):

            def eff_comm(fixed_b, hideable_b, budget_s, mult=1.0):
                """Unhidden collective seconds. mult=2 for the train step
                (each exchange is retraced by the transposed backward).
                Hideable traffic INCLUDING its launch latency rides under
                alpha x the consuming compute budget; what fits still
                pays a beta contention tax (the collective's HBM DMA
                steals bandwidth from the HBM-bound interior kernels)."""
                fixed = mult * (fixed_b / bw + n_fixed * lat)
                h_s = mult * (hideable_b / bw + n_hide * lat)
                cap = fam_alpha * budget_s
                return fixed + max(0.0, h_s - cap) + beta * min(h_s, cap)

            def body(t_base, S_div, S_grow):
                """Per-shard compute: halo's repl is constant padding
                overhead; rs/psum repl is replicated full-array work
                (constant strong, growing ~S weak)."""
                if family in REPL_IS_CONSTANT:
                    return overhead * t_base * (1 + repl) / S_div
                return overhead * t_base * (repl * S_grow
                                            + (1 - repl) / S_div)

            # STRONG: fixed problem. Full arrays scale (S-1)/S, halo rows
            # constant; per-shard hide budget shrinks 1/S.
            fxs = fx * (S - 1) / S
            hds = hd * (S - 1) / S + halo_b
            t_s = body(t1, S, 1) + eff_comm(fxs, hds, hide_budget / S)
            strong = t1 / (S * t_s)

            # WEAK: domain grows with S. Full arrays scale (S-1), halo
            # rows constant; hide budget constant (per-shard work fixed).
            fxw = fx * (S - 1)
            hdw = hd * (S - 1) + halo_b
            t_w = body(t1, 1, S) + eff_comm(fxw, hdw, hide_budget)
            weak = t1 / t_w

            # train step: doubled traffic; the hide budget scales with
            # the whole train step (the interior chunks' backward kernels
            # are just as independent of the collectives)
            tr_s = (body(tr1, S, 1)
                    + eff_comm(fxs, hds, tr1 / t1 * hide_budget / S,
                               mult=2.0))
            tr_w = (body(tr1, 1, S)
                    + eff_comm(fxw, hdw, tr1 / t1 * hide_budget,
                               mult=2.0))
            rows.append({
                "family": family, "shards": S,
                "collectives": n_fixed + n_hide,
                "bytes_mb": round((fx + hd + halo_b) / 1e6, 1),
                "fwd_strong_eff_pct": round(100 * strong, 1),
                "fwd_weak_eff_pct": round(100 * weak, 1),
                "train_strong_eff_pct": round(100 * tr1 / (S * tr_s), 1),
                "train_weak_eff_pct": round(100 * tr1 / tr_w, 1),
            })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ici_gbps", type=float, default=100.0,
                    help="per-device usable ICI bandwidth (GB/s)")
    ap.add_argument("--latency_us", type=float, default=5.0,
                    help="per-collective launch latency (us)")
    ap.add_argument("--overhead", type=float, default=1.0,
                    help="measured S=1 sharded-body cost ratio vs the "
                         "unsharded step (probes/rs_overhead.py; ~1.0 "
                         "after the ctx hoist + fused-decode fixes)")
    ap.add_argument("--overlap", type=float, default=None,
                    help="fraction of the consuming-stage compute usable "
                         "to hide sender all-gathers / halo ppermutes. "
                         "Default: schedule-derived per scheme from the "
                         "v5e:2x4 AOT compile (halo 0.96, rs 0.0 — see "
                         "SCHEDULE_ALPHA / parallel/schedule_check.py); "
                         "pass a number to force a uniform value "
                         "(0 = round-3 no-overlap model)")
    ap.add_argument("--contention", type=float, default=0.25,
                    help="compute-slowdown tax charged on hidden "
                         "collective seconds (the collective's HBM DMA "
                         "competes with the HBM-bound interior kernels)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    rows = model_rows(args.ici_gbps, args.latency_us,
                      overhead=args.overhead, alpha=args.overlap,
                      beta=args.contention)
    if args.json:
        print(json.dumps(rows))
        return
    print(f"{'family':21s} {'S':>3s} {'coll':>6s} {'MB':>6s} "
          f"{'fwd-strong%':>12s} {'fwd-weak%':>10s} "
          f"{'tr-strong%':>11s} {'tr-weak%':>9s}")
    for r in rows:
        print(f"{r['family']:21s} {r['shards']:3d} "
              f"{r['collectives']:6d} {r['bytes_mb']:6.1f} "
              f"{r['fwd_strong_eff_pct']:12.1f} "
              f"{r['fwd_weak_eff_pct']:10.1f} "
              f"{r['train_strong_eff_pct']:11.1f} "
              f"{r['train_weak_eff_pct']:9.1f}")


if __name__ == "__main__":
    main()
