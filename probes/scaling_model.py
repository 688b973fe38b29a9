"""Predicted scaling tables from the spatial-sharding communication model.

Multi-chip hardware is not reachable from this environment (one tunneled
chip), so this turns the analytic model (docs/SCALING.md) into numbers:
per model family and shard count S,

- STRONG scaling (fixed MEPS problem split over S shards): per-shard
  time = t1*(repl + local/S) + comm(S), where `repl` is the replicated
  mesh-NODE fraction of the step (full mesh recomputed on every shard)
  and comm is ring-all-reduce bytes / ICI bandwidth + per-psum latency.
- WEAK scaling (per-shard grid kept at MEPS size, domain grows with S):
  local work constant, replicated node work grows ~S (the mesh grows
  with the domain), psum payload grows ~S.

Clearly a MODEL, not a measurement — single-chip times are measured
(bench.py / probes/train_step.py), collective costs are first-order.

Usage: python probes/scaling_model.py [--ici_gbps 100] [--step_ms 8.57]
        [--train_ms 29.0] [--json]
"""
import argparse
import json

# graph sizes at the bench config (measured from the builder; see
# docs/SCALING.md)
N_MESH_FLAT = 6561
HI_LEVELS = (6561, 729, 81)
B, D, P = 4, 64, 4
BYTES = 4  # fp32


def psum_payloads(family):
    """Per predict step: psum'd array sizes (elements) under
    parallel/grid_sharded.py (one psum per sharded GNN application)."""
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


# replicated mesh-NODE fraction of the single-chip step: aggr-MLP rows =
# ~1/(1+mean_degree K~8) of processor FLOPs; processor is ~35% of the
# graph_lam step (probes/stage_decomp.py) and dominates the hierarchical
# steps (~80%). The rs schemes shard the level-0 aggr-MLPs (89% of mesh
# rows), leaving the upper levels' aggr rows + the all-gathered sender
# transform as the replicated residue.
REPL_FRACTION = {"graph_lam": 0.04, "hi_lam": 0.09, "hi_lam_parallel": 0.09,
                 "graph_lam_rs": 0.015, "hi_lam_rs": 0.025,
                 "hi_lam_parallel_rs": 0.025,
                 # halo computes mesh embedding / g2m rec_t on the compact
                 # per-shard row set — no full-mesh replicated compute left
                 "graph_lam_halo": 0.003,
                 # per-level-owned halo: no replicated mesh compute; the
                 # residue is upper-level padding waste (tiny blocks pad
                 # to mblock_l, e.g. level-3's 9 rows pad to 2x8 at S=8)
                 "hi_lam_halo": 0.015, "hi_lam_parallel_halo": 0.015}

# scheme "halo": cut-edge ppermute rows measured from the MEPS graphs'
# exchange plans at S=8 (offsets +-1 dominate, longer strides add a
# handful of rows). Per-device one-way rows per exchange — these are
# BOUNDARY sizes: constant under weak scaling (domain grows, the cut
# band per shard doesn't) and ~constant under strong scaling.
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


def rs_collectives(family):
    """Per predict step under the rs scheme: list of (units, elements)
    where one-way bytes per device ~= units * (S-1)/S * elements * BYTES.
    psum = 2 units, reduce-scatter / all-gather = 1 unit."""
    arr = lambda n: B * n * D
    n0 = N_MESH_FLAT
    if family == "graph_lam_rs":
        # 1 reduce-scatter (g2m) + P all-gathers (per-layer senders)
        # + 1 all-gather (m2g senders)
        return [(1, arr(n0))] * (2 + P)
    n1, n2 = HI_LEVELS[1], HI_LEVELS[2]
    if family == "hi_lam_rs":
        # L0: g2m rs + m2g ag + 2 ag/layer (same@0 senders in each sweep);
        # up[0] is sender-owned (no gather), down[0] and the read-out to
        # level 0 are receiver-owned (no collective).
        out = [(1, arr(n0))] * (2 + 2 * P)
        # level-1 psums: init up[0], read-out down[1], and per layer
        # down[1] + same@1(down) + up[0] + same@1(up)
        out += [(2, arr(n1))] * (2 + 4 * P)
        # level-2 psums: init up[1], per layer same@2(down) + up[1] +
        # same@2(up)
        out += [(2, arr(n2))] * (1 + 3 * P)
        return out
    if family == "hi_lam_parallel_rs":
        # L0: g2m rs + m2g ag + one m2m[0] sender all-gather per fused
        # layer (up[0] sender-owned)
        out = [(1, arr(n0))] * (2 + P)
        out += [(2, arr(n1))] * (2 + P)  # init, read-out, 1/layer
        out += [(2, arr(n2))] * (1 + P)
        return out
    raise ValueError(family)


def collective_units(family):
    """(count, one-way bytes moved per device per collective at S shards
    is units * (S-1)/S * full-array bytes; psum = 2 units each,
    reduce-scatter / all-gather = 1 unit each)."""
    if family.endswith("_rs"):
        coll = rs_collectives(family)
        return len(coll), float(
            sum(u * e for u, e in coll)
        ) * BYTES
    sizes = psum_payloads(family)
    return len(sizes), 2.0 * sum(sizes) * BYTES


def halo_mix(family):
    """Halo schemes (parallel/spatial.py scheme="halo" and grid_sharded
    spatialize_rs(halo=True)): every LEVEL-0 collective — the per-layer
    m2m sender tables, the m2g sender table AND the g2m partial push —
    rides cut-edge halo rows; only the hierarchical UPPER levels keep
    their small psums. Returns (full_bytes_units, halo_rows, rounds) —
    full_bytes still scale with (S-1)/S, halo rows are ~constant in S."""
    g2m_rows = HALO_ROWS["g2m"]
    if family == "graph_lam_halo":
        rows = (g2m_rows + P * HALO_ROWS["m2m_per_layer"]
                + HALO_ROWS["m2g"])
        rounds = (HALO_ROUNDS["g2m"] + P * HALO_ROUNDS["m2m_per_layer"]
                  + HALO_ROUNDS["m2g"])
        return 0.0, rows, rounds
    # hierarchical: EVERY level receiver-owned — no psums remain at all;
    # rows/rounds from the measured per-edge-set plans (HALO_HI)
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
        return 0.0, rows, rounds
    if family == "hi_lam_parallel_halo":
        # init + P x (each chunk once) + read-out + g2m push + m2g
        rows = (s_up + P * (s_mm + s_up + s_dn) + s_dn
                + hh["g2m"] + hh["m2g"])
        rounds = (r_up + P * (r_mm + r_up + r_dn) + r_dn
                  + rr["g2m"] + rr["m2g"])
        return 0.0, rows, rounds
    raise ValueError(family)


def model_rows(step_ms, train_ms, ici_gbps, latency_us, overhead=1.0):
    rows = []
    for family in ("graph_lam", "hi_lam", "hi_lam_parallel",
                   "graph_lam_rs", "hi_lam_rs", "hi_lam_parallel_rs",
                   "graph_lam_halo", "hi_lam_halo", "hi_lam_parallel_halo"):
        halo = family.endswith("_halo")
        if halo:
            full_bytes, halo_rows, n_coll = halo_mix(family)
            payload = full_bytes + halo_rows * B * D * BYTES
        else:
            n_coll, payload = collective_units(family)
        repl = REPL_FRACTION[family]
        for S in (2, 4, 8, 16):
            lat = n_coll * latency_us * 1e-6

            # strong: fixed problem; replicated node work constant.
            # halo: boundary bytes don't scale with (S-1)/S — constant;
            # any remaining full-array collectives (g2m rs, upper-level
            # psums in the hierarchical mixes) still do
            if halo:
                halo_b = halo_rows * B * D * BYTES
                comm = (full_bytes * (S - 1) / S + halo_b) \
                    / (ici_gbps * 1e9) + lat
            else:
                comm = payload * (S - 1) / S / (ici_gbps * 1e9) + lat
            t1 = step_ms / 1000.0
            # `overhead` = measured S=1 cost ratio of the sharded body vs
            # the unsharded step (probes/rs_overhead.py: ~1.27) — chunk
            # padding + shard_map boundary, a constant factor on the
            # sharded compute term
            t_s = overhead * t1 * (repl + (1 - repl) / S) + comm
            strong = t1 / (S * t_s)

            # weak: domain grows with S -> payload and replicated node
            # work grow ~S; local work constant. halo: cut bands per
            # shard stay constant as the domain grows
            if halo:
                comm_w = (full_bytes * (S - 1) + halo_b) \
                    / (ici_gbps * 1e9) + lat
            else:
                comm_w = payload * (S - 1) / (ici_gbps * 1e9) + lat
            t_w = overhead * t1 * ((1 - repl) + repl * S) + comm_w
            weak = t1 / t_w

            # train step: backward doubles the collective count/payload
            tr1 = train_ms / 1000.0
            tr_s = overhead * tr1 * (repl + (1 - repl) / S) + 2 * comm
            tr_w = overhead * tr1 * ((1 - repl) + repl * S) + 2 * comm_w
            rows.append({
                "family": family, "shards": S, "collectives": n_coll,
                "bytes_mb": round(payload / 1e6, 1),
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
    ap.add_argument("--step_ms", type=float, default=8.57,
                    help="measured single-chip predict-step ms (bench.py)")
    ap.add_argument("--train_ms", type=float, default=29.0,
                    help="measured single-chip train-step ms")
    ap.add_argument("--latency_us", type=float, default=5.0,
                    help="per-collective launch latency (us)")
    ap.add_argument("--overhead", type=float, default=1.0,
                    help="measured S=1 sharded-body cost ratio vs the "
                         "unsharded step (probes/rs_overhead.py; ~1.0 "
                         "after the ctx hoist + fused-decode fixes)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    rows = model_rows(args.step_ms, args.train_ms, args.ici_gbps,
                      args.latency_us, overhead=args.overhead)
    if args.json:
        print(json.dumps(rows))
        return
    print(f"{'family':17s} {'S':>3s} {'coll':>6s} {'MB':>6s} "
          f"{'fwd-strong%':>12s} {'fwd-weak%':>10s} "
          f"{'tr-strong%':>11s} {'tr-weak%':>9s}")
    for r in rows:
        print(f"{r['family']:17s} {r['shards']:3d} "
              f"{r['collectives']:6d} {r['bytes_mb']:6.1f} "
              f"{r['fwd_strong_eff_pct']:12.1f} "
              f"{r['fwd_weak_eff_pct']:10.1f} "
              f"{r['train_strong_eff_pct']:11.1f} "
              f"{r['train_weak_eff_pct']:9.1f}")


if __name__ == "__main__":
    main()
