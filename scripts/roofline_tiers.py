"""Speed-of-light accounting for the single-chip scale tiers.

VERDICT r3 #2: BASELINE.md claims the step is "at the HBM gather floor"
at every tier >= 1M, but never quantifies the headroom. This script
rebuilds each tier's neighbor-table plan HOST-SIDE (to_device=False —
safe to run while the TPU is busy), counts the actual gathered rows and
streamed bytes per iteration, and prints a markdown table of

    floor model = gather_rows x 9 ns  +  knn_stream_bytes / HBM_BW

against the measured warm step times banked in BASELINE.md. The 9 ns/row
gather cost is the measured XLA per-row floor (docs/ROADMAP.md: flat vs
promise_in_bounds, bf16, row padding, RCM — all no effect); each row
moves ~512 B effective (one (8,128)-tile lane row), so the implied HBM
rate is also shown as a roofline fraction via utils/profiling.roofline.

Tier workloads reproduce the banked runs (r4 slot-major defaults):
  1M:   ring + 3M chords      (experiments/bench_1m.py,   57.8 ms/iter)
  10M:  ring + 25M chords     (experiments/bench_10m.py,  683 ms/iter)
  30M:  experiments/data/graph_30m.npz  (bench_30m.py,    1882 ms/iter)
  100M: experiments/data/graph_100m.npz (bench_100m.py,   2597.9 ms/iter)

Usage: python scripts/roofline_tiers.py [--tiers 1m,10m,30m,100m]
(default 1m,10m; the 30M/100M builds need the npz graphs + several
minutes of host table-build time)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E501
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import jax

jax.config.update("jax_platforms", "cpu")  # host-only: never claim the TPU

import numpy as np
import scipy.sparse as sp

# Measured per-row gather floor as a function of SOURCE ROW COUNT (the
# r4-r5 probes established the cost curve is a working-set/row-count
# curve, not a constant — and that index structure does not move it:
# experiments/gather_locality_probe.py, packed_gather_probe.py,
# profile_step_100k_slot.py, probe_30m_phases.py). Interpolated
# log-linearly between measured points; the flat 9 ns/row the r4 model
# used made the 1M slot tier read a nonsensical 126% of floor
# (VERDICT r4 weak #1 / ADVICE r4).
GATHER_NS_CURVE = [
    (1e5, 2.45),   # 100K in-situ slot gathers (profile_100k_slot)
    (1e6, 5.90),   # 1M isolated probe (gather_locality_r5.log)
    (1e7, 6.81),   # 10M isolated probe (gather_locality_r5.log)
    (3e7, 7.50),   # 30M in-situ slot gathers (probe_30m_phases)
]
GATHER_BYTES_PER_ROW = 512   # one (8,128) f32 lane row per gathered row
REF_BYTES = 12               # binfold streams (d=3, E_pad) f32 refs once
# Inside the lane-packed auto window (models/embedder.py
# PACKED_GATHER_MIN_N..MAX_N) the engine gathers from the (n/G, G*d)
# packed source; the measured composed rate is ~3.3 ns/row at 1M
# (packed_gather_r5b.log) — the floor for in-window tiers.
PACKED_WINDOW = (250_000, 2_500_000)
PACKED_NS_PER_ROW = 3.3


def gather_ns_per_row(source_rows):
    """Log-linear interpolation of the measured floor curve (clamped at
    the endpoints)."""
    import math

    pts = GATHER_NS_CURVE
    if source_rows <= pts[0][0]:
        return pts[0][1]
    if source_rows >= pts[-1][0]:
        return pts[-1][1]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        if x0 <= source_rows <= x1:
            f = (math.log(source_rows) - math.log(x0)) / (
                math.log(x1) - math.log(x0)
            )
            return y0 + f * (y1 - y0)
    return pts[-1][1]

# measured warm s/iter from BASELINE.md (logs in experiments/data/)
# — round-4 slot-major-default re-measures; the r3 row-major values the
# original accounting ran against are kept in BASELINE.md's table.
MEASURED = {
    "1m":   dict(s_iter=0.03392, src="r5 packed A/B + bench.py (117.97M e/s)"),
    "10m":  dict(s_iter=0.683,   src="BASELINE.md 10M tier r4 slot (51.22M e/s)"),
    "30m":  dict(s_iter=1.882,   src="bench_30m_binned_r4.log (51.01M e/s)"),
    "100m": dict(s_iter=2.5979,  src="bench_100m_r3.log (44.27M e/s)"),
}


def build_adj_ring_chords(n, chords, seed=0):
    rng = np.random.default_rng(seed)
    ring = np.column_stack([np.arange(n), (np.arange(n) + 1) % n])
    ch = rng.integers(0, n, (chords, 2))
    ch = ch[ch[:, 0] != ch[:, 1]]
    e = np.concatenate([ring, ch])
    i, j = np.minimum(e[:, 0], e[:, 1]), np.maximum(e[:, 0], e[:, 1])
    a = sp.coo_matrix((np.ones(len(e)), (i, j)), shape=(n, n)).tocsr()
    a.data[:] = 1
    return a + a.T


def edges_from_adj(adj):
    from graphem_rapids_tpu.models.embedder import GraphEmbedderTPU  # noqa

    coo = sp.triu(adj, k=1).tocoo()
    return np.column_stack([coo.row, coo.col]).astype(np.int64)


def plan_rows(edges_np, n):
    """Gathered rows + ref slots per iteration for the tier's plan,
    mirroring the embedder's TPU auto choices (binned table, fused refs,
    segmented ref budget)."""
    from graphem_rapids_tpu.ops.forces import build_neighbor_table_binned
    from graphem_rapids_tpu.ops.knn_binfold import MAX_REFS_SEGMENTED

    nb = build_neighbor_table_binned(
        edges_np, n, overhead_rows=4096,
        ref_order="slot", ref_budget=MAX_REFS_SEGMENTED - 1,
        to_device=False,
    )
    if nb is None:  # plan degenerated to one bucket -> flat table
        from graphem_rapids_tpu.ops.forces import build_neighbor_table

        nb = build_neighbor_table(
            edges_np, n, ref_order="slot",
            ref_budget=MAX_REFS_SEGMENTED - 1, to_device=False,
        )
        slots = int(np.prod(np.asarray(nb["table_t"]).shape[:2]))
    else:
        slots = 0
        for b in nb["buckets"]:
            tbl = b.get("table", b.get("table_t"))
            slots += int(np.prod(np.asarray(tbl).shape[:2]))
    ref_slots = int(nb["ref_valid"].shape[0]) + len(nb["overflow_lt"])
    n_over = len(nb["overflow"])
    return slots, ref_slots, n_over


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="1m,10m")
    args = ap.parse_args()
    tiers = args.tiers.split(",")

    from graphem_rapids_tpu.utils.profiling import roofline

    rows = []
    for tier in tiers:
        t0 = time.perf_counter()
        if tier == "1m":
            adj = build_adj_ring_chords(1_000_000, 3_000_000)
            e = edges_from_adj(adj)
            n = 1_000_000
        elif tier == "10m":
            adj = build_adj_ring_chords(10_000_000, 25_000_000)
            e = edges_from_adj(adj)
            n = 10_000_000
        elif tier in ("30m", "100m"):
            from graphem_rapids_tpu.native import csr_lt_edges_native

            path = os.path.join(
                os.path.dirname(__file__), "..", "experiments", "data",
                f"graph_{tier}.npz",
            )
            adj = sp.load_npz(path)
            n = adj.shape[0]
            e = csr_lt_edges_native(adj.indptr, adj.indices, n)
            if e is None:
                coo = sp.triu(adj, k=1).tocoo()
                e = np.column_stack([coo.row, coo.col]).astype(np.int64)
        else:
            raise SystemExit(f"unknown tier {tier}")
        E = len(e)
        slots, ref_slots, n_over = plan_rows(e, n)
        build_s = time.perf_counter() - t0

        m = MEASURED[tier]
        if PACKED_WINDOW[0] <= n < PACKED_WINDOW[1]:
            ns_row = PACKED_NS_PER_ROW  # lane-packed window
        else:
            ns_row = gather_ns_per_row(n)  # source = (n, d) positions
        gather_s = slots * ns_row * 1e-9
        stream_s = ref_slots * REF_BYTES / 819e9
        floor_s = gather_s + stream_s
        pct = 100.0 * floor_s / m["s_iter"]
        rl = roofline(
            tier, m["s_iter"],
            bytes_accessed=slots * GATHER_BYTES_PER_ROW
            + ref_slots * REF_BYTES,
        )
        rows.append((tier, n, E, slots, ref_slots, m["s_iter"], floor_s,
                     pct, rl["achieved_gbps"],
                     100 * rl["bandwidth_fraction"]))
        print(f"[{tier}] n={n:,} E={E:,} slots={slots:,} "
              f"refs={ref_slots:,} overflow={n_over:,} "
              f"(host build {build_s:.1f}s)", flush=True)

    print("\n| tier | E | gather rows/iter | ref slots | measured s/iter "
          "| floor model s | % of floor | eff. HBM GB/s | % HBM BW |")
    print("|---|---|---|---|---|---|---|---|---|")
    for (tier, n, E, slots, refs, meas, floor, pct, gbps, bwpct) in rows:
        print(f"| {tier} | {E/1e6:.1f}M | {slots/1e6:.1f}M | "
              f"{refs/1e6:.1f}M | {meas:.3f} | {floor:.3f} | "
              f"{pct:.0f}% | {gbps:.0f} | {bwpct:.0f}% |")
    print("\nfloor model = rows x ns/row(source rows; measured curve "
          "2.45@100K - 7.5@30M) + ref-stream bytes / 819 GB/s; '% of "
          "floor' near 100% means the step is gather-bound end to end; "
          "the gap is the binfold segment sweep + intersection + "
          "normalize phases. The floor uses the ISOLATED-probe rates, "
          "so sub-100% tiers carry real in-situ headroom (VERDICT r4 "
          "#2); the lane-packed gather (ops/forces.py packed_take) "
          "attacks exactly that term.")


if __name__ == "__main__":
    main()
