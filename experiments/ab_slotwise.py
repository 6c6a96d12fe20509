"""A/B: ref_order='row' vs 'slot' on the single chip (round 3).

The slot-major layout exists so 30M vertices can compile at all
(BASELINE.md round 3); this measures what it costs (or saves) at the
tiers where both compile, to place SLOT_REF_ORDER_MIN_N. Timing per
CLAUDE.md: fused 50-iter blocks, fresh args per dispatch, 2-row sync.

Usage: python experiments/ab_slotwise.py [100k|1m|10m] ...
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np

ITERS = 50
FORCE = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
             sample_size=512)


def time_engine(name, emb, E):
    pos, key = emb._positions, emb._key

    def block(pos, key):
        pos, key = emb._multi_step(pos, key, emb._step_ops,
                                   num_steps=ITERS)
        np.asarray(pos[:2])
        return pos, key

    t0 = time.perf_counter()
    pos, key = block(pos, key)
    print(f"  [{name}: first block {time.perf_counter()-t0:.1f}s]",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pos, key = block(pos, key)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best/ITERS*1e3:8.2f} ms/iter "
          f"({E*ITERS/best/1e6:6.1f}M edges/s)", flush=True)


def main():
    import graphem_rapids_tpu as gr

    tiers = sys.argv[1:] or ["100k", "1m"]
    for tier in tiers:
        if tier == "100k":
            adj = gr.generate_random_regular(n=100_000, d=8, seed=0)
        elif tier == "1m":
            from experiments.bench_1m import build_adj

            adj = build_adj()
        elif tier == "10m":
            from experiments.probe_10m import build_adj

            adj = build_adj()
        else:
            raise SystemExit(f"unknown tier {tier}")
        print(f"== tier {tier} ==", flush=True)
        for order in ("row", "slot"):
            t0 = time.perf_counter()
            emb = gr.GraphEmbedderTPU(
                adj, n_components=3, seed=0, verbose=False, init="random",
                ref_order=order, **FORCE,
            )
            print(f"  [{order}: init {time.perf_counter()-t0:.1f}s "
                  f"strategy={emb._resolved_strategy()} "
                  f"fused={emb._fused_refs_active} "
                  f"binned={'buckets' in emb._nb}]", flush=True)
            time_engine(f"{tier} ref_order={order}", emb, emb.n_edges)
            del emb


if __name__ == "__main__":
    main()
