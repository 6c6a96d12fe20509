"""Influence pipeline at a PRODUCTION tier (VERDICT r4 #3).

The committed influence suite evidence was n=200 only — a scale where
the engine resolves to the exact kNN strategy and greedy is cheap in
any implementation. This runs GraphEm-vs-greedy-vs-random at n=10K-50K
(BA hubs and SBM blocks), where:
  - the embedder's auto strategy resolves to BINFOLD (the production
    TPU path; asserted in-run and recorded per row), and
  - greedy is only affordable because each round's full candidate sweep
    runs as ONE batched device program (`influence.py _batched_marginal`,
    `lax.map` over candidates x vectorized IC sims) — the exact workload
    the batched simulator was built for (reference influence.py:87-128
    runs this sweep in pure Python via NDlib).

Writes benchmarks/results/r5_influence/influence_at_scale.{csv,md}.

Usage: python benchmarks/influence_at_scale.py [--quick]
  --quick: BA 10K only (the full run adds SBM 20K and BA 50K).
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import pandas as pd

import graphem_rapids_tpu as gr

LAYOUT = dict(
    L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15, sample_size=512,
)


def resolved_strategy(gen, params, dim):
    emb = gr.GraphEmbedderTPU(
        gen(**params), n_components=dim, verbose=False, **LAYOUT
    )
    return emb._resolved_strategy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--p", type=float, default=0.05)
    args = ap.parse_args()

    configs = [
        (gr.generate_ba, {"n": 10_000, "m": 5, "seed": 0}),
    ]
    if not args.quick:
        configs += [
            (gr.generate_sbm, {"n_per_block": 5_000, "num_blocks": 4,
                               "p_in": 0.002, "p_out": 0.0002, "seed": 0}),
            (gr.generate_ba, {"n": 50_000, "m": 4, "seed": 0}),
        ]

    rows = []
    for gen, params in configs:
        strat = resolved_strategy(gen, params, dim=3)
        name = f"{gen.__name__}({params})"
        print(f"[{name}] strategy={strat}", flush=True)
        t0 = time.time()
        res = gr.run_influence_benchmark(
            gen, params, k=args.k, p=args.p, dim=3,
            num_layout_iterations=30, num_random_baselines=10,
            num_sims=64, backend="auto",
        )
        rows.append({
            "graph_type": res["graph_type"],
            "n": res["n"], "m": res["m"],
            "strategy": strat,
            "graphem_spread": res["graphem_influence"],
            "greedy_spread": res["greedy_influence"],
            "random_spread": res["random_influence"],
            "graphem_norm": res["graphem_norm_influence"],
            "greedy_norm": res["greedy_norm_influence"],
            "random_norm": res["random_norm_influence"],
            "graphem_time_s": res["graphem_time"],
            "greedy_time_s": res["greedy_time"],
            "graphem_efficiency": res["graphem_efficiency"],
            "greedy_efficiency": res["greedy_efficiency"],
            "efficiency_x": (
                res["graphem_efficiency"] / res["greedy_efficiency"]
                if res["greedy_efficiency"] else float("inf")
            ),
            "spread_ratio_vs_greedy": (
                res["graphem_influence"] / res["greedy_influence"]
                if res["greedy_influence"] else float("inf")
            ),
        })
        print(f"  graphem {res['graphem_influence']:.1f} "
              f"({res['graphem_time']:.1f}s) vs greedy "
              f"{res['greedy_influence']:.1f} ({res['greedy_time']:.1f}s) "
              f"vs random {res['random_influence']:.1f}; wall "
              f"{time.time()-t0:.0f}s", flush=True)

    df = pd.DataFrame(rows)
    out = Path(__file__).parent / "results" / "r5_influence"
    out.mkdir(parents=True, exist_ok=True)
    df.to_csv(out / "influence_at_scale.csv", index=False)
    (out / "influence_at_scale.md").write_text(
        df.to_markdown(index=False, floatfmt=".4f")
    )
    print(f"\nwrote {out}/influence_at_scale.[csv,md]")
    print(df.to_markdown(index=False, floatfmt=".3f"))


if __name__ == "__main__":
    main()
