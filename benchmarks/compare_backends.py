#!/usr/bin/env python
"""Strategy comparison CLI (reference benchmarks/compare_backends.py).

Sweeps kNN strategies (exact / chunked / approx / pallas and, on multi-
device hosts, sharded) over graph configs; records layout_time,
throughput_vertices_per_sec, throughput_edges_per_sec; writes a CSV and a
speedup table vs the 'chunked' strategy (the portable baseline tier).
Plots are emitted when matplotlib is available.
"""

import argparse
import os
import sys
import time
from datetime import datetime
from pathlib import Path

os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "--platform" in sys.argv:  # must precede first jax backend use
    import jax

    jax.config.update(
        "jax_platforms", sys.argv[sys.argv.index("--platform") + 1]
    )

import graphem_rapids_tpu as gr  # noqa: E402

GRAPH_CONFIGS = [
    ("er_small", gr.erdos_renyi_graph, {"n": 1000, "p": 0.01, "seed": 0}),
    ("er_medium", gr.erdos_renyi_graph, {"n": 5000, "p": 0.002, "seed": 0}),
    ("ba_small", gr.generate_ba, {"n": 1000, "m": 3, "seed": 0}),
    ("ba_medium", gr.generate_ba, {"n": 5000, "m": 3, "seed": 0}),
    ("regular_small", gr.generate_random_regular,
     {"n": 1000, "d": 6, "seed": 0}),
    ("regular_medium", gr.generate_random_regular,
     {"n": 10000, "d": 6, "seed": 0}),
    ("ws_medium", gr.generate_ws, {"n": 5000, "k": 6, "p": 0.3, "seed": 0}),
]

FORCE_PARAMS = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
                    sample_size=512)


def bench_config(name, gen, params, strategy, iterations, dim):
    adj = gen(**params)
    n = adj.shape[0]
    m = int(adj.nnz // 2)
    try:
        if strategy == "sharded":
            from graphem_rapids_tpu.parallel import ShardedGraphEmbedder

            emb = ShardedGraphEmbedder(adj, n_components=dim, seed=0,
                                       verbose=False, **FORCE_PARAMS)
        else:
            emb = gr.GraphEmbedderTPU(adj, n_components=dim, seed=0,
                                      verbose=False, knn_strategy=strategy,
                                      **FORCE_PARAMS)
        emb.run_layout(num_iterations=3)  # warm-up / compile
        t0 = time.perf_counter()
        emb.run_layout(num_iterations=iterations)
        layout_time = time.perf_counter() - t0
    except Exception as e:
        print(f"  {strategy} failed: {e}")
        return None
    return {
        "graph": name,
        "strategy": strategy,
        "n": n,
        "m": m,
        "layout_time": layout_time,
        "throughput_vertices_per_sec": n * iterations / layout_time,
        "throughput_edges_per_sec": m * iterations / layout_time,
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--strategies", nargs="+",
                        default=["exact", "chunked", "approx", "pallas"])
    parser.add_argument("--iterations", type=int, default=20)
    parser.add_argument("--dim", type=int, default=3)
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu) — applied "
                             "before backend init")
    args = parser.parse_args()

    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    out = Path(args.output_dir or
               Path(__file__).parent / "results" / f"compare_{stamp}")
    out.mkdir(parents=True, exist_ok=True)

    rows = []
    for name, gen, params in GRAPH_CONFIGS:
        print(f"[{name}]", flush=True)
        for strategy in args.strategies:
            r = bench_config(name, gen, params, strategy, args.iterations,
                             args.dim)
            if r:
                rows.append(r)
                print(f"  {strategy:8s} {r['layout_time']:.3f}s "
                      f"({r['throughput_edges_per_sec']:,.0f} edges/s)",
                      flush=True)

    df = pd.DataFrame(rows)
    df.to_csv(out / "comparison.csv", index=False)

    # speedup table vs chunked (portable baseline)
    if "chunked" in set(df["strategy"]):
        base = df[df["strategy"] == "chunked"].set_index("graph")[
            "layout_time"
        ]
        df["speedup_vs_chunked"] = df.apply(
            lambda r: base.get(r["graph"], np.nan) / r["layout_time"], axis=1
        )
        pivot = df.pivot_table(index="graph", columns="strategy",
                               values="speedup_vs_chunked")
        pivot.to_csv(out / "speedup_table.csv")
        print("\nSpeedup vs chunked:")
        print(pivot.to_string(float_format="%.2f"))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 5))
        for strategy, g in df.groupby("strategy"):
            ax.plot(g["m"], g["throughput_edges_per_sec"], "o-",
                    label=strategy)
        ax.set_xscale("log")
        ax.set_yscale("log")
        ax.set_xlabel("edges")
        ax.set_ylabel("edges/s")
        ax.legend()
        ax.set_title("Layout throughput by kNN strategy")
        fig.savefig(out / "scalability.png", dpi=120, bbox_inches="tight")
        plt.close(fig)

        # per-strategy layout-time bars per graph (reference
        # compare_backends.py:175-197, seaborn barplot -> plain mpl)
        graphs = list(df["graph"].unique())
        strategies = list(df["strategy"].unique())
        fig, ax = plt.subplots(figsize=(12, 5))
        width = 0.8 / max(len(strategies), 1)
        x = np.arange(len(graphs))
        for j, strategy in enumerate(strategies):
            g = df[df["strategy"] == strategy].set_index("graph")
            y = [g["layout_time"].get(name, np.nan) for name in graphs]
            ax.bar(x + j * width, y, width, label=strategy)
        ax.set_yscale("log")
        ax.set_xticks(x + 0.4 - width / 2)
        ax.set_xticklabels(graphs, rotation=45, ha="right")
        ax.set_ylabel("layout time (s, log)")
        ax.set_title("Layout time by graph and kNN strategy")
        ax.legend()
        fig.savefig(out / "layout_time_bars.png", dpi=120,
                    bbox_inches="tight")
        plt.close(fig)

        # speedup heatmap (reference compare_backends.py:224-237,
        # seaborn heatmap -> plain mpl imshow with annotations)
        if "chunked" in set(df["strategy"]):
            hm = df.pivot_table(index="graph", columns="strategy",
                                values="speedup_vs_chunked")
            fig, ax = plt.subplots(
                figsize=(1.6 * len(hm.columns) + 3, 0.5 * len(hm) + 2)
            )
            im = ax.imshow(hm.values, cmap="RdYlBu", aspect="auto",
                           vmin=0.0)
            ax.set_xticks(range(len(hm.columns)))
            ax.set_xticklabels(hm.columns)
            ax.set_yticks(range(len(hm.index)))
            ax.set_yticklabels(hm.index)
            for r in range(hm.shape[0]):
                for c in range(hm.shape[1]):
                    v = hm.values[r, c]
                    if np.isfinite(v):
                        ax.text(c, r, f"{v:.2f}", ha="center",
                                va="center", fontsize=8)
            fig.colorbar(im, ax=ax, label="speedup vs chunked")
            ax.set_title("kNN strategy speedup heatmap")
            fig.savefig(out / "speedup_heatmap.png", dpi=120,
                        bbox_inches="tight")
            plt.close(fig)
    except ImportError:
        pass

    print(f"\nResults written to {out}")


if __name__ == "__main__":
    main()
