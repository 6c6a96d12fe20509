#!/usr/bin/env python
"""Benchmark runner CLI (reference benchmarks/run_benchmarks.py).

Three suites — generator benchmarks (9 graph families, per-centrality
Spearman), dataset benchmarks (SNAP loaders with LCC extraction and
optional subsampling), influence benchmarks (GraphEm vs greedy vs random) —
with CSV / Markdown / LaTeX / HTML reports and a summary, plus opt-in
profiling modes (cProfile and jax.profiler traces; the TPU analog of the
reference's torch.profiler mode, SURVEY.md §5.1).
"""

import argparse
import cProfile
import io
import os
import pstats
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

GENERATOR_CONFIGS = [
    (gr.erdos_renyi_graph, {"n": 500, "p": 0.01, "seed": 0}),
    (gr.generate_sbm, {"n_per_block": 125, "num_blocks": 4, "seed": 0}),
    (gr.generate_ba, {"n": 500, "m": 3, "seed": 0}),
    (gr.generate_ws, {"n": 500, "k": 6, "p": 0.3, "seed": 0}),
    (gr.generate_power_cluster, {"n": 500, "m": 3, "p": 0.5, "seed": 0}),
    (gr.generate_road_network, {"width": 22, "height": 22}),
    (gr.generate_balanced_tree, {"r": 2, "h": 8}),
    (gr.generate_random_regular, {"n": 500, "d": 4, "seed": 0}),
    (gr.generate_scale_free, {"n": 500, "seed": 0}),
]

# SNAP sets run when their download cache exists; the vendored local-*
# graphs (real classic networks checked into benchmarks/data/vendored)
# always run, so the dataset suite produces artifacts on offline hosts
DATASET_NAMES = [
    "snap-facebook_combined", "snap-ca-GrQc", "snap-ca-HepTh",
    "local-karate", "local-lesmis", "local-davis", "local-florentine",
]

INFLUENCE_CONFIGS = [
    (gr.erdos_renyi_graph, {"n": 200, "p": 0.05, "seed": 0}),
    (gr.generate_ba, {"n": 200, "m": 3, "seed": 0}),
    (gr.generate_ws, {"n": 200, "k": 6, "p": 0.3, "seed": 0}),
    (gr.generate_random_regular, {"n": 200, "d": 4, "seed": 0}),
    (gr.generate_sbm, {"n_per_block": 50, "num_blocks": 4, "seed": 0}),
]

CENTRALITY_COLUMNS = [
    "degree", "betweenness", "eigenvector", "pagerank", "closeness",
    "node_load",
]


class BenchmarkRunner:
    """Collects suite results into a timestamped directory
    (reference run_benchmarks.py:57-113)."""

    def __init__(self, output_dir=None, dim=3, num_iterations=30):
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        self.output_dir = Path(
            output_dir or Path(__file__).parent / "results" / stamp
        )
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.dim = dim
        self.num_iterations = num_iterations
        self.results = {}

    # ---------------- suites ---------------- #

    def run_generator_benchmarks(self):
        rows = []
        for gen, params in GENERATOR_CONFIGS:
            print(f"[generators] {gen.__name__} ...", flush=True)
            res = gr.benchmark_correlations(
                gen, params, dim=self.dim,
                num_iterations=self.num_iterations,
            )
            row = {
                "graph_type": res["graph_type"],
                "n": res["n"], "m": res["m"],
                "density": res["density"],
                "layout_time": res["layout_time"],
                "edges_per_second": res["edges_per_second"],
            }
            for c in CENTRALITY_COLUMNS:
                rho = res["correlations"][c]["rho"]
                row[f"rho_{c}"] = None if np.isnan(rho) else rho
            rows.append(row)
        self.results["generators"] = pd.DataFrame(rows)
        return self.results["generators"]

    def run_dataset_benchmarks(self, max_vertices=5000):
        import networkx as nx

        rows = []
        for name in DATASET_NAMES:
            print(f"[datasets] {name} ...", flush=True)
            try:
                adj = gr.load_dataset_as_adjacency(name)
            except Exception as e:  # offline or missing cache
                print(f"  skipped ({e})", flush=True)
                continue
            G = nx.from_scipy_sparse_array(adj)
            # largest connected component (reference :256-270)
            lcc = max(nx.connected_components(G), key=len)
            G = G.subgraph(lcc).copy()
            if G.number_of_nodes() > max_vertices:
                nodes = list(G.nodes())[:max_vertices]
                G = G.subgraph(nodes).copy()
            G = nx.convert_node_labels_to_integers(G)
            adj = nx.to_scipy_sparse_array(G, format="csr")

            emb = gr.create_graphem(adj, n_components=self.dim, seed=0,
                                    verbose=False)
            t0 = time.time()
            emb.run_layout(num_iterations=self.num_iterations)
            layout_time = time.time() - t0
            radii = np.linalg.norm(emb.positions, axis=1)
            from scipy import stats

            row = {
                "dataset": name,
                "n": adj.shape[0],
                "m": int(adj.nnz // 2),
                "layout_time": layout_time,
            }
            if adj.shape[0] < 5000:
                # full six-centrality correlation set, matching the
                # reference's dataset suite depth for n < 5000
                # (reference run_benchmarks.py:192-368)
                from graphem_rapids_tpu.benchmark import (
                    compute_centralities,
                )

                cents = compute_centralities(G)
                for c in CENTRALITY_COLUMNS:
                    rho, _ = stats.spearmanr(radii, cents[c])
                    row[f"rho_{c}"] = None if np.isnan(rho) else rho
            else:
                deg = np.array([d for _, d in G.degree()])
                rho, _ = stats.spearmanr(radii, deg)
                row["rho_degree"] = rho
            rows.append(row)
        self.results["datasets"] = pd.DataFrame(rows)
        return self.results["datasets"]

    def run_influence_benchmarks(self, k=10, p=0.1):
        rows = []
        for gen, params in INFLUENCE_CONFIGS:
            print(f"[influence] {gen.__name__} ...", flush=True)
            res = gr.run_influence_benchmark(
                gen, params, k=k, p=p, dim=self.dim,
                num_layout_iterations=20, num_random_baselines=5,
            )
            rows.append({
                "graph_type": res["graph_type"],
                "n": res["n"], "m": res["m"],
                "graphem_influence": res["graphem_influence"],
                "greedy_influence": res["greedy_influence"],
                "random_influence": res["random_influence"],
                "graphem_time": res["graphem_time"],
                "greedy_time": res["greedy_time"],
                "graphem_efficiency": res["graphem_efficiency"],
                "greedy_efficiency": res["greedy_efficiency"],
            })
        self.results["influence"] = pd.DataFrame(rows)
        return self.results["influence"]

    def run_all_benchmarks(self, include_datasets=False):
        self.run_generator_benchmarks()
        if include_datasets:
            self.run_dataset_benchmarks()
        self.run_influence_benchmarks()
        self.save_results()

    # ---------------- reports ---------------- #

    GLOSSARY = {
        "n": "number of vertices",
        "m": "number of undirected edges",
        "density": "2m / n(n-1)",
        "layout_time": "wall-clock seconds for the layout loop",
        "edges_per_second": "m * iterations / layout_time",
        "rho_*": "Spearman correlation of embedding radius vs centrality",
        "graphem_efficiency": "normalized influence per second",
    }

    def save_results(self):
        for suite, df in self.results.items():
            if df.empty:
                continue
            df.to_csv(self.output_dir / f"{suite}.csv", index=False)
            (self.output_dir / f"{suite}.md").write_text(
                df.to_markdown(index=False, floatfmt=".4f")
            )
            (self.output_dir / f"{suite}.tex").write_text(
                df.to_latex(index=False, float_format="%.4f")
            )
            (self.output_dir / f"{suite}.html").write_text(
                df.to_html(index=False, float_format="%.4f")
            )
        summary = ["# Benchmark summary", "",
                   f"Generated {datetime.now().isoformat()}", "",
                   "## Column glossary", ""]
        summary += [f"- `{k}`: {v}" for k, v in self.GLOSSARY.items()]
        summary += ["", "## Suites", ""]
        for suite, df in self.results.items():
            summary.append(f"### {suite}\n")
            summary.append(df.to_markdown(index=False, floatfmt=".4f"))
            summary.append("")
        (self.output_dir / "summary.md").write_text("\n".join(summary))
        print(f"Results written to {self.output_dir}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--suite", default="all",
                        choices=["all", "generators", "datasets",
                                 "influence"])
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--dim", type=int, default=3)
    parser.add_argument("--iterations", type=int, default=30)
    parser.add_argument("--include-datasets", action="store_true",
                        help="include dataset suite in --suite all "
                             "(needs local cache or network)")
    parser.add_argument("--profile", action="store_true",
                        help="cProfile the run, dump top-20 cumulative")
    parser.add_argument("--line-profile", action="store_true",
                        help="line-by-line profile of the hot engine "
                             "methods (line_profiler; falls back to a "
                             "per-function tottime breakdown of the "
                             "package when line_profiler is absent)")
    parser.add_argument("--jax-profile", default=None, metavar="DIR",
                        help="write a jax.profiler trace (Perfetto/XProf) "
                             "to DIR")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu) — applied "
                             "before backend init")
    args = parser.parse_args()

    runner = BenchmarkRunner(args.output_dir, dim=args.dim,
                             num_iterations=args.iterations)

    def run():
        if args.suite == "all":
            runner.run_all_benchmarks(include_datasets=args.include_datasets)
        elif args.suite == "generators":
            runner.run_generator_benchmarks()
            runner.save_results()
        elif args.suite == "datasets":
            runner.run_dataset_benchmarks()
            runner.save_results()
        elif args.suite == "influence":
            runner.run_influence_benchmarks()
            runner.save_results()

    if args.jax_profile:
        import jax

        with jax.profiler.trace(args.jax_profile):
            run()
        print(f"jax trace written to {args.jax_profile}")
    elif args.line_profile:
        # reference run_benchmarks.py:1031-1045 (LineProfiler over the
        # engine's hot methods); optional here with a per-function
        # host-time fallback — on TPU the device work is opaque to any
        # line profiler anyway, --jax-profile is the device-side view
        try:
            from line_profiler import LineProfiler

            prof = LineProfiler()
            prof.add_function(
                gr.GraphEmbedderTPU.run_layout.__wrapped__
                if hasattr(gr.GraphEmbedderTPU.run_layout, "__wrapped__")
                else gr.GraphEmbedderTPU.run_layout
            )
            prof.add_function(BenchmarkRunner.run_generator_benchmarks)
            prof.runctx("run()", globals(), {"run": run})
            prof.print_stats()
        except ImportError:
            print("line_profiler not installed; per-function host-time "
                  "breakdown of graphem_rapids_tpu instead:")
            prof = cProfile.Profile()
            prof.enable()
            run()
            prof.disable()
            s = io.StringIO()
            pstats.Stats(prof, stream=s).sort_stats("tottime").print_stats(
                "graphem_rapids_tpu", 25
            )
            print(s.getvalue())
    elif args.profile:
        # reference run_benchmarks.py:1018-1029 (cProfile + pstats top-20)
        prof = cProfile.Profile()
        prof.enable()
        run()
        prof.disable()
        prof.dump_stats(runner.output_dir / "profile.prof")
        s = io.StringIO()
        pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(20)
        print(s.getvalue())
    else:
        run()


if __name__ == "__main__":
    main()
