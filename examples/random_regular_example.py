#!/usr/bin/env python
"""Random-regular sweeps with the full correlation matrix.

Sweep-style analog of the reference's random_regular_example.py
(reference examples/random_regular_example.py:26-396): a degree sweep
at fixed n, a size sweep at fixed degree, per-config graph statistics,
the full six-centrality Spearman matrix for every configuration, and a
closing summary table. `--smoke` runs a two-config CPU pass for CI.
"""

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import networkx as nx
import numpy as np

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.benchmark import compute_centralities

CENTRALITIES = ("degree", "betweenness", "eigenvector", "pagerank",
                "closeness", "node_load")


def graph_stats(adj, n):
    """Density / average degree / path length (when cheap) like the
    reference's per-config analysis block."""
    m = adj.nnz // 2
    stats = {
        "m": m,
        "density": 2 * m / (n * (n - 1)),
        "avg_degree": 2 * m / n,
    }
    if n <= 2000:
        G = nx.from_scipy_sparse_array(adj)
        if nx.is_connected(G):
            stats["avg_path_length"] = nx.average_shortest_path_length(G)
    return stats


def run_config(n, d, iters, dim=3):
    """Embed one (n, d) random-regular config; return timings and the
    full centrality correlation row."""
    from scipy import stats as sps

    t0 = time.time()
    adj = gr.generate_random_regular(n=n, d=d, seed=42)
    gen_time = time.time() - t0

    emb = gr.GraphEmbedderTPU(
        adj, n_components=dim, seed=0, verbose=False,
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=min(512, adj.nnz // 2),
    )
    t0 = time.time()
    pos = emb.run_layout(num_iterations=iters)
    layout_time = time.time() - t0

    radii = np.linalg.norm(pos - pos.mean(axis=0), axis=1)
    cent = compute_centralities(nx.from_scipy_sparse_array(adj))
    row = {"n": n, "d": d, "gen_time": gen_time,
           "layout_time": layout_time,
           "edges_per_sec": adj.nnz // 2 * iters / layout_time}
    for c in CENTRALITIES:
        rho, _ = sps.spearmanr(radii, cent[c])
        row[f"rho_{c}"] = rho
    row.update(graph_stats(adj, n))
    return row


def print_config(row):
    print(f"\n--- n={row['n']}, d={row['d']} ---")
    print(f"  edges={row['m']}  density={row['density']:.4f}  "
          f"avg_degree={row['avg_degree']:.2f}"
          + (f"  avg_path={row['avg_path_length']:.2f}"
             if "avg_path_length" in row else ""))
    print(f"  generate {row['gen_time']:.2f}s   layout "
          f"{row['layout_time']:.2f}s "
          f"({row['edges_per_sec']:,.0f} edges/s)")
    print("  Spearman(radius, centrality):")
    for c in CENTRALITIES:
        print(f"    {c:12s} {row[f'rho_{c}']:+.3f}")


def print_summary(rows, sweep_key):
    cols = " ".join(f"{c[:6]:>7s}" for c in CENTRALITIES)
    print(f"\n  {sweep_key:>5s} {'edges/s':>12s} {cols}")
    for r in rows:
        rhos = " ".join(f"{r[f'rho_{c}']:+7.3f}" for c in CENTRALITIES)
        print(f"  {r[sweep_key]:5d} {r['edges_per_sec']:12,.0f} {rhos}")


def main(smoke=False):
    iters = 5 if smoke else 30
    degrees = (3, 6) if smoke else (3, 4, 5, 6, 8)
    sizes = (100,) if smoke else (200, 500, 1000, 2000)
    n_fixed = 100 if smoke else 500

    print(f"{'=' * 70}\nDegree sweep at n={n_fixed}\n{'=' * 70}")
    deg_rows = []
    for d in degrees:
        row = run_config(n_fixed, d, iters)
        print_config(row)
        deg_rows.append(row)
    print(f"\nDegree-sweep summary (n={n_fixed}):")
    print_summary(deg_rows, "d")

    print(f"\n{'=' * 70}\nSize sweep at d=4\n{'=' * 70}")
    size_rows = []
    for n in sizes:
        row = run_config(n, 4, iters)
        print_config(row)
        size_rows.append(row)
    print("\nSize-sweep summary (d=4):")
    print_summary(size_rows, "n")

    # On a regular graph degree is constant (its rho is nan); closeness
    # is the meaningful "centrality recovered by radius" readout.
    best = max(deg_rows + size_rows, key=lambda r: r["rho_closeness"])
    print(f"\nBest Spearman(radius, closeness): {best['rho_closeness']:.3f}"
          f" at n={best['n']}, d={best['d']}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--platform", default=None,
                        choices=("cpu", "tpu"),
                        help="force a JAX platform; smoke mode "
                             "defaults to cpu (remote TPU compiles "
                             "are slow for one-off shapes)")
    args = parser.parse_args()
    platform = args.platform or ("cpu" if args.smoke else None)
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    main(smoke=args.smoke)
