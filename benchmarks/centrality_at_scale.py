#!/usr/bin/env python
"""6-centrality correlation matrix at a binfold-engaged tier.

VERDICT r3 #6: the dataset/generator suites measure the centrality
matrix only on small graphs where the EXACT kNN strategy runs; this
script runs it at n=10K — where the TPU auto strategy resolves to the
production binfold kernel (and, for the BA config, the skewed-degree
table-cap/overflow machinery) — so the quality evidence covers the
strategies production actually uses.

Reference anchor: benchmarks/run_benchmarks.py:116-190 (generator
suite semantics) and reference graphem_rapids/benchmark.py:166-243
(centrality matrix). Host centralities follow the reference's
approach; at n=10K the O(n*m) measures use nx's k-source approximation
for betweenness (k=1000, seeded) — the reference itself gates exact
centralities at n<5000 (reference run_benchmarks.py:256-270) — and
closeness/load run exact (minutes of host time).

Usage:
  python benchmarks/centrality_at_scale.py [--iterations 30] [--out DIR]
"""

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import networkx as nx  # noqa: E402
from scipy.stats import spearmanr  # noqa: E402

import graphem_rapids_tpu as gr  # noqa: E402

CONFIGS = [
    ("sbm_10k", gr.generate_sbm,
     dict(n_per_block=2500, num_blocks=4, p_in=0.01, p_out=0.001,
          seed=3)),
    ("ba_10k_hubs", gr.generate_ba, dict(n=10_000, m=5, seed=3)),
]

FORCE = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
             sample_size=512)


def centralities(G, seed=0):
    """The reference's 6 measures (benchmark.py:74-108), with seeded
    k-source approximation for betweenness at this scale."""
    out = {}
    t = {}
    for name, fn in [
        ("degree", lambda: nx.degree_centrality(G)),
        ("betweenness", lambda: nx.betweenness_centrality(
            G, k=1000, seed=seed)),
        ("eigenvector", lambda: nx.eigenvector_centrality_numpy(G)),
        ("pagerank", lambda: nx.pagerank(G)),
        ("closeness", lambda: nx.closeness_centrality(G)),
        ("node_load", lambda: nx.load_centrality(G)),
    ]:
        t0 = time.perf_counter()
        try:
            out[name] = fn()
        except Exception as exc:
            print(f"  {name} failed ({exc!r}); degree fallback",
                  flush=True)
            out[name] = nx.degree_centrality(G)
        t[name] = time.perf_counter() - t0
        print(f"  centrality {name}: {t[name]:.1f}s", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out_dir = Path(args.out or Path(__file__).parent / "results"
                   / "r4_centrality")
    out_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    for name, gen, params in CONFIGS:
        adj = gen(**params)
        n = adj.shape[0]
        E = adj.nnz // 2
        print(f"\n[{name}] n={n} E={E}", flush=True)

        emb = gr.GraphEmbedderTPU(adj, n_components=3, seed=0,
                                  verbose=False, **FORCE)
        strategy = emb._resolved_strategy()
        print(f"  strategy={strategy} binned={emb._perm is not None}",
              flush=True)
        t0 = time.perf_counter()
        pos = emb.run_layout(num_iterations=args.iterations)
        t_layout = time.perf_counter() - t0
        radii = np.linalg.norm(pos, axis=1)
        print(f"  layout {args.iterations} iters: {t_layout:.1f}s",
              flush=True)

        G = nx.from_scipy_sparse_array(adj)
        cents = centralities(G)
        row = dict(graph=name, n=n, edges=E, strategy=strategy,
                   layout_s=round(t_layout, 2))
        for cname, cdict in cents.items():
            vec = np.array([cdict[i] for i in range(n)])
            if np.std(vec) < 1e-12:
                row[cname] = np.nan
            else:
                row[cname] = round(
                    float(spearmanr(radii, vec).statistic), 4
                )
            print(f"  spearman(radius, {cname}) = {row[cname]}",
                  flush=True)
        rows.append(row)

    df = pd.DataFrame(rows)
    csv = out_dir / "centrality_at_scale.csv"
    df.to_csv(csv, index=False)
    print(f"\nsaved {csv}")
    print(df.to_markdown(index=False))


if __name__ == "__main__":
    main()
