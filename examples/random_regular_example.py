#!/usr/bin/env python
"""Random-regular sweep with the full correlation matrix
(reference examples/random_regular_example.py analog)."""

import argparse
import os
import sys
from pathlib import Path

os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import networkx as nx
import numpy as np

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.benchmark import compute_centralities


def embed_and_correlate(n, d, iters):
    adj = gr.generate_random_regular(n=n, d=d, seed=0)
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False,
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=min(512, adj.nnz // 2),
    )
    pos = emb.run_layout(num_iterations=iters)
    radii = np.linalg.norm(pos, axis=1)
    cent = compute_centralities(nx.from_scipy_sparse_array(adj))
    return radii, cent


def main(smoke=False):
    n, iters = (100, 5) if smoke else (500, 30)

    print(f"=== degree sweep at n={n} ===")
    for d in (3, 4, 6):
        radii, cent = embed_and_correlate(n, d, iters)
        from scipy import stats

        # degree is constant on a regular graph; correlate with closeness
        rho, _ = stats.spearmanr(radii, cent["closeness"])
        print(f"  d={d}: Spearman(radius, closeness) = {rho:.3f}")

    if not smoke:
        print("\n=== full correlation matrix (n=500, d=4) ===")
        radii, cent = embed_and_correlate(500, 4, iters)
        gr.report_full_correlation_matrix(
            radii, cent["degree"], cent["betweenness"], cent["eigenvector"],
            cent["pagerank"], cent["closeness"], cent["node_load"],
        )


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
