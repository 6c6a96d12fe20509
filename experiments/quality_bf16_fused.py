"""Layout-quality check for the fused+bf16 approx kNN step.

Spearman(radius, degree) on heterogeneous-degree graphs, f32 vs bf16
distance compute, fused vs direct midpoints. The correlation is the
reference's own headline quality metric (benchmark.py:166-243).
"""

import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import numpy as np
from scipy.stats import spearmanr

import jax.numpy as jnp


def run(adj, deg, label, **extra):
    import graphem_rapids_tpu as gr

    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, L_min=10.0, k_attr=0.5,
        k_inter=0.1, n_neighbors=15, sample_size=512,
        knn_strategy="approx", **extra,
    )
    emb.run_layout(30, block_size=10)
    r = np.linalg.norm(emb.positions, axis=1)
    rho = spearmanr(r, deg).statistic
    print(f"{label:40s} spearman(radius, degree) = {rho:.4f}")


def main():
    import networkx as nx
    import scipy.sparse as sp

    for gname, G in [
        ("ER n=3000 p=0.01", nx.erdos_renyi_graph(3000, 0.01, seed=0)),
        ("BA n=5000 m=5", nx.barabasi_albert_graph(5000, 5, seed=0)),
    ]:
        adj = sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))
        deg = np.asarray(adj.sum(axis=1)).ravel()
        for label, extra in [
            ("f32 direct", dict(fused_midpoints=False)),
            ("bf16 fused", dict(fused_midpoints=True,
                                knn_compute_dtype=jnp.bfloat16)),
        ]:
            run(adj, deg, f"{gname} {label}", **extra)


if __name__ == "__main__":
    main()
