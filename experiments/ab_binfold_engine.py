"""A/B: engine step with binfold kernel vs one-shot approx, 100K tier.

In-process comparison (bench variance across processes is ~±10%,
docs/ROADMAP.md); 50-iteration runs in fused blocks so tunnel latency
amortizes. Also verifies the auto rule resolves to binfold on TPU and
compares layout quality (Spearman radius-degree correlation) per variant.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N, DEG, D = 100_000, 8, 3
KW = dict(n_components=D, seed=0, verbose=False, L_min=10.0,
          k_attr=0.5, k_inter=0.1, n_neighbors=15, sample_size=512)


def block_time(label, run, iters=50):
    run(10)  # warm/compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(iters)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best/iters*1e3:8.3f} ms/iter "
          f"({N*DEG/2*iters/best/1e6:6.1f}M edges/s)", flush=True)


def main():
    import networkx as nx
    import scipy.sparse as sp
    from scipy.stats import spearmanr

    import graphem_rapids_tpu as gr

    G = nx.random_regular_graph(DEG, N, seed=0)
    adj = sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))

    for strategy in ("approx", "binfold", "auto"):
        emb = gr.GraphEmbedderTPU(adj, knn_strategy=strategy, **KW)
        resolved = emb._resolved_strategy()
        block_time(
            f"step strategy={strategy} (resolved={resolved}, "
            f"fused={emb._fused_refs_active})",
            lambda n, e=emb: e.run_layout(n, block_size=n),
        )

    # quality check: ER graph (degree varies) radius-degree correlation
    Gq = nx.erdos_renyi_graph(20_000, 16 / 20_000, seed=1)
    adjq = sp.csr_matrix(nx.adjacency_matrix(Gq, dtype=int))
    deg = np.asarray(adjq.sum(axis=1)).ravel()
    for strategy in ("approx", "binfold"):
        emb = gr.GraphEmbedderTPU(adjq, knn_strategy=strategy, **KW)
        pos = emb.run_layout(30, block_size=30)
        radii = np.linalg.norm(pos, axis=1)
        rho = spearmanr(radii, deg).statistic
        print(f"quality strategy={strategy}: rho(radius, degree)={rho:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
