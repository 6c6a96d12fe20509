"""A/B fused-midpoints x kNN-dtype x recall-target at the 100K bench tier.

Times full 50-iteration runs in 10-step fused blocks (the bench config),
then measures actual kNN recall of each approx variant against exact
neighbors on midpoints from a partially converged layout.
"""

import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import jax
import jax.numpy as jnp
import numpy as np

N, DEG, D, S, K = 100_000, 8, 3, 512, 16


def main():
    import networkx as nx
    import scipy.sparse as sp

    import graphem_rapids_tpu as gr
    from graphem_rapids_tpu.ops.knn import _oneshot_approx, knn_chunked

    G = nx.random_regular_graph(DEG, N, seed=0)
    adj = sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))

    kw = dict(n_components=D, seed=0, verbose=False, L_min=10.0,
              k_attr=0.5, k_inter=0.1, n_neighbors=15, sample_size=512)

    variants = [
        ("fused=F f32 r.95", dict(fused_midpoints=False)),
        ("fused=F bf16 r.95", dict(fused_midpoints=False,
                                   knn_compute_dtype=jnp.bfloat16)),
        ("fused=T bf16 r.95", dict(fused_midpoints=True,
                                   knn_compute_dtype=jnp.bfloat16)),
        ("fused=T bf16 r.85", dict(fused_midpoints=True,
                                   knn_compute_dtype=jnp.bfloat16,
                                   knn_recall_target=0.85)),
        ("fused=F bf16 r.85", dict(fused_midpoints=False,
                                   knn_compute_dtype=jnp.bfloat16,
                                   knn_recall_target=0.85)),
    ]
    for label, extra in variants:
        emb = gr.GraphEmbedderTPU(adj, **kw, **extra)
        emb.run_layout(10, block_size=10)
        t0 = time.perf_counter()
        emb.run_layout(50, block_size=10)
        dt = time.perf_counter() - t0
        print(f"step {label:22s} {dt/50*1e3:8.3f} ms/iter")

    # ---- recall on real (20-iter) layout midpoints
    emb = gr.GraphEmbedderTPU(adj, **kw)
    emb.run_layout(20, block_size=10)
    p = jnp.asarray(emb.positions)
    edges = emb.edges
    mid = (p[edges[:, 0]] + p[edges[:, 1]]) * 0.5
    rng = np.random.default_rng(0)
    sampled = jnp.asarray(rng.permutation(emb.n_edges)[:S].astype(np.int32))
    q = mid[sampled]

    exact_idx, _ = knn_chunked(q, mid, K + 1)
    exact_sets = [set(r) for r in np.asarray(exact_idx)]

    for label, dtype, rt in [
        ("f32  r.95", None, 0.95),
        ("bf16 r.95", jnp.bfloat16, 0.95),
        ("bf16 r.85", jnp.bfloat16, 0.85),
        ("f32  r.85", None, 0.85),
    ]:
        idx, _ = _oneshot_approx(q, mid, K + 1, compute_dtype=dtype,
                                 recall_target=rt)
        got = np.asarray(idx)
        rec = np.mean([
            len(exact_sets[i] & set(got[i])) / (K + 1)
            for i in range(S)
        ])
        print(f"recall {label:12s} {rec:.4f}")


if __name__ == "__main__":
    main()
