"""1-device TPU mesh A/B of the kNN merge tiers (bench workload)."""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import numpy as np

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh

N, DEG, D, ITERS = 100_000, 8, 3, 50
FORCE = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
             sample_size=512)

adj = gr.generate_random_regular(n=N, d=DEG, seed=0)
E = adj.nnz // 2


def run(name, **kw):
    emb = ShardedGraphEmbedder(adj, n_components=D, mesh=make_mesh(1),
                               seed=0, verbose=False,
                               fused_midpoints=True, **FORCE, **kw)
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
    assert np.isfinite(np.asarray(pos[:100])).all()
    print(f"{name:28s} {best/ITERS*1e3:7.2f} ms/iter "
          f"({E*ITERS/best/1e6:6.1f}M edges/s)", flush=True)


for name, kw in [("all_gather (default)", {}),
                 ("all_to_all", dict(knn_comm="all_to_all")),
                 ("ring", dict(knn_comm="ring")),
                 ("ring_pallas", dict(knn_comm="ring_pallas"))]:
    run(name, **kw)
