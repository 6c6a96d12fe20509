"""Round-2 A/B: sharded-tier variants on the 1-device TPU mesh.

Goal (VERDICT r1 #2): close the sharded-vs-single-chip 1-device gap
(9.2 vs 7.7 ms/iter in round 1) and pick the mesh-tier defaults
(fused midpoints / binned table / ring vs all_gather merge).

Timing discipline (CLAUDE.md): positions feed back between blocks so
every dispatch has fresh args, and each block is synced by fetching two
rows of the result before the clock stops.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np

N, DEG, D, ITERS = 100_000, 8, 3, 50
FORCE = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
             sample_size=512)


def time_engine(name, emb, E):
    pos, key = emb._positions, emb._key

    def block(pos, key):
        pos, key = emb._multi_step(pos, key, emb._step_ops,
                                   num_steps=ITERS)
        np.asarray(pos[:2])  # sync: fetch real result bytes
        return pos, key

    t0 = time.perf_counter()
    pos, key = block(pos, key)  # compile + first run
    print(f"  [{name}: first block {time.perf_counter()-t0:.1f}s]",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pos, key = block(pos, key)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(pos[:100])).all()
    print(f"{name:44s} {best/ITERS*1e3:8.2f} ms/iter "
          f"({E*ITERS/best/1e6:6.1f}M edges/s)", flush=True)
    return best / ITERS


def main():
    import graphem_rapids_tpu as gr
    from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh

    adj = gr.generate_random_regular(n=N, d=DEG, seed=0)
    E = adj.nnz // 2
    mesh = make_mesh(1)

    single = gr.GraphEmbedderTPU(
        adj, n_components=D, seed=0, verbose=False, **FORCE,
    )
    time_engine("single-chip (auto default)", single, E)
    del single

    variants = [
        ("sharded flat unfused all_gather",
         dict(fused_midpoints=False, binned_table=False)),
        ("sharded flat fused all_gather",
         dict(fused_midpoints=True, binned_table=False)),
        ("sharded binned fused all_gather",
         dict(fused_midpoints=True, binned_table=True)),
        ("sharded flat fused ring",
         dict(fused_midpoints=True, binned_table=False, knn_comm="ring")),
        ("sharded binned fused ring",
         dict(fused_midpoints=True, binned_table=True, knn_comm="ring")),
        ("sharded flat unfused binfold",
         dict(fused_midpoints=False, binned_table=False,
              use_binfold_local=True)),
        ("sharded flat fused binfold",
         dict(fused_midpoints=True, binned_table=False,
              use_binfold_local=True)),
        ("sharded binned fused binfold",
         dict(fused_midpoints=True, binned_table=True,
              use_binfold_local=True)),
        ("sharded binned fused binfold ring",
         dict(fused_midpoints=True, binned_table=True,
              use_binfold_local=True, knn_comm="ring")),
    ]
    for name, kw in variants:
        emb = ShardedGraphEmbedder(
            adj, n_components=D, mesh=mesh, seed=0, verbose=False,
            **FORCE, **kw,
        )
        time_engine(name, emb, E)
        del emb


if __name__ == "__main__":
    main()
