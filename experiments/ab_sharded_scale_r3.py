"""Round-3 A/B: sharded tier vs single chip at the gather-bound scale.

VERDICT r2 #1: the sharded tier's declared reason to exist is the HBM
gather floor at 1M-10M vertices (docs/ROADMAP.md), but the 1-device
TPU-mesh A/B had only ever run at 100K (6 ms steps). This runs the
PRODUCTION sharded program (binned bucket-row-sharded tables + fused
slot-midpoint refs + binfold local top-k) against the single-chip auto
engine at 1M and 10M vertices, same ring+chords workloads as
experiments/bench_1m.py / bench_10m.py.

Usage: python experiments/ab_sharded_scale_r3.py 1m|10m [--variants]

Timing discipline (CLAUDE.md / memory): positions feed back between
blocks (fresh args per dispatch), sync on a 2-row device slice, best of
3 warm 50-iter blocks. step/multi_step donate positions+key, so the
feedback pattern is also the donation-correct one.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np

ITERS = 50
FORCE = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
             sample_size=512)


def time_engine(name, emb, E, blocks=3):
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
    for _ in range(blocks):
        t0 = time.perf_counter()
        pos, key = block(pos, key)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(pos[:100])).all()
    # keep the engine consistent for any later use
    emb._positions, emb._key = pos, key
    print(f"{name:40s} {best/ITERS*1e3:8.2f} ms/iter "
          f"({E*ITERS/best/1e6:7.1f}M edges/s)", flush=True)
    return best / ITERS


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "1m"
    import graphem_rapids_tpu as gr
    from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh

    if tier == "1m":
        from experiments.bench_1m import build_adj

        adj = build_adj()
    else:
        from experiments.probe_10m import build_adj as build_adj_cached

        adj = build_adj_cached()
    E = adj.nnz // 2
    n = adj.shape[0]
    print(f"tier={tier} n={n} E={E}", flush=True)
    mesh = make_mesh(1)

    t0 = time.perf_counter()
    single = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random", **FORCE,
    )
    print(f"single init {time.perf_counter()-t0:.1f}s "
          f"strategy={single._resolved_strategy()} "
          f"fused={single._fused_refs_active}", flush=True)
    t_single = time_engine("single-chip (auto)", single, E)
    del single

    variants = [
        ("sharded binned fused binfold",
         dict(fused_midpoints=True, binned_table=True,
              use_binfold_local=True)),
    ]
    if "--variants" in sys.argv:
        variants += [
            ("sharded flat fused binfold",
             dict(fused_midpoints=True, binned_table=False,
                  use_binfold_local=True)),
            ("sharded binned fused binfold ring",
             dict(fused_midpoints=True, binned_table=True,
                  use_binfold_local=True, knn_comm="ring")),
        ]
    for name, kw in variants:
        t0 = time.perf_counter()
        emb = ShardedGraphEmbedder(
            adj, n_components=3, mesh=mesh, seed=0, verbose=False,
            init="random", **FORCE, **kw,
        )
        print(f"  [{name}: init {time.perf_counter()-t0:.1f}s]", flush=True)
        t_sh = time_engine(name, emb, E)
        print(f"  gap vs single-chip: {t_sh/t_single:.3f}x", flush=True)
        del emb


if __name__ == "__main__":
    main()
