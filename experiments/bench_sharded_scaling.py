"""Weak-scaling measurement for the sharded tier (BASELINE target: >=80%
efficiency at 2 hosts).

Weak scaling: per-chip problem size is FIXED (n_per_chip vertices,
deg-regular edges), mesh grows — ideal wall-clock stays flat and
efficiency(P) = t(1) / t(P). Runs every power-of-two mesh size up to
jax.device_count().

On the current axon environment only one real chip exists; run with a
virtual CPU mesh to validate the harness
(`python experiments/bench_sharded_scaling.py --platform cpu --devices 8`)
— those timings validate the program, not TPU scaling. On a pod slice,
run without flags.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")


def run(n_per_chip, deg, iters, platform, max_devices):
    if platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import networkx as nx
    import numpy as np
    import scipy.sparse as sp

    import graphem_rapids_tpu as gr  # noqa: F401  (registers strategies)
    from graphem_rapids_tpu.parallel import make_mesh
    from graphem_rapids_tpu.parallel.sharded_embedder import (
        ShardedGraphEmbedder,
    )

    ndev_all = jax.device_count()
    sizes = [p for p in (1, 2, 4, 8, 16, 32) if p <= min(ndev_all,
                                                         max_devices)]
    results = []
    for P in sizes:
        n = n_per_chip * P
        G = nx.random_regular_graph(deg, n, seed=0)
        adj = sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))
        E = adj.nnz // 2
        emb = ShardedGraphEmbedder(
            adj, n_components=3, mesh=make_mesh(P), seed=0, verbose=False,
            sample_size=512, n_neighbors=15, init="random",
            L_min=10.0, k_attr=0.5, k_inter=0.1,
        )
        # warm (compile) then best-of-3 fused blocks, device-synced
        def block():
            emb._positions, emb._key = emb._multi_step(
                emb._positions, emb._key, emb._step_ops, num_steps=iters
            )
            np.asarray(emb._positions[:2])

        block()
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            block()
            dt = min(dt, time.perf_counter() - t0)
        assert np.isfinite(np.asarray(emb._positions[:64])).all()
        eff = results[0][2] / dt if results else 1.0
        results.append((P, E, dt, eff))
        print(
            f"P={P:2d}  n={n:>9,}  E={E:>10,}  {dt:7.3f}s/{iters} iters  "
            f"{E * iters / dt / 1e6:8.2f}M edges/s  weak-eff {eff:5.1%}",
            flush=True,
        )
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-per-chip", type=int, default=250_000)
    ap.add_argument("--deg", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=32,
                    help="cap on mesh size (and virtual CPU device count)")
    args = ap.parse_args()
    run(args.n_per_chip, args.deg, args.iters, args.platform, args.devices)


if __name__ == "__main__":
    main()
