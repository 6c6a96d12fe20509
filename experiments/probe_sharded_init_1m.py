"""Attribute the sharded-tier init overhead vs single-chip (round 3).

BASELINE.md round-3: at 10M vertices init was 122.3s single vs 193.7s
sharded. This probe phases the 1M init on the CPU backend (host work is
platform-independent; device transfers here are in-process memcpy, so
any remaining gap is HOST-side shard padding, not the tunnel).

Run: python experiments/probe_sharded_init_1m.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp


def build_adj(n=1_000_000, chords=3_000_000, seed=0):
    rng = np.random.default_rng(seed)
    ring = np.column_stack([
        np.arange(n, dtype=np.int64),
        (np.arange(n, dtype=np.int64) + 1) % n,
    ])
    ch = rng.integers(0, n, (chords, 2), dtype=np.int64)
    ch = ch[ch[:, 0] != ch[:, 1]]
    e = np.concatenate([ring, ch])
    i = np.minimum(e[:, 0], e[:, 1])
    j = np.maximum(e[:, 0], e[:, 1])
    a = sp.coo_matrix((np.ones(len(i), np.float32), (i, j)),
                      shape=(n, n)).tocsr()
    a.data[:] = 1
    return a + a.T


def main():
    import graphem_rapids_tpu as gr
    from graphem_rapids_tpu.parallel import ShardedGraphEmbedder

    t0 = time.perf_counter()
    adj = build_adj()
    print(f"graph: {time.perf_counter()-t0:.1f}s nnz={adj.nnz}", flush=True)

    t0 = time.perf_counter()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, init="random", sample_size=512,
        n_neighbors=15,
    )
    t_single = time.perf_counter() - t0
    print(f"single-chip init: {t_single:.1f}s "
          f"(strategy={emb._resolved_strategy()})", flush=True)
    del emb

    t0 = time.perf_counter()
    semb = ShardedGraphEmbedder(
        adj, n_components=3, seed=0, init="random", sample_size=512,
        n_neighbors=15,
    )
    t_shard = time.perf_counter() - t0
    print(f"sharded init:     {t_shard:.1f}s "
          f"(mesh={dict(semb.mesh.shape)})", flush=True)
    print(f"gap: {t_shard - t_single:.1f}s ({t_shard / t_single:.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
