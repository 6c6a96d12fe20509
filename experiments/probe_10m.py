"""Bisect the 10M-vertex TPU fault: one step at a time, per-phase probes.

Caches the built adjacency in experiments/data/ (gitignored) so iterate
cycles skip the 3-minute scipy build.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np
import scipy.sparse as sp

N = 10_000_000
CHORDS = 25_000_000
CACHE = "/root/repo/experiments/data/graph_10m.npz"


def build_adj():
    if os.path.exists(CACHE):
        t0 = time.perf_counter()
        a = sp.load_npz(CACHE)
        print(f"graph load: {time.perf_counter()-t0:.1f}s", flush=True)
        return a
    rng = np.random.default_rng(0)
    ring = np.column_stack(
        [np.arange(N, dtype=np.int64), (np.arange(N, dtype=np.int64) + 1) % N]
    )
    chords = rng.integers(0, N, (CHORDS, 2), dtype=np.int64)
    chords = chords[chords[:, 0] != chords[:, 1]]
    e = np.concatenate([ring, chords])
    i = np.minimum(e[:, 0], e[:, 1])
    j = np.maximum(e[:, 0], e[:, 1])
    del e, chords, ring
    a = sp.coo_matrix(
        (np.ones(len(i), np.float32), (i, j)), shape=(N, N)
    ).tocsr()
    a.data[:] = 1
    a = a + a.T
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    sp.save_npz(CACHE, a)
    return a


def main():
    import jax

    import graphem_rapids_tpu as gr

    t0 = time.perf_counter()
    adj = build_adj()
    print(f"graph ready: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random",
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512,
    )
    print(f"init: {time.perf_counter()-t0:.1f}s  E={emb.n_edges} "
          f"strategy={emb._resolved_strategy()} "
          f"fused={emb._fused_refs_active}", flush=True)
    dev = jax.devices()[0]

    def hbm():
        ms = dev.memory_stats()
        if not ms:
            return "n/a"
        return (f"{ms['bytes_in_use']/2**30:.2f} GiB "
                f"peak {ms.get('peak_bytes_in_use', 0)/2**30:.2f} GiB")

    print(f"HBM after init: {hbm()}", flush=True)

    for it in range(3):
        t0 = time.perf_counter()
        emb.update_positions()
        np.asarray(emb.positions[:4])  # force sync
        print(f"step {it}: {time.perf_counter()-t0:.1f}s  HBM {hbm()}",
              flush=True)
    assert np.isfinite(emb.positions).all()
    print("3 single steps OK", flush=True)

    t0 = time.perf_counter()
    emb.run_layout(num_iterations=10, block_size=10)
    print(f"10-iter fused block: {time.perf_counter()-t0:.1f}s", flush=True)
    assert np.isfinite(emb.positions).all()
    print("PROBE PASS", flush=True)


if __name__ == "__main__":
    main()
