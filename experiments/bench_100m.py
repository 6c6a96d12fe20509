"""100M-vertex single-chip tier — 100x the reference's ivf_pq threshold.

Geometry budget (one 16 GiB v5e chip, binfold segmented kernel):
- E = 100M ring + 15M chords ~= 115M edges; the fused ref-slot space
  (~2E + bucket pads) must stay under MAX_REFS_SEGMENTED = 2^28 ~= 268M,
  so chords are kept sparse (slots ~232M measured at build time).
- positions (100M, 3) f32 = 1.2 GB; table + ref maps ~2 GB; per-step
  gathered rows + midpoint refs ~5 GB — donated buffers keep two copies
  from ever being live.

Timing discipline per CLAUDE.md: single-step dispatches (the 50-step
fori program's loop-invariant remat copies OOM at this scale, same as
the 30M tier), fresh args per dispatch, 2-row sync.

Usage:
    python experiments/bench_100m.py --build-graph   # host cache only
    python experiments/bench_100m.py                 # full TPU run
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402

import numpy as np
import scipy.sparse as sp

N = 100_000_000
CHORDS = 15_000_000
CACHE = "/root/repo/experiments/data/graph_100m.npz"


def build_adj():
    if os.path.exists(CACHE):
        t0 = time.perf_counter()
        a = sp.load_npz(CACHE)
        print(f"graph load: {time.perf_counter()-t0:.1f}s", flush=True)
        return a
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    ring = np.column_stack([
        np.arange(N, dtype=np.int64),
        (np.arange(N, dtype=np.int64) + 1) % N,
    ])
    chords = rng.integers(0, N, (CHORDS, 2), dtype=np.int64)
    chords = chords[chords[:, 0] != chords[:, 1]]
    e = np.concatenate([ring, chords])
    del ring, chords
    i = np.minimum(e[:, 0], e[:, 1])
    j = np.maximum(e[:, 0], e[:, 1])
    del e
    a = sp.coo_matrix(
        (np.ones(len(i), np.float32), (i, j)), shape=(N, N)
    ).tocsr()
    del i, j
    a.data[:] = 1
    a = a + a.T
    print(f"graph build: {time.perf_counter()-t0:.1f}s nnz={a.nnz}",
          flush=True)
    t0 = time.perf_counter()
    sp.save_npz(CACHE, a, compressed=False)
    print(f"graph cache write: {time.perf_counter()-t0:.1f}s", flush=True)
    return a


def main():
    adj = build_adj()
    if "--build-graph" in sys.argv:
        return
    import graphem_rapids_tpu as gr

    t0 = time.perf_counter()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random",
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512,
    )
    E = emb.n_edges
    print(f"init: {time.perf_counter()-t0:.1f}s  n={emb.n} E={E} "
          f"strategy={emb._resolved_strategy()} "
          f"fused={emb._fused_refs_active}", flush=True)

    pos, key = emb._positions, emb._key
    iters = int(os.environ.get("BENCH100M_ITERS", "50"))

    def block(pos, key):
        for _ in range(iters):
            pos, key = emb._step(pos, key, emb._step_ops)
        np.asarray(pos[:2])
        return pos, key

    t0 = time.perf_counter()
    pos, key = block(pos, key)
    print(f"first {iters}-iter block (incl. compile): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(int(os.environ.get("BENCH100M_REPS", "2"))):
        t0 = time.perf_counter()
        pos, key = block(pos, key)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(pos[:1000])).all()
    print(f"warm {iters} iters: {best:.2f}s -> "
          f"{E*iters/best/1e6:.2f}M edges/s "
          f"({best/iters*1e3:.1f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
