"""30M-vertex single-chip tier — 3x the 10M headline, one v5e chip.

Ring + random chords at ~3.2 avg degree keeps the fused ref-slot space
under binfold's segmented bound (MAX_REFS_SEGMENTED = 2^27). Timing
discipline per CLAUDE.md: fused 50-iter blocks, fresh args per
dispatch, 2-row sync.
"""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import numpy as np
import scipy.sparse as sp

N = 30_000_000
CHORDS = 66_000_000
CACHE = "/root/repo/experiments/data/graph_30m.npz"


def build_adj():
    import os

    if os.path.exists(CACHE):
        t0 = time.perf_counter()
        a = sp.load_npz(CACHE)
        print(f"graph load: {time.perf_counter()-t0:.1f}s", flush=True)
        return a
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
    sp.save_npz(CACHE, a)
    return a


def main():
    import graphem_rapids_tpu as gr

    t0 = time.perf_counter()
    adj = build_adj()
    print(f"graph ready: {time.perf_counter()-t0:.1f}s nnz={adj.nnz}",
          flush=True)

    t0 = time.perf_counter()
    import os

    # default now matches the production default (binned): the r3 run
    # accidentally measured the flat config at 2x the step time
    binned = os.environ.get("BENCH30M_BINNED", "1") == "1"
    strat = os.environ.get("BENCH30M_STRATEGY", "auto")
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random",
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512, binned_table=binned, knn_strategy=strat,
    )
    E = emb.n_edges
    print(f"init: {time.perf_counter()-t0:.1f}s  n={emb.n} E={E} "
          f"strategy={emb._resolved_strategy()} "
          f"fused={emb._fused_refs_active}", flush=True)

    pos, key = emb._positions, emb._key

    import os

    steps_per_dispatch = int(os.environ.get("BENCH30M_BLOCK", "1"))

    def block(pos, key):
        # at ~seconds/iter the ~26 ms dispatch overhead is noise; single-
        # step dispatches sidestep XLA's loop-invariant compress/remat
        # pass, whose uncompressed lane-padded table copies OOM the
        # 50-step fori program at this scale (see round-2 logs)
        if steps_per_dispatch == 0:  # loop-free: one jit per step
            for _ in range(50):
                pos, key = emb._step(pos, key, emb._step_ops)
        else:
            for _ in range(50 // steps_per_dispatch):
                pos, key = emb._multi_step(pos, key, emb._step_ops,
                                           num_steps=steps_per_dispatch)
        np.asarray(pos[:2])
        return pos, key

    t0 = time.perf_counter()
    pos, key = block(pos, key)
    print(f"first 50-iter block (incl. compile): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        pos, key = block(pos, key)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(pos[:1000])).all()
    print(f"warm 50 iters: {best:.2f}s -> {E*50/best/1e6:.2f}M edges/s "
          f"({best/50*1e3:.1f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
