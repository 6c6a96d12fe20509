"""1M-vertex single-chip measurement (BASELINE.md tier).

Ring + random chords, n=1e6, E≈4e6, d=3, random init, 50 warm iterations
in one fused block. First compile can take ~10 min on this toolchain
(persistent cache makes later processes warm).
"""

import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import numpy as np
import scipy.sparse as sp

N = 1_000_000
CHORDS = 3_000_000


def build_adj():
    rng = np.random.default_rng(0)
    ring = np.column_stack([np.arange(N), (np.arange(N) + 1) % N])
    chords = rng.integers(0, N, (CHORDS, 2))
    chords = chords[chords[:, 0] != chords[:, 1]]
    e = np.concatenate([ring, chords])
    i, j = np.minimum(e[:, 0], e[:, 1]), np.maximum(e[:, 0], e[:, 1])
    a = sp.coo_matrix((np.ones(len(e)), (i, j)), shape=(N, N)).tocsr()
    a.data[:] = 1
    return a + a.T


def main():
    import graphem_rapids_tpu as gr

    adj = build_adj()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random",
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512,
    )
    E = emb.n_edges
    print(f"n={emb.n} E={E} strategy={emb._resolved_strategy()} "
          f"fused={emb._fused_refs_active}", flush=True)

    t0 = time.perf_counter()
    emb.run_layout(num_iterations=50, block_size=50)
    print(f"first (compile+run) 50 iters: {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    emb.run_layout(num_iterations=50, block_size=50)
    dt = time.perf_counter() - t0
    assert np.isfinite(emb.positions).all()
    print(f"warm 50 iters: {dt:.2f}s -> {E*50/dt/1e6:.2f}M edges/s "
          f"({dt/50*1e3:.1f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
