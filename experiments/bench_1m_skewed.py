"""1M-vertex skewed-degree (heavy-tail) measurement on the real TPU.

Exercises the paths the ring+chords bench (bench_1m.py) never hits at
scale: ref-cap prefix packing with a non-uniform i<j degree histogram,
the neighbor-table overflow spill for hub vertices, and the 'chebyshev'
spectral-init auto tier (n >= 500K). Degrees follow a Zipf-ish tail
(hubs with thousands of neighbors) — the regime where the reference
would lean on cuVS ivf indices.
"""

import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import numpy as np
import scipy.sparse as sp

N = 1_000_000
CHORDS = 3_000_000
ZIPF_A = 1.6


def build_adj():
    rng = np.random.default_rng(0)
    ring = np.column_stack([np.arange(N), (np.arange(N) + 1) % N])
    # heavy-tailed endpoint selection: map zipf ranks onto vertex ids so
    # low ids become hubs (max degree ~ tens of thousands)
    za = np.minimum(rng.zipf(ZIPF_A, CHORDS), N) - 1
    zb = rng.integers(0, N, CHORDS)
    chords = np.column_stack([za, zb])
    chords = chords[chords[:, 0] != chords[:, 1]]
    e = np.concatenate([ring, chords])
    i, j = np.minimum(e[:, 0], e[:, 1]), np.maximum(e[:, 0], e[:, 1])
    a = sp.coo_matrix(
        (np.ones(len(e)), (i, j)), shape=(N, N)
    ).tocsr()
    a.data[:] = 1
    return a + a.T


def main():
    import graphem_rapids_tpu as gr

    t0 = time.perf_counter()
    adj = build_adj()
    deg = np.asarray(adj.sum(axis=1)).ravel()
    print(f"graph build: {time.perf_counter()-t0:.1f}s  "
          f"deg mean={deg.mean():.1f} max={int(deg.max())} "
          f"p99={int(np.percentile(deg, 99))}", flush=True)

    t0 = time.perf_counter()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False,
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512,
    )
    E = emb.n_edges
    print(f"init (incl. spectral): {time.perf_counter()-t0:.1f}s  "
          f"n={emb.n} E={E} strategy={emb._resolved_strategy()} "
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

    # radial-vs-degree sanity: hubs should sit far from the origin
    from scipy.stats import spearmanr

    radii = np.linalg.norm(emb.positions, axis=1)
    rho = spearmanr(radii, deg).statistic
    print(f"spearman(radius, degree) = {rho:.3f}", flush=True)


if __name__ == "__main__":
    import os

    os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
    main()
