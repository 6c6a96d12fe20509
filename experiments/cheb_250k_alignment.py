"""Chebyshev-vs-eigsh subspace alignment at 250K (VERDICT r1 #5 gate >=0.99)."""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import numpy as np
import scipy.sparse as sp

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.ops import laplacian as lap

N, K = 250_000, 3
rng = np.random.default_rng(0)
ring = np.column_stack([np.arange(N), (np.arange(N) + 1) % N])
chords = rng.integers(0, N, (3 * N, 2))
chords = chords[chords[:, 0] != chords[:, 1]]
e = np.concatenate([ring, chords])
adj = sp.coo_matrix(
    (np.ones(len(e), np.float32), (e[:, 0], e[:, 1])), shape=(N, N)
).tocsr()
adj = ((adj + adj.T) > 0).astype(np.float32).tocsr()

t0 = time.perf_counter()
X = lap._spectral_chebyshev(adj, K, seed=0)
t_dev = time.perf_counter() - t0
print(f"chebyshev (device): {t_dev:.1f}s", flush=True)

t0 = time.perf_counter()
L = lap._normalized_laplacian(adj)
Xs = lap._spectral_scipy(L, K, seed=0)
t_host = time.perf_counter() - t0
print(f"eigsh (host): {t_host:.1f}s", flush=True)

# principal-angle subspace alignment
Q1, _ = np.linalg.qr(X)
Q2, _ = np.linalg.qr(Xs)
svals = np.linalg.svd(Q1.T @ Q2, compute_uv=False)
print(f"alignment (min principal cosine): {svals.min():.4f}")
assert svals.min() >= 0.99, svals
print("OK")
