"""A/B: exact kNN tiers on TPU — where (if anywhere) knn_pallas wins.

VERDICT r1 weak #6: knn_pallas is opt-in and 'auto' never selects it.
Measure the exact tiers (oneshot top_k, blockwise scan, pallas tiled)
across E at the bench query shape to either give it a tier or document
it as fallback-only with numbers.
"""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import numpy as np

import jax
import jax.numpy as jnp

from graphem_rapids_tpu.ops.knn import knn_exact, _knn_scanned
from graphem_rapids_tpu.ops.knn_pallas import knn_pallas
from graphem_rapids_tpu.ops.knn_binfold import knn_binfold

S, d, k = 512, 3, 16
rng = np.random.default_rng(0)


def timeit(fn, q, r):
    out = fn(q, r)  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for t in range(5):
        # vary an input per call (identical-args dispatches are ~0.2ms
        # acks over the tunnel, CLAUDE.md)
        q2 = q + np.float32(1e-6 * (t + 1))
        t0 = time.perf_counter()
        out = fn(q2, r)
        np.asarray(out[0][:2])  # fetch result bytes
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


for E in (100_000, 400_000, 1_600_000):
    q = jnp.asarray(rng.standard_normal((S, d)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((E, d)), jnp.float32)
    rows = [("oneshot top_k", lambda q_, r_: knn_exact(q_, r_, k)),
            ("scanned", lambda q_, r_: _knn_scanned(q_, r_, k, 65536, None)),
            ("pallas tiled", lambda q_, r_: knn_pallas(q_, r_, k)),
            ("binfold(approx)", lambda q_, r_: knn_binfold(q_, r_, k))]
    print(f"E={E}:", flush=True)
    for name, fn in rows:
        try:
            ms = timeit(fn, q, r)
            print(f"  {name:18s} {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"  {name:18s} failed: {str(e)[:80]}", flush=True)
