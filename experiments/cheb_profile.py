"""Attribute the 1M Chebyshev init wall time: matvecs vs QR vs RR.

Each candidate is timed as a fused multi-iteration jit block (per-dispatch
tunnel latency ~26 ms — BASELINE.md) on the bench_1m graph.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench_1m import build_adj


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import scipy.sparse as sp

    from graphem_rapids_tpu.ops import laplacian as lap

    adj = build_adj()
    n = adj.shape[0]
    s = 8

    A = sp.csr_matrix(adj + adj.transpose())
    A.data = np.ones_like(A.data)
    A.setdiag(0)
    A.eliminate_zeros()
    t0 = time.perf_counter()
    plan = lap._adjacency_matvec_plan(A)
    print(f"plan build (host): {time.perf_counter()-t0:.1f}s", flush=True)
    print(f"table shape {plan['table'].shape}, overflow "
          f"{plan['overflow'].shape}", flush=True)

    deg = plan["deg"]
    dinv = jnp.where(deg > 0, deg ** -0.5, 0.0).astype(jnp.float32)
    table, pad_count, overflow = (
        plan["table"], plan["pad_count"], plan["overflow"]
    )
    has_overflow = overflow.shape[0] > 0

    def lap_mm(X):
        Y = dinv[:, None] * X
        AY = Y[table].sum(axis=1) - pad_count[:, None] * Y
        if has_overflow:
            AY = AY + jax.ops.segment_sum(
                Y[overflow[:, 1]], overflow[:, 0], num_segments=n
            )
        return X - dinv[:, None] * AY

    X = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, s)).astype(np.float32)
    )

    @jax.jit
    def mm15(X):
        def body(_, X):
            return lap_mm(X)
        return jax.lax.fori_loop(0, 15, body, X)

    t = timed(mm15, X)
    print(f"15 fused matvecs: {t:.2f}s ({t/15*1e3:.0f} ms each)", flush=True)

    @jax.jit
    def qr1(X):
        Q, _ = jnp.linalg.qr(X)
        return Q

    t = timed(qr1, X)
    print(f"one tall-skinny QR: {t:.2f}s", flush=True)

    @jax.jit
    def cholqr2(X):
        # CholeskyQR2: two rounds of X <- X @ chol(X^T X)^-T
        for _ in range(2):
            G = X.T @ X
            R = jnp.linalg.cholesky(G + 1e-12 * jnp.eye(s))
            X = jax.lax.linalg.triangular_solve(
                R, X, left_side=False, lower=True, transpose_a=True
            )
        return X

    t = timed(cholqr2, X)
    print(f"one CholeskyQR2: {t:.2f}s", flush=True)
    Q = np.asarray(cholqr2(X))
    print(f"  orthonormality err: "
          f"{np.abs(Q.T @ Q - np.eye(s)).max():.2e}", flush=True)

    @jax.jit
    def rr(X):
        LX = lap_mm(X)
        H = X.T @ LX
        ritz, W = jnp.linalg.eigh((H + H.T) / 2.0)
        return X @ W, ritz

    t = timed(rr, X)
    print(f"one Rayleigh-Ritz (matvec+eigh+rotate): {t:.2f}s", flush=True)


if __name__ == "__main__":
    import os
    import sys

    os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
