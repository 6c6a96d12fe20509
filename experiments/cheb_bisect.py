"""Bisect the 1M Chebyshev run: trace vs compile vs execute.

cheb_profile.py showed 15 fused matvecs = 2.2 s and QR/RR negligible, so
the scanned 8-round run 'should' execute in ~20 s — but the measured call
took 279 s. This script separates aot trace/lower/compile from pure
execution, and A/Bs scan vs unrolled-python outers.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench_1m import build_adj


def main():
    import scipy.sparse as sp

    from graphem_rapids_tpu.ops import laplacian as lap

    adj = build_adj()
    n = adj.shape[0]
    k = 3
    s = 8
    degree = 14
    n_outer = 8

    A = sp.csr_matrix(adj + adj.transpose())
    A.data = np.ones_like(A.data)
    A.setdiag(0)
    A.eliminate_zeros()
    plan = lap._adjacency_matvec_plan(A)
    deg = plan["deg"]
    dinv = jnp.where(deg > 0, deg ** -0.5, 0.0).astype(jnp.float32)
    sqrt_deg = jnp.sqrt(deg).astype(jnp.float32)
    v0 = sqrt_deg / (jnp.linalg.norm(sqrt_deg) + 1e-30)
    table, pad_count = plan["table"], plan["pad_count"]

    def lap_mm(X):
        Y = dinv[:, None] * X
        AY = Y[table].sum(axis=1) - pad_count[:, None] * Y
        return X - dinv[:, None] * AY

    def deflate(X):
        return X - v0[:, None] * (v0 @ X)

    def cheb_filter(X, a):
        e = (2.0 + a) / 2.0
        c = (2.0 - a) / 2.0
        Y_prev = X
        Y = (lap_mm(X) - e * X) / c
        for _ in range(degree - 1):
            Y_next = (2.0 / c) * (lap_mm(Y) - e * Y) - Y_prev
            Y_prev, Y = Y, Y_next
        return Y

    def outer(carry, _):
        X, a = carry
        X = cheb_filter(X, a)
        X = deflate(X)
        X, _ = jnp.linalg.qr(X)
        LX = lap_mm(X)
        H = X.T @ LX
        ritz, W = jnp.linalg.eigh((H + H.T) / 2.0)
        X = X @ W
        a = jnp.clip(ritz[k], 0.05, 1.9)
        return (X, a), ritz

    def run_scan(X0):
        (X, _), hist = jax.lax.scan(
            outer, (X0, jnp.float32(0.5)), None, length=n_outer
        )
        return X, hist[-1]

    X0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, s)).astype(np.float32)
    )

    t0 = time.perf_counter()
    lowered = jax.jit(run_scan).lower(X0)
    print(f"trace+lower: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        out = compiled(X0)
        jax.block_until_ready(out)
        print(f"execute[{rep}]: {time.perf_counter()-t0:.1f}s", flush=True)

    # unrolled python outers (each outer its own jit) for comparison
    outer_j = jax.jit(lambda X, a: outer((X, a), None)[0])
    Xw, aw = outer_j(X0, jnp.float32(0.5))
    jax.block_until_ready(Xw)
    t0 = time.perf_counter()
    X, a = X0, jnp.float32(0.5)
    for _ in range(n_outer):
        X, a = outer_j(X, a)
    jax.block_until_ready(X)
    print(f"unrolled 8 outers (warm): {time.perf_counter()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    import os
    import sys

    os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
