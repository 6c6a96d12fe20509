"""Spectral (Laplacian-eigenvector) initialization.

Mirrors reference embedder_pytorch.py:337-379 / embedder_cuvs.py:217-253:
symmetrize + binarize the adjacency, take the normalized Laplacian, compute
the (d+1) smallest eigenvectors, drop the trivial constant one, fall back to
0.1 * randn on solver failure.

Three tiers (tiered-fallback pattern, SURVEY.md §5.3):
- 'scipy'    : host ARPACK eigsh — exact parity with the reference; runs
  once at init so host execution is acceptable at small/medium n.
- 'chebyshev': Chebyshev-filtered subspace iteration on device — the
  TPU-native path for large n. The SpMV is the same dense neighbor-table
  gather + row-sum that beats scatter for spring forces (ops/forces.py);
  the known null vector D^{1/2}1 of the normalized Laplacian is deflated
  analytically, and the Chebyshev filter damps the spectral bulk [a, 2]
  so no preconditioner is needed (unpreconditioned LOBPCG measured
  non-convergent at n=250K — ROADMAP.md).
- 'lobpcg'   : jax.experimental.sparse.linalg.lobpcg_standard on the
  shifted normalized Laplacian, kept as an explicit opt-in tier.
Failures tier down: chebyshev/lobpcg -> scipy -> random.
"""

import logging

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
from scipy.sparse.csgraph import laplacian as _csgraph_laplacian

logger = logging.getLogger(__name__)


def _normalized_laplacian(adjacency):
    """Symmetrized, binarized normalized Laplacian (reference :351-359)."""
    if not sp.issparse(adjacency):
        adjacency = sp.csr_matrix(adjacency)
    A = sp.csr_matrix(adjacency + adjacency.transpose())
    A.data = np.ones_like(A.data)
    return _csgraph_laplacian(A, normed=True)


def _spectral_scipy(L, n_components, seed=None):
    k = n_components + 1
    # Deterministic ARPACK start vector: eigenvector signs (and thus the
    # embedding's reflection class) become reproducible for a given seed.
    v0 = np.random.default_rng(0 if seed is None else seed).standard_normal(
        L.shape[0]
    )
    _, eigenvectors = spla.eigsh(L, k, which="SM", v0=v0)
    return eigenvectors[:, 1:k]


def _adjacency_matvec_plan(A, cap=None):
    """Dense neighbor table + overflow COO for gather-based A @ X.

    Same trick as ops/forces.py build_neighbor_table (scatter is ~5x
    slower than a dense gather + row-sum on v5e and ~15x slower to
    compile): rows self-padded, so the matvec subtracts pad_count * x_v.
    Skewed tails beyond ``cap`` columns go to a COO overflow, folded in
    hub-aligned blocks when profitable (ops/forces.py
    build_overflow_plan — here the (hub, hub) pad rows are NOT free, so
    the per-hub block partials subtract plan['pad_count'] * x_hub) or
    through segment_sum otherwise. The cap comes from the same
    degree-histogram cost model as the spring table
    (_optimal_table_cap).
    """
    import jax.numpy as jnp

    from .forces import _optimal_table_cap, build_overflow_plan

    n = A.shape[0]
    A = A.tocsr()
    deg = np.diff(A.indptr)
    if cap is None:
        cap = _optimal_table_cap(deg, n) if n else 1
    cap = max(cap, 1)

    src = np.repeat(np.arange(n), deg)
    dst = A.indices.astype(np.int64)
    col = np.arange(len(src)) - A.indptr[src]
    in_table = col < cap
    table = np.repeat(np.arange(n, dtype=np.int32)[:, None], cap, axis=1)
    table[src[in_table], col[in_table]] = dst[in_table]
    pad_count = (cap - np.minimum(deg, cap)).astype(np.float32)
    overflow = np.column_stack([src[~in_table], dst[~in_table]]).astype(
        np.int32
    )
    ov_plan = build_overflow_plan(overflow)
    if ov_plan is not None:
        ov_plan = {
            k: (jnp.asarray(v) if k != "block" else v)
            for k, v in ov_plan.items()
        }
        overflow = np.zeros((0, 2), np.int32)
    return {
        "table": jnp.asarray(table),
        "pad_count": jnp.asarray(pad_count),
        "overflow": jnp.asarray(overflow),
        "ov_plan": ov_plan,
        "deg": jnp.asarray(deg.astype(np.float32)),
        "n": n,
    }


def _overflow_correct(AY, Y, overflow, ov_plan, n, ov_block):
    """Fold the COO/block-plan overflow tail into the gathered A @ Y."""
    import jax

    if ov_plan is not None:
        # hub overflow via the block-fold plan: dense per-block sums,
        # then a tiny scatter onto the H hub rows; (hub, hub) pad
        # rows each contributed Y[hub], removed via pad_count
        hub_ids = ov_plan["hub_ids"]
        Yo = Y[ov_plan["pairs"][:, 1]]
        blk = Yo.reshape(-1, ov_block, Yo.shape[-1]).sum(axis=1)
        hub = jax.ops.segment_sum(
            blk, ov_plan["block_hub"],
            num_segments=hub_ids.shape[0], indices_are_sorted=True,
        )
        hub = hub - ov_plan["pad_count"][:, None] * Y[hub_ids]
        return AY.at[hub_ids].add(hub)
    if overflow.shape[0] > 0:
        return AY + jax.ops.segment_sum(
            Y[overflow[:, 1]], overflow[:, 0], num_segments=n
        )
    return AY


def _cheb_iterate(lap_mm, X0, v0, *, k, degree, n_outer):
    """Chebyshev-filtered subspace iteration over an abstract L @ X.

    Shared by the single-device and mesh-sharded runners — only the SpMV
    differs (dense-table gather vs row-sharded gather + all_gather).
    """
    import jax
    import jax.numpy as jnp

    def deflate(X):
        return X - v0[:, None] * (v0 @ X)

    def cheb_filter(X, a):
        """T_degree of L mapped so [a, 2] -> [-1, 1]."""
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

    (X, _), ritz_hist = jax.lax.scan(
        outer, (X0, jnp.float32(0.5)), None, length=n_outer
    )
    return X, ritz_hist[-1]


def _cheb_run(X0, table, pad_count, dinv, v0, overflow, ov_plan=None, *,
              k, degree, n_outer, n, ov_block=0):
    """Jitted Chebyshev subspace iteration (module-level by design).

    Every array is an ARGUMENT, not a closure constant: closing over the
    (n, cap) neighbor table embedded ~92 MB of literals in the jaxpr at
    n=1M, and trace+lower alone took 452 s (compile another 120 s) while
    the actual execution was 17 s (experiments/cheb_bisect.py). As
    arguments they are ordinary device buffers, and the jit cache also
    survives across _spectral_chebyshev calls.
    """

    def lap_mm(X):
        """L @ X for (n, s) blocks; gather + row-sum, no scatter."""
        Y = dinv[:, None] * X
        AY = Y[table].sum(axis=1) - pad_count[:, None] * Y
        AY = _overflow_correct(AY, Y, overflow, ov_plan, n, ov_block)
        return X - dinv[:, None] * AY

    return _cheb_iterate(lap_mm, X0, v0, k=k, degree=degree,
                         n_outer=n_outer)


_cheb_run_jit = None


def _get_cheb_run():
    global _cheb_run_jit
    if _cheb_run_jit is None:
        import functools

        import jax

        _cheb_run_jit = functools.partial(
            jax.jit,
            static_argnames=("k", "degree", "n_outer", "n", "ov_block"),
        )(_cheb_run)
    return _cheb_run_jit


def _build_cheb_run_sharded(mesh, n, n_loc, *, k, degree, n_outer,
                            ov_block):
    """Mesh-sharded Chebyshev runner (SURVEY §7.2 M5).

    The SpMV's dense-table gather — the whole cost of the iteration — is
    row-sharded over the mesh exactly like the spring-force gather in
    parallel/sharded_step.py: each device gathers its n/ndev table rows
    against the replicated (n, s) block and one tiled all_gather
    assembles A @ X. The O(n s) elementwise work, the tiny overflow
    tail, and the (n, s) QR / (s, s) eigh stay replicated (s <= ~8).
    """
    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import EDGE_AXIS

    P = jax.sharding.PartitionSpec
    axis_name = EDGE_AXIS

    def body(X0, table_pad, pad_count_pad, own_pad, dinv, v0, overflow,
             ov_plan):
        i = jax.lax.axis_index(axis_name)
        tbl = jax.lax.dynamic_slice(
            table_pad, (i * n_loc, 0), (n_loc, table_pad.shape[1])
        )
        pc = jax.lax.dynamic_slice(pad_count_pad, (i * n_loc,), (n_loc,))
        # own row ids (pad rows point at 0; their AY rows are garbage
        # discarded by the [:n] slice) — a plain dynamic_slice of Y would
        # clamp on the tail device and mis-align its real rows
        own = jax.lax.dynamic_slice(own_pad, (i * n_loc,), (n_loc,))

        def lap_mm(X):
            Y = dinv[:, None] * X
            AY_loc = Y[tbl].sum(axis=1) - pc[:, None] * Y[own]
            AY = jax.lax.all_gather(AY_loc, axis_name, tiled=True)[:n]
            AY = _overflow_correct(AY, Y, overflow, ov_plan, n, ov_block)
            return X - dinv[:, None] * AY

        return _cheb_iterate(lap_mm, X0, v0, k=k, degree=degree,
                             n_outer=n_outer)

    shard_fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(),) * 8,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def _spectral_chebyshev(adjacency, n_components, seed, n_outer=8,
                        degree=14, guard=4, mesh=None):
    """Chebyshev-filtered subspace iteration for the low end of L.

    TPU-native large-n tier. Ingredients:
    - SpMV as dense neighbor-table gather + row-sum (same structure that
      beats segment_sum ~5x for spring forces on v5e), with COO overflow
      for skewed degree tails — no scatter on the hot path.
    - The normalized Laplacian's known null vector D^{1/2}1 is deflated
      analytically every round, so the iteration only has to resolve the
      d nontrivial low eigenvectors.
    - A degree-``degree`` Chebyshev filter damps [a, 2] (|T_m| <= 1 there)
      while growing ~cosh(m*acosh) below a — the standard
      preconditioner-free route (unpreconditioned LOBPCG measured
      non-convergent at this scale). The cutoff ``a`` adapts each outer
      round to the first guard Ritz value.
    - Rayleigh-Ritz on the filtered block orders the Ritz vectors by
      their true L-eigenvalues.

    The embedding only needs init-quality eigenvectors, not solver-grade
    tolerances; n_outer * degree ~ 100 matvecs is plenty (measured at
    n=1M: 17 s execute, subspace alignment 0.996 vs host ARPACK —
    experiments/cheb_1m.py).
    """
    import jax.numpy as jnp

    n = adjacency.shape[0]
    k = n_components
    s = k + 1 + guard  # wanted + deflation slack + guard block

    if not sp.issparse(adjacency):
        adjacency = sp.csr_matrix(adjacency)
    A = sp.csr_matrix(adjacency + adjacency.transpose())
    A.data = np.ones_like(A.data)
    A.setdiag(0)
    A.eliminate_zeros()
    plan = _adjacency_matvec_plan(A)

    deg = plan["deg"]
    dinv = jnp.where(deg > 0, deg ** -0.5, 0.0).astype(jnp.float32)
    sqrt_deg = jnp.sqrt(deg).astype(jnp.float32)
    v0 = sqrt_deg / (jnp.linalg.norm(sqrt_deg) + 1e-30)  # L v0 = 0

    rng = np.random.default_rng(0 if seed is None else seed)
    X0 = jnp.asarray(
        rng.standard_normal((n, s)).astype(np.float32)
    )
    ov_plan = plan["ov_plan"]
    ov_arrays = (
        {kk: v for kk, v in ov_plan.items() if kk != "block"}
        if ov_plan is not None else None
    )
    ov_block = ov_plan["block"] if ov_plan is not None else 0
    n_devices = (
        int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    )
    if n_devices > 1:
        # row-shard the SpMV table over the mesh (SURVEY §7.2 M5); the
        # iteration itself is identical, so the mesh result matches the
        # single-device runner to fp accumulation order
        n_loc = (n + n_devices - 1) // n_devices
        n_pad = n_loc * n_devices
        table = plan["table"]
        pad_count = plan["pad_count"]
        own = jnp.arange(n, dtype=jnp.int32)
        if n_pad != n:
            table = jnp.concatenate(
                [table, jnp.zeros((n_pad - n, table.shape[1]), jnp.int32)]
            )
            pad_count = jnp.concatenate(
                [pad_count, jnp.zeros(n_pad - n, pad_count.dtype)]
            )
            own = jnp.concatenate([own, jnp.zeros(n_pad - n, jnp.int32)])
        runner = _build_cheb_run_sharded(
            mesh, n, n_loc, k=k, degree=degree, n_outer=n_outer,
            ov_block=ov_block,
        )
        X, ritz = runner(
            X0, table, pad_count, own, dinv, v0, plan["overflow"],
            ov_arrays,
        )
    else:
        X, ritz = _get_cheb_run()(
            X0, plan["table"], plan["pad_count"], dinv, v0,
            plan["overflow"], ov_arrays, k=k, degree=degree,
            n_outer=n_outer, n=n, ov_block=ov_block,
        )
    ritz = np.asarray(ritz)
    if not np.all(np.isfinite(ritz)):
        raise RuntimeError("chebyshev subspace iteration diverged")
    # Deflation removed the trivial vector; columns are Ritz-ordered
    # ascending, so the first k are the wanted nontrivial eigenvectors.
    return np.asarray(X[:, :k])


def _spectral_lobpcg(L, n_components, seed):
    """Device-side LOBPCG on 2I - L (largest <-> smallest eigenpairs of L)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse
    from jax.experimental.sparse.linalg import lobpcg_standard

    n = L.shape[0]
    k = n_components + 1
    coo = L.tocoo()
    L_bcoo = jsparse.BCOO(
        (jnp.asarray(coo.data, jnp.float32),
         jnp.asarray(np.stack([coo.row, coo.col], axis=1), jnp.int32)),
        shape=L.shape,
    )

    # Normalized Laplacian eigenvalues lie in [0, 2]; LOBPCG finds the
    # LARGEST eigenpairs of (2I - L), which are the smallest of L.
    def matvec(x):
        return 2.0 * x - L_bcoo @ x

    key = jax.random.PRNGKey(0 if seed is None else seed)
    X0 = jax.random.normal(key, (n, k), jnp.float32)
    _, eigenvectors, _ = lobpcg_standard(matvec, X0, m=200)
    return np.asarray(eigenvectors[:, 1:k])


def spectral_init(adjacency, n_components, method="auto", seed=None,
                  device_threshold=500_000, mesh=None):
    """Initial positions from the graph spectrum, (n, n_components) float32.

    method in {'auto', 'scipy', 'chebyshev', 'lobpcg', 'random'}. 'auto'
    uses host ARPACK up to ``device_threshold`` vertices and the device
    Chebyshev tier beyond. Measured on the ring+chords 1M graph
    (experiments/cheb_1m.py): eigsh 6.7 s at n=250K and 95 s at n=1M;
    chebyshev 62 s cold / 33 s warm at n=1M with subspace alignment
    0.996 vs eigsh — the crossover sits near 500K. Unpreconditioned
    device LOBPCG at n=250K took 103 s and converged poorly (Rayleigh
    quotients ~0.59 after 200 iterations) — kept only as an explicit
    opt-in; 'chebyshev' is the device tier that actually converges
    (filter damps the bulk instead of preconditioning).

    mesh : optional jax.sharding.Mesh. With >1 device, the Chebyshev
    tier row-shards its SpMV table over the mesh (each device gathers
    n/ndev rows, one tiled all_gather per matvec) — per-row arithmetic
    is unchanged, so results match the single-device runner.
    """
    n = adjacency.shape[0]
    rng = np.random.default_rng(seed)

    if method == "random":
        return (rng.standard_normal((n, n_components)) * 0.1).astype(np.float32)

    if method == "auto":
        method = "scipy" if n < device_threshold else "chebyshev"

    if method == "chebyshev":
        try:
            return _spectral_chebyshev(
                adjacency, n_components, seed, mesh=mesh
            ).astype(np.float32)
        except Exception as e:
            logger.warning(
                "Chebyshev subspace iteration failed (%s); "
                "falling back to scipy eigsh", e,
            )
            method = "scipy"

    try:
        L = _normalized_laplacian(adjacency)
    except Exception as e:  # pragma: no cover
        logger.warning("Laplacian construction failed: %s", e)
        return (rng.standard_normal((n, n_components)) * 0.1).astype(np.float32)

    if method == "lobpcg":
        try:
            return _spectral_lobpcg(L, n_components, seed).astype(np.float32)
        except Exception as e:
            logger.warning("LOBPCG failed (%s); falling back to scipy eigsh", e)
            method = "scipy"

    try:
        return _spectral_scipy(L, n_components, seed).astype(np.float32)
    except Exception as e:
        logger.warning("Eigendecomposition failed: %s", e)
        return (rng.standard_normal((n, n_components)) * 0.1).astype(np.float32)
