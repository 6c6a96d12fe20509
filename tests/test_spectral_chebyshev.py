"""Tests for the Chebyshev-filtered device spectral-init tier.

The 'chebyshev' tier (ops/laplacian.py) is the TPU-native large-n path:
neighbor-table gather SpMV + analytic deflation of D^{1/2}1 + Chebyshev
bulk filter + Rayleigh-Ritz. Validated here against host ARPACK on graphs
small enough for both (the CPU suite runs the same JAX code the TPU
executes).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.ops import laplacian as lap


def _subspace_alignment(X, Y):
    """Smallest canonical correlation between the column spans."""
    Qx, _ = np.linalg.qr(X)
    Qy, _ = np.linalg.qr(Y)
    return np.linalg.svd(Qx.T @ Qy, compute_uv=False).min()


@pytest.mark.fast
@pytest.mark.parametrize("gen", ["regular", "er", "ba"])
def test_chebyshev_matches_eigsh_subspace(gen):
    import networkx as nx

    G = {
        "regular": lambda: nx.random_regular_graph(8, 2000, seed=0),
        "er": lambda: nx.erdos_renyi_graph(2000, 0.005, seed=0),
        "ba": lambda: nx.barabasi_albert_graph(2000, 3, seed=0),
    }[gen]()
    A = sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))
    k = 3
    Xc = lap._spectral_chebyshev(A, k, seed=0)
    assert Xc.shape == (2000, k) and np.isfinite(Xc).all()
    L = lap._normalized_laplacian(A)
    Xs = lap._spectral_scipy(L, k, seed=0)
    assert _subspace_alignment(Xc, Xs) > 0.95


@pytest.mark.fast
def test_matvec_plan_matches_scipy_spmv():
    """Neighbor-table gather + overflow COO reproduces A @ X (to fp32
    accumulation order), including on a skewed-degree graph that
    exercises the overflow."""
    import networkx as nx

    G = nx.star_graph(200)  # hub degree 200 >> cap -> overflow path
    G.add_edges_from((i, i + 1) for i in range(1, 150))
    A = sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))

    import jax.numpy as jnp
    import jax

    rng = np.random.default_rng(0)
    X = rng.standard_normal((A.shape[0], 4)).astype(np.float32)
    Xj = jnp.asarray(X)

    def gather_spmv(plan):
        table, pad_count = plan["table"], plan["pad_count"]
        AX = Xj[table].sum(axis=1) - pad_count[:, None] * Xj
        ov_plan, overflow = plan["ov_plan"], plan["overflow"]
        if ov_plan is not None:
            hub_ids = ov_plan["hub_ids"]
            Yo = Xj[ov_plan["pairs"][:, 1]]
            blk = Yo.reshape(-1, ov_plan["block"], Yo.shape[-1]).sum(1)
            hub = jax.ops.segment_sum(
                blk, ov_plan["block_hub"],
                num_segments=hub_ids.shape[0], indices_are_sorted=True,
            )
            hub = hub - ov_plan["pad_count"][:, None] * Xj[hub_ids]
            AX = AX.at[hub_ids].add(hub)
        elif overflow.shape[0] > 0:
            AX = AX + jax.ops.segment_sum(
                Xj[overflow[:, 1]], overflow[:, 0],
                num_segments=A.shape[0],
            )
        return np.asarray(AX)

    # default: the hub spills into the block-fold plan
    plan = lap._adjacency_matvec_plan(A)
    assert plan["ov_plan"] is not None
    # fp32 gather-sum vs scipy's fp64 SpMV: tolerance covers summation
    # order on the 200-degree hub row, not a structural mismatch.
    np.testing.assert_allclose(gather_spmv(plan), A @ X,
                               rtol=1e-3, atol=1e-4)

    # full-width cap: no overflow at all
    plan_full = lap._adjacency_matvec_plan(A, cap=201)
    assert plan_full["ov_plan"] is None
    assert plan_full["overflow"].shape[0] == 0
    np.testing.assert_allclose(gather_spmv(plan_full), A @ X,
                               rtol=1e-3, atol=1e-4)


@pytest.mark.fast
def test_spectral_init_chebyshev_method():
    adj = gr.erdos_renyi_graph(500, 0.02, seed=0)
    X = lap.spectral_init(adj, 3, method="chebyshev", seed=0)
    assert X.shape == (500, 3)
    assert np.isfinite(X).all()
    assert X.dtype == np.float32


@pytest.mark.fast
def test_auto_routes_large_n_to_chebyshev(monkeypatch):
    adj = gr.erdos_renyi_graph(300, 0.05, seed=0)
    called = {}
    orig = lap._spectral_chebyshev

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(lap, "_spectral_chebyshev", spy)
    lap.spectral_init(adj, 2, method="auto", seed=0, device_threshold=100)
    assert called.get("yes")


@pytest.mark.fast
def test_chebyshev_failure_tiers_down_to_scipy(monkeypatch):
    """Tiered-fallback pattern (SURVEY.md §5.3): chebyshev -> scipy."""
    adj = gr.erdos_renyi_graph(200, 0.05, seed=0)

    def boom(*a, **kw):
        raise RuntimeError("chebyshev subspace iteration diverged")

    monkeypatch.setattr(lap, "_spectral_chebyshev", boom)
    X = lap.spectral_init(adj, 2, method="chebyshev", seed=0)
    assert X.shape == (200, 2)
    assert np.isfinite(X).all()
    # matches the scipy tier it fell back to
    L = lap._normalized_laplacian(adj)
    Xs = lap._spectral_scipy(L, 2, seed=0)
    assert _subspace_alignment(X, Xs) > 0.999


def _assert_match_modulo_signs(Xm, X1, atol):
    """Per-column sign flips are inherent (eigh sign convention differs
    between the shard_map and plain-jit lowerings); the reference's own
    reproducibility tests also compare modulo reflections."""
    for c in range(X1.shape[1]):
        d = min(np.abs(Xm[:, c] - X1[:, c]).max(),
                np.abs(Xm[:, c] + X1[:, c]).max())
        assert d < atol, f"column {c}: {d}"


@pytest.mark.fast
@pytest.mark.multichip
@pytest.mark.parametrize("n,ndev", [(2000, 4), (1999, 8)])
def test_chebyshev_sharded_matches_single_device(n, ndev):
    """Mesh-sharded Chebyshev (row-sharded SpMV table + tiled all_gather
    per matvec) vs the single-device runner: per-row arithmetic is
    unchanged, so the iterates must agree to fp noise modulo column
    signs — including when n does not divide the mesh (tail-device pad
    rows)."""
    import networkx as nx

    from graphem_rapids_tpu.parallel import make_mesh

    G = nx.random_regular_graph(8, n, seed=0)
    A = sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))
    k = 3
    X1 = lap._spectral_chebyshev(A, k, seed=0)
    Xm = lap._spectral_chebyshev(A, k, seed=0, mesh=make_mesh(ndev))
    _assert_match_modulo_signs(Xm, X1, atol=1e-4)


@pytest.mark.fast
@pytest.mark.multichip
def test_chebyshev_sharded_overflow_path():
    """Skewed-degree graph whose hub rows spill into the overflow plan:
    the sharded runner applies the same replicated correction, so it
    must still match the single-device result."""
    import networkx as nx

    from graphem_rapids_tpu.parallel import make_mesh

    G = nx.star_graph(800)
    G.add_edges_from((i, (i + 1) % 801) for i in range(1, 800))
    G.add_edges_from((i, (i + 37) % 801) for i in range(1, 800))
    A = sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))
    plan = lap._adjacency_matvec_plan(
        sp.csr_matrix((A + A.T > 0).astype(np.float32))
    )
    assert (plan["ov_plan"] is not None
            or plan["overflow"].shape[0] > 0), "test wants the overflow"
    k = 2
    X1 = lap._spectral_chebyshev(A, k, seed=0)
    Xm = lap._spectral_chebyshev(A, k, seed=0, mesh=make_mesh(4))
    _assert_match_modulo_signs(Xm, X1, atol=1e-4)


@pytest.mark.fast
@pytest.mark.multichip
def test_sharded_embedder_chebyshev_init():
    """ShardedGraphEmbedder routes init='chebyshev' through its mesh and
    the resulting spectral start aligns with host eigsh."""
    from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh

    adj = gr.generate_random_regular(n=1000, d=8, seed=0)
    emb = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(4), seed=0, verbose=False,
        init="chebyshev", sample_size=64,
    )
    pos = np.asarray(emb.positions)
    assert pos.shape == (1000, 3) and np.isfinite(pos).all()
    L = lap._normalized_laplacian(adj)
    Xs = lap._spectral_scipy(L, 3, seed=0)
    assert _subspace_alignment(pos, Xs) > 0.95
