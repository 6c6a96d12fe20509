"""Engine unit tests (mirror of reference tests/test_pytorch_backend.py +
test_embedder.py scope: init/shape/dtype, layout sanity, stability,
reproducibility modulo reflections, validation)."""

import numpy as np
import pytest
import scipy.sparse as sp

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.models.embedder import GraphEmbedderTPU


@pytest.mark.fast
class TestInitialization:
    def test_basic_init(self, small_graph_adjacency):
        emb = GraphEmbedderTPU(small_graph_adjacency, n_components=2,
                               verbose=False)
        assert emb.n == 4
        assert emb.n_edges == 6
        assert emb.positions.shape == (4, 2)
        assert emb.positions.dtype == np.float32

    def test_init_from_dense(self):
        dense = np.ones((5, 5), int) - np.eye(5, dtype=int)
        emb = GraphEmbedderTPU(dense, verbose=False)
        assert emb.n == 5
        assert emb.n_edges == 10

    def test_init_from_coo(self):
        coo = sp.coo_matrix(np.ones((4, 4), int) - np.eye(4, dtype=int))
        emb = GraphEmbedderTPU(coo, verbose=False)
        assert emb.n_edges == 6

    def test_higher_dims(self, small_graph_adjacency):
        for d in (2, 3, 5):
            emb = GraphEmbedderTPU(small_graph_adjacency, n_components=d,
                                   verbose=False)
            assert emb.positions.shape == (4, d)

    def test_spectral_init_is_finite(self):
        adj = gr.erdos_renyi_graph(100, 0.05, seed=0)
        emb = GraphEmbedderTPU(adj, n_components=3, verbose=False)
        assert np.isfinite(emb.positions).all()

    def test_random_init(self):
        adj = gr.erdos_renyi_graph(50, 0.1, seed=0)
        emb = GraphEmbedderTPU(adj, init="random", seed=0, verbose=False)
        assert np.isfinite(emb.positions).all()

    def test_sample_size_clamped_to_edges(self, small_graph_adjacency):
        emb = GraphEmbedderTPU(small_graph_adjacency, sample_size=10_000,
                               verbose=False)
        assert emb.sample_size == emb.n_edges


@pytest.mark.fast
class TestValidation:
    def test_non_square_raises(self):
        with pytest.raises(ValueError, match="square"):
            GraphEmbedderTPU(np.ones((3, 4)))

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="empty"):
            GraphEmbedderTPU(np.zeros((0, 0)))

    def test_bad_n_components(self, small_graph_adjacency):
        with pytest.raises(ValueError, match="components"):
            GraphEmbedderTPU(small_graph_adjacency, n_components=0)

    def test_negative_k_attr(self, small_graph_adjacency):
        with pytest.raises(ValueError, match="k_attr"):
            GraphEmbedderTPU(small_graph_adjacency, k_attr=-0.5)

    def test_bad_n_neighbors(self, small_graph_adjacency):
        with pytest.raises(ValueError, match="n_neighbors"):
            GraphEmbedderTPU(small_graph_adjacency, n_neighbors=0)

    def test_bad_sample_size(self, small_graph_adjacency):
        with pytest.raises(ValueError, match="sample_size"):
            GraphEmbedderTPU(small_graph_adjacency, sample_size=-1)

    def test_bad_block_size(self, small_graph_adjacency):
        emb = GraphEmbedderTPU(small_graph_adjacency, verbose=False, seed=0)
        with pytest.raises(ValueError, match="block_size"):
            emb.run_layout(5, block_size=0)


@pytest.mark.fast
class TestEdgeExtraction:
    """The CSR-structure extraction must match nonzero() semantics."""

    def test_non_csr_formats_give_same_edges(self):
        adj = gr.erdos_renyi_graph(60, 0.1, seed=5)
        ref = GraphEmbedderTPU(adj, n_components=2, seed=0, verbose=False)
        for fmt in (adj.tocsc(), adj.tocoo(), adj.todense()):
            emb = GraphEmbedderTPU(fmt, n_components=2, seed=0,
                                   verbose=False)
            assert emb.n_edges == ref.n_edges

    def test_explicit_zeros_are_not_edges(self):
        import scipy.sparse as sp

        data = np.array([1.0, 0.0, 1.0, 1.0, 0.0, 1.0])
        r = np.array([0, 0, 1, 1, 2, 2])
        c = np.array([1, 2, 0, 2, 0, 1])
        adj = sp.csr_matrix((data, (r, c)), shape=(3, 3))
        emb = GraphEmbedderTPU(adj, n_components=2, seed=0, verbose=False)
        assert emb.n_edges == 2  # (0,2) is an explicit stored zero


@pytest.mark.fast
class TestLayout:
    def test_layout_changes_positions(self):
        adj = gr.erdos_renyi_graph(80, 0.08, seed=0)
        emb = GraphEmbedderTPU(adj, seed=0, verbose=False)
        before = emb.positions.copy()
        emb.run_layout(num_iterations=5)
        assert not np.allclose(before, emb.positions)

    def test_layout_stays_finite(self):
        adj = gr.generate_ba(n=100, m=3, seed=0)
        emb = GraphEmbedderTPU(adj, seed=0, verbose=False)
        pos = emb.run_layout(num_iterations=30)
        assert np.isfinite(pos).all()

    def test_layout_stability_bound(self):
        """Positions are standardized every step; max |coord| stays small
        (reference bound: < 1000, test_pytorch_backend.py:212-233)."""
        adj = gr.generate_ws(n=100, k=4, p=0.2, seed=0)
        emb = GraphEmbedderTPU(adj, seed=0, verbose=False)
        pos = emb.run_layout(num_iterations=30)
        assert np.abs(pos).max() < 1000

    def test_disconnected_graph(self):
        adj = sp.block_diag([
            np.ones((5, 5), int) - np.eye(5, dtype=int),
            np.ones((5, 5), int) - np.eye(5, dtype=int),
        ]).tocsr()
        emb = GraphEmbedderTPU(adj, seed=0, verbose=False)
        pos = emb.run_layout(num_iterations=10)
        assert np.isfinite(pos).all()

    def test_single_update(self):
        adj = gr.erdos_renyi_graph(50, 0.1, seed=0)
        emb = GraphEmbedderTPU(adj, seed=0, verbose=False)
        emb.update_positions()
        assert emb._iteration == 1

    def test_continue_layout(self):
        """run_layout can be called repeatedly to continue
        (reference test_pytorch_backend.py:227-229)."""
        adj = gr.erdos_renyi_graph(50, 0.1, seed=0)
        emb = GraphEmbedderTPU(adj, seed=0, verbose=False)
        emb.run_layout(num_iterations=3)
        p1 = emb.positions.copy()
        emb.run_layout(num_iterations=3)
        assert not np.allclose(p1, emb.positions)

    def test_no_dimension_collapse(self):
        """Every embedding dimension keeps variance (reference
        test_integration.py:111-138)."""
        adj = gr.erdos_renyi_graph(100, 0.06, seed=0)
        emb = GraphEmbedderTPU(adj, n_components=3, seed=0, verbose=False)
        pos = emb.run_layout(num_iterations=20)
        assert (pos.var(axis=0) > 1e-6).all()


@pytest.mark.fast
class TestReproducibility:
    def test_seeded_runs_match(self):
        """Same seed => identical trajectories (JAX keys are explicit, so
        unlike the reference we match exactly, no reflection modulo
        needed)."""
        adj = gr.erdos_renyi_graph(60, 0.1, seed=0)
        runs = []
        for _ in range(2):
            emb = GraphEmbedderTPU(adj, seed=123, verbose=False)
            runs.append(emb.run_layout(num_iterations=5))
        np.testing.assert_allclose(runs[0], runs[1], rtol=1e-5, atol=1e-6)

    def test_different_seeds_differ(self):
        adj = gr.erdos_renyi_graph(60, 0.1, seed=0)
        a = GraphEmbedderTPU(adj, seed=1, verbose=False).run_layout(5)
        b = GraphEmbedderTPU(adj, seed=2, verbose=False).run_layout(5)
        assert not np.allclose(a, b)


@pytest.mark.fast
class TestPositionsAPI:
    def test_positions_roundtrip(self, small_graph_adjacency):
        emb = GraphEmbedderTPU(small_graph_adjacency, verbose=False)
        new = np.random.default_rng(0).standard_normal((4, 2)).astype(
            np.float32
        )
        emb.positions = new
        np.testing.assert_allclose(emb.positions, new)

    def test_get_positions(self, small_graph_adjacency):
        emb = GraphEmbedderTPU(small_graph_adjacency, verbose=False)
        assert isinstance(emb.get_positions(), np.ndarray)

    def test_repr(self, small_graph_adjacency):
        emb = GraphEmbedderTPU(small_graph_adjacency, verbose=False)
        assert "GraphEmbedderTPU" in repr(emb)


@pytest.mark.fast
class TestFactory:
    def test_create_graphem_default(self):
        adj = gr.erdos_renyi_graph(50, 0.1, seed=0)
        emb = gr.create_graphem(adj, n_components=3, verbose=False)
        assert emb.positions.shape == (50, 3)

    def test_create_graphem_forced_strategies(self):
        adj = gr.erdos_renyi_graph(50, 0.1, seed=0)
        for backend in ("exact", "chunked", "approx"):
            emb = gr.create_graphem(adj, backend=backend, verbose=False)
            assert emb._resolved_strategy() == backend

    def test_create_graphem_legacy_aliases(self):
        adj = gr.erdos_renyi_graph(30, 0.1, seed=0)
        for legacy in ("pytorch", "cuvs", "cpu"):
            emb = gr.create_graphem(adj, backend=legacy, verbose=False)
            assert emb.positions.shape[0] == 30

    def test_invalid_backend_raises(self):
        adj = gr.erdos_renyi_graph(30, 0.1, seed=0)
        with pytest.raises(ValueError):
            gr.create_graphem(adj, backend="definitely-not-a-backend")

    def test_get_backend_info(self):
        info = gr.get_backend_info()
        assert "recommended_backend" in info
        assert info["device_count"] >= 1


@pytest.mark.fast
def test_fused_midpoints_auto_rule():
    """Auto fused-refs: on for bounded approx tiers, off when forced off,
    off when the enlarged reference set would fall off the one-shot kNN
    budget (which would cost more than the gather it saves)."""
    import graphem_rapids_tpu as gr

    adj = gr.erdos_renyi_graph(300, 0.05, seed=0)

    emb = gr.GraphEmbedderTPU(adj, verbose=False, knn_strategy="approx")
    assert emb._fused_refs_active  # small slot table, budget holds

    emb = gr.GraphEmbedderTPU(adj, verbose=False, knn_strategy="approx",
                              fused_midpoints=False)
    assert not emb._fused_refs_active

    # exact strategy never uses the fused path under the auto rule
    emb = gr.GraphEmbedderTPU(adj, verbose=False, knn_strategy="exact")
    assert not emb._fused_refs_active

    # a sample_size so large that S * refs * 4 exceeds the one-shot
    # budget must disable the auto fused path (falls back to the direct
    # midpoint gather, which stays on the one-shot path at E refs)
    import importlib

    # ops/__init__ re-exports a `knn` FUNCTION that shadows the submodule
    # on attribute access; resolve the module itself explicitly.
    knn_mod = importlib.import_module("graphem_rapids_tpu.ops.knn")
    orig = knn_mod.ONESHOT_BUDGET_OVERRIDE
    try:
        knn_mod.ONESHOT_BUDGET_OVERRIDE = 1024
        emb = gr.GraphEmbedderTPU(adj, verbose=False, knn_strategy="approx")
        assert not emb._fused_refs_active
    finally:
        knn_mod.ONESHOT_BUDGET_OVERRIDE = orig


@pytest.mark.fast
def test_reference_engine_alias():
    """Reference code importing GraphEmbedderPyTorch keeps working."""
    import graphem_rapids_tpu as gr

    assert gr.GraphEmbedderPyTorch is gr.GraphEmbedderTPU
    adj = gr.erdos_renyi_graph(50, 0.1, seed=0)
    emb = gr.GraphEmbedderPyTorch(adj, n_components=2, seed=1, verbose=False)
    import numpy as np
    assert np.isfinite(emb.run_layout(3)).all()
