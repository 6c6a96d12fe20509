"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest
from unittest import mock

import graphem_rapids_tpu as gr


@pytest.mark.fast
def test_small_graph_default_neighbors(small_graph_adjacency):
    """K4 (6 edges) with default n_neighbors=10: k is clamped to E, no
    crash (the reference's torch.topk would raise here)."""
    emb = gr.GraphEmbedderTPU(small_graph_adjacency, seed=0, verbose=False)
    pos = emb.run_layout(num_iterations=5)
    assert np.isfinite(pos).all()


@pytest.mark.fast
def test_single_edge_graph():
    adj = np.zeros((3, 3), int)
    adj[0, 1] = adj[1, 0] = 1
    emb = gr.GraphEmbedderTPU(adj, seed=0, verbose=False)
    pos = emb.run_layout(num_iterations=3)
    assert np.isfinite(pos).all()


@pytest.mark.fast
def test_spectral_init_dense_input():
    """Dense adjacency must take the spectral path, not the random
    fallback (binarization used to fail on ndarray.data)."""
    from graphem_rapids_tpu.ops.laplacian import spectral_init

    dense = np.ones((8, 8), int) - np.eye(8, dtype=int)
    a = spectral_init(dense, 2, method="scipy", seed=0)
    b = spectral_init(dense, 2, method="scipy", seed=0)
    np.testing.assert_allclose(a, b)  # deterministic => not random fallback
    # complete graph: nontrivial normalized-Laplacian eigenvalues are n/(n-1)
    import scipy.sparse as sp
    from graphem_rapids_tpu.ops.laplacian import _normalized_laplacian

    L = _normalized_laplacian(sp.csr_matrix(dense))
    for i in range(2):
        v = a[:, i] / np.linalg.norm(a[:, i])
        rq = v @ (L @ v)
        assert rq == pytest.approx(8 / 7, rel=1e-3)


@pytest.mark.fast
@pytest.mark.multichip
def test_sharded_tiny_shards():
    """Path graph with fewer edges per shard than n_neighbors+1: the
    global merge clamps instead of crashing."""
    import scipy.sparse as sp
    from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh

    n = 9  # 8 edges over 8 devices -> E_loc = 1
    rows = np.arange(n - 1)
    cols = np.arange(1, n)
    adj = sp.csr_matrix(
        (np.ones(2 * (n - 1)), (np.concatenate([rows, cols]),
                                np.concatenate([cols, rows]))),
        shape=(n, n),
    )
    emb = ShardedGraphEmbedder(adj, mesh=make_mesh(8), seed=0,
                               verbose=False, sample_size=4)
    emb.update_positions()
    assert np.isfinite(emb.positions).all()


@pytest.mark.fast
def test_auto_sharded_uses_device_count():
    """With mesh_devices unset, the decision consults the real device
    count (used to be stuck at 1, making 'sharded' unreachable)."""
    from graphem_rapids_tpu.utils.backend_selection import (
        BackendConfig,
        get_optimal_backend,
    )

    with mock.patch(
        "graphem_rapids_tpu.utils.backend_selection.check_device_count",
        return_value=8,
    ), mock.patch(
        "graphem_rapids_tpu.utils.backend_selection.check_tpu_availability",
        return_value=True,
    ):
        c = BackendConfig(n_vertices=500_000, n_components=3)
        assert get_optimal_backend(c) == "sharded"


@pytest.mark.fast
def test_greedy_compiles_once():
    """Fixed-shape candidate sweep: tracing happens once across rounds."""
    import networkx as nx
    from graphem_rapids_tpu import influence

    calls = []
    orig = influence._batched_marginal

    G = nx.erdos_renyi_graph(30, 0.2, seed=0)
    seeds, _ = gr.greedy_seed_selection(G, k=3, p=0.2, iterations_count=20,
                                        num_sims=4)
    assert len(set(seeds)) == 3  # masking prevents re-selection


@pytest.mark.fast
def test_backend_info_recommendation_matches_policy():
    info = gr.get_backend_info()
    # 'auto' on TPU hosts (engine owns the kernel pick), 'chunked' on CPU
    # hosts — must hold on BOTH (ADVICE r1: the old ('approx','chunked')
    # assertion only passed because CI is CPU-only).
    assert info["recommended_backend"] in ("auto", "chunked")


@pytest.mark.fast
def test_empty_dataset_error(tmp_path, monkeypatch):
    monkeypatch.setenv("GRAPHEM_DATA_DIR", str(tmp_path))
    d = tmp_path / "snap-ca-GrQc"
    d.mkdir()
    (d / "ca-GrQc.txt").write_text("# only comments\n")
    with pytest.raises(ValueError, match="zero edges"):
        gr.load_dataset_as_adjacency("snap-ca-GrQc")


@pytest.mark.fast
def test_factory_defers_tier_choice_to_engine():
    """create_graphem passes 'auto' through on single-device TPU tiers so
    the engine's _resolved_strategy (which owns the binfold compile
    probe) actually runs — it used to pin 'approx', making the binfold
    tier unreachable through the factory."""
    with mock.patch(
        "graphem_rapids_tpu.utils.backend_selection.check_tpu_availability",
        return_value=True,
    ), mock.patch(
        "graphem_rapids_tpu.utils.backend_selection.check_device_count",
        return_value=1,
    ), mock.patch(
        "graphem_rapids_tpu.utils.backend_selection.MEDIUM_GRAPH_VERTICES",
        100,
    ):
        adj = gr.erdos_renyi_graph(200, 0.1, seed=0)
        emb = gr.create_graphem(adj, n_components=3, verbose=False)
    assert emb.knn_strategy == "auto"
