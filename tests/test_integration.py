"""End-to-end integration tests (mirror of reference
tests/test_integration.py: full pipelines, multi-graph sweep, parameter
sensitivity, disconnected-component separation, centrality correlation)."""

import networkx as nx
import numpy as np
import pytest
import scipy.sparse as sp
from scipy import stats

import graphem_rapids_tpu as gr

pytestmark = pytest.mark.integration


@pytest.mark.fast
def test_full_pipeline():
    """generate -> embed -> layout -> seeds -> influence, end to end
    (reference test_integration.py:18-46)."""
    adj = gr.erdos_renyi_graph(100, 0.06, seed=0)
    emb = gr.create_graphem(adj, n_components=3, seed=0, verbose=False)
    emb.run_layout(num_iterations=10)
    seeds = gr.graphem_seed_selection(emb, k=5, num_iterations=2)
    spread = gr.estimated_influence(adj, seeds, p=0.1, num_sims=32)
    assert 5 <= spread <= 100


@pytest.mark.fast
@pytest.mark.parametrize("gen,params", [
    (gr.erdos_renyi_graph, {"n": 80, "p": 0.08, "seed": 0}),
    (gr.generate_ba, {"n": 80, "m": 2, "seed": 0}),
    (gr.generate_ws, {"n": 80, "k": 4, "p": 0.2, "seed": 0}),
    (gr.generate_random_regular, {"n": 80, "d": 3, "seed": 0}),
    (gr.generate_caveman, {"l": 8, "k": 10}),
])
def test_multi_graph_sweep(gen, params):
    """Layout sanity across graph families + edge-length sanity
    (reference test_integration.py:69-109)."""
    adj = gen(**params)
    emb = gr.GraphEmbedderTPU(adj, n_components=2, seed=0, verbose=False)
    pos = emb.run_layout(num_iterations=10)
    assert np.isfinite(pos).all()
    edges = emb._edges_np
    lengths = np.linalg.norm(pos[edges[:, 0]] - pos[edges[:, 1]], axis=1)
    assert np.isfinite(lengths).all()
    assert lengths.max() < 100


@pytest.mark.fast
def test_parameter_sensitivity():
    """Different force parameters produce different embeddings
    (reference test_integration.py:140-174)."""
    adj = gr.erdos_renyi_graph(60, 0.1, seed=0)
    a = gr.GraphEmbedderTPU(adj, seed=0, verbose=False,
                            k_attr=0.2, L_min=1.0).run_layout(10)
    b = gr.GraphEmbedderTPU(adj, seed=0, verbose=False,
                            k_attr=0.9, L_min=5.0).run_layout(10)
    assert not np.allclose(a, b)


@pytest.mark.fast
def test_disconnected_component_separation():
    """Two cliques with no inter-edges end up radially separated
    (reference test_integration.py:272-311)."""
    k = 12
    adj = sp.block_diag([
        np.ones((k, k), int) - np.eye(k, dtype=int),
        np.ones((k, k), int) - np.eye(k, dtype=int),
    ]).tocsr()
    emb = gr.GraphEmbedderTPU(adj, n_components=2, seed=0, verbose=False)
    pos = emb.run_layout(num_iterations=20)
    c1 = pos[:k].mean(axis=0)
    c2 = pos[k:].mean(axis=0)
    intra = max(np.linalg.norm(pos[:k] - c1, axis=1).mean(),
                np.linalg.norm(pos[k:] - c2, axis=1).mean())
    assert np.linalg.norm(c1 - c2) > intra


@pytest.mark.fast
def test_radius_centrality_correlation():
    """The paper's core claim: radial distance correlates with degree
    centrality (BASELINE.md Spearman target)."""
    adj = gr.erdos_renyi_graph(300, 0.03, seed=1)
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False,
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512,
    )
    pos = emb.run_layout(num_iterations=30)
    radii = np.linalg.norm(pos, axis=1)
    G = nx.from_scipy_sparse_array(adj)
    deg = np.array([d for _, d in G.degree()])
    rho, _ = stats.spearmanr(radii, deg)
    assert rho > 0.5, f"radius~degree correlation too weak: {rho}"


@pytest.mark.fast
def test_cross_strategy_consistency():
    """exact and chunked kNN strategies give allclose trajectories with the
    same seed (reference cross-backend test, test_integration.py:314-344)."""
    adj = gr.erdos_renyi_graph(80, 0.08, seed=0)
    a = gr.GraphEmbedderTPU(adj, seed=3, verbose=False,
                            knn_strategy="exact").run_layout(5)
    b = gr.GraphEmbedderTPU(adj, seed=3, verbose=False,
                            knn_strategy="chunked").run_layout(5)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


@pytest.mark.fast
def test_benchmark_api_smoke():
    res = gr.benchmark_correlations(
        gr.erdos_renyi_graph, {"n": 60, "p": 0.1, "seed": 0},
        dim=2, num_iterations=5, sample_size=64,
    )
    assert "correlations" in res
    assert set(res["correlations"]) == {
        "degree", "betweenness", "eigenvector", "pagerank", "closeness",
        "node_load",
    }
    assert res["layout_time"] > 0
    assert res["edges_per_second"] > 0


@pytest.mark.fast
def test_influence_benchmark_smoke():
    res = gr.run_influence_benchmark(
        gr.erdos_renyi_graph, {"n": 40, "p": 0.15, "seed": 0},
        k=3, p=0.2, iterations=20, num_layout_iterations=3,
        num_random_baselines=2, num_sims=8,
    )
    for key in ("graphem_influence", "greedy_influence", "random_influence",
                "graphem_efficiency", "greedy_efficiency"):
        assert key in res
    assert len(res["graphem_seeds"]) == 3


@pytest.mark.fast
def test_visualization_stats():
    rng = np.random.default_rng(0)
    radii = rng.random(100)
    deg = radii * 2 + rng.random(100) * 0.1
    rho, p = gr.report_corr("degree", radii, deg, reps=50, seed=0)
    assert rho > 0.9
    mat = gr.report_full_correlation_matrix(
        radii, deg, deg, deg, deg, deg, deg
    )
    assert mat.shape == (7, 7)


@pytest.mark.fast
def test_display_benchmark_results():
    df = gr.display_benchmark_results([
        {"graph_type": "er", "n": 10, "m": 20, "layout_time": 0.5},
    ])
    assert list(df.columns) == ["graph_type", "n", "m", "layout_time"]
