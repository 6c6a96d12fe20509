"""Influence maximization tests (mirror of reference tests/test_influence.py:
IC on path/complete/disconnected graphs with tolerant stochastic
assertions), plus the JAX simulator-specific properties."""

import networkx as nx
import numpy as np
import pytest

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.ops.ic_sim import estimated_influence as ic_estimate
from graphem_rapids_tpu.ops.ic_sim import independent_cascade


@pytest.mark.fast
class TestICSimulator:
    def test_p_zero_spreads_nothing(self):
        edges = np.array([[0, 1], [1, 2], [2, 3]])
        counts, _ = independent_cascade(edges, 4, [0], p=0.0, num_sims=16)
        assert (counts == 1).all()

    def test_p_one_floods_connected_component(self):
        edges = np.array([[0, 1], [1, 2], [2, 3]])
        counts, _ = independent_cascade(edges, 5, [0], p=1.0, num_sims=16)
        # node 4 is isolated; everything else activates
        assert (counts == 4).all()

    def test_disconnected_components(self):
        edges = np.array([[0, 1], [2, 3]])
        counts, _ = independent_cascade(edges, 4, [0], p=1.0, num_sims=8)
        assert (counts == 2).all()

    def test_all_seeds(self):
        edges = np.array([[0, 1]])
        counts, _ = independent_cascade(edges, 2, [0, 1], p=0.5, num_sims=8)
        assert (counts == 2).all()

    def test_spread_monotone_in_p(self):
        adj = gr.erdos_renyi_graph(100, 0.05, seed=0)
        rows, cols = adj.nonzero()
        edges = np.column_stack([rows[rows < cols], cols[rows < cols]])
        low = ic_estimate(edges, 100, [0, 1, 2], p=0.02, num_sims=128)
        high = ic_estimate(edges, 100, [0, 1, 2], p=0.4, num_sims=128)
        assert high > low

    def test_complete_graph_high_p(self):
        n = 10
        edges = np.array([[i, j] for i in range(n) for j in range(i + 1, n)])
        counts, _ = independent_cascade(edges, n, [0], p=0.9, num_sims=32)
        assert counts.mean() > n * 0.8


@pytest.mark.fast
class TestSeedSelection:
    def test_graphem_seed_selection(self):
        adj = gr.erdos_renyi_graph(80, 0.08, seed=0)
        emb = gr.GraphEmbedderTPU(adj, seed=0, verbose=False)
        seeds = gr.graphem_seed_selection(emb, k=5, num_iterations=5)
        assert len(seeds) == 5
        assert len(set(seeds)) == 5
        assert all(0 <= s < 80 for s in seeds)

    def test_seeds_have_top_radii(self):
        adj = gr.erdos_renyi_graph(80, 0.08, seed=0)
        emb = gr.GraphEmbedderTPU(adj, seed=0, verbose=False)
        seeds = gr.graphem_seed_selection(emb, k=5, num_iterations=5)
        radii = np.linalg.norm(emb.positions, axis=1)
        top = set(np.argsort(-radii)[:5].tolist())
        assert set(seeds) == top

    def test_greedy_selection(self):
        G = nx.erdos_renyi_graph(40, 0.15, seed=0)
        seeds, evals = gr.greedy_seed_selection(G, k=3, p=0.2,
                                                iterations_count=30,
                                                num_sims=8)
        assert len(seeds) == 3
        assert len(set(seeds)) == 3
        assert evals > 0

    def test_greedy_beats_worst_case(self):
        """Greedy spread should comfortably beat an isolated-ish seed set."""
        G = nx.barbell_graph(10, 2)
        seeds, _ = gr.greedy_seed_selection(G, k=2, p=0.3,
                                            iterations_count=30, num_sims=16)
        spread = gr.estimated_influence(G, seeds, p=0.3, num_sims=64)
        assert spread > 2


@pytest.mark.fast
class TestInfluenceAPI:
    def test_estimated_influence_accepts_graph_forms(self):
        adj = gr.erdos_renyi_graph(30, 0.2, seed=0)
        G = nx.from_scipy_sparse_array(adj)
        a = gr.estimated_influence(adj, [0, 1], p=0.1, num_sims=32,
                                   key=__import__("jax").random.PRNGKey(0))
        b = gr.estimated_influence(G, [0, 1], p=0.1, num_sims=32,
                                   key=__import__("jax").random.PRNGKey(0))
        assert a == b

    def test_ndlib_estimated_influence_fallback(self):
        """Without ndlib installed this exercises the JAX fallback with
        NDlib return-shape semantics (count, iterations)."""
        G = nx.path_graph(10)
        influenced, iters = gr.ndlib_estimated_influence(G, [0], p=1.0,
                                                         iterations_count=50)
        assert influenced == 10
        assert iters > 0
