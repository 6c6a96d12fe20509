"""Generator invariants (mirror of reference tests/test_generators.py):
sparse CSR output, symmetry, no self-loops, degree regularity, seed
reproducibility, format contract across all 13 generators."""

import numpy as np
import pytest
import scipy.sparse as sp

import graphem_rapids_tpu as gr

ALL_GENERATORS = [
    (gr.erdos_renyi_graph, {"n": 60, "p": 0.1, "seed": 0}),
    (gr.generate_sbm, {"n_per_block": 15, "num_blocks": 3, "seed": 0}),
    (gr.generate_ba, {"n": 60, "m": 2, "seed": 0}),
    (gr.generate_ws, {"n": 60, "k": 4, "p": 0.2, "seed": 0}),
    (gr.generate_power_cluster, {"n": 60, "m": 2, "p": 0.3, "seed": 0}),
    (gr.generate_road_network, {"width": 6, "height": 6}),
    (gr.generate_bipartite_graph, {"n_top": 12, "n_bottom": 20, "seed": 0}),
    (gr.generate_balanced_tree, {"r": 2, "h": 4}),
    (gr.generate_random_regular, {"n": 60, "d": 3, "seed": 0}),
    (gr.generate_scale_free, {"n": 60, "seed": 0}),
    (gr.generate_geometric, {"n": 60, "radius": 0.3, "seed": 0}),
    (gr.generate_caveman, {"l": 5, "k": 6}),
    (gr.generate_relaxed_caveman, {"l": 5, "k": 6, "p": 0.1, "seed": 0}),
]


@pytest.mark.fast
@pytest.mark.parametrize("gen,params", ALL_GENERATORS,
                         ids=[g.__name__ for g, _ in ALL_GENERATORS])
def test_format_contract(gen, params):
    adj = gen(**params)
    assert sp.issparse(adj)
    assert adj.shape[0] == adj.shape[1]
    # symmetric
    assert (adj != adj.T).nnz == 0
    # no self-loops
    assert adj.diagonal().sum() == 0
    # binary weights
    assert set(np.unique(adj.data)).issubset({1})


@pytest.mark.fast
def test_er_seed_reproducibility():
    a = gr.erdos_renyi_graph(50, 0.1, seed=7)
    b = gr.erdos_renyi_graph(50, 0.1, seed=7)
    assert (a != b).nnz == 0
    c = gr.erdos_renyi_graph(50, 0.1, seed=8)
    assert (a != c).nnz != 0


@pytest.mark.fast
def test_random_regular_degrees():
    adj = gr.generate_random_regular(n=50, d=4, seed=0)
    degrees = gr.compute_vertex_degrees(adj)
    assert (degrees == 4).all()


@pytest.mark.fast
def test_sbm_labels():
    adj, labels = gr.generate_sbm(n_per_block=10, num_blocks=3, labels=True,
                                  seed=0)
    assert adj.shape == (30, 30)
    assert labels.shape == (30,)
    assert set(labels) == {0, 1, 2}


@pytest.mark.fast
def test_balanced_tree_size():
    adj = gr.generate_balanced_tree(r=2, h=3)
    assert adj.shape[0] == 2**4 - 1  # 15 nodes
    assert adj.nnz // 2 == 14  # tree edges


@pytest.mark.fast
def test_road_network_size():
    adj = gr.generate_road_network(width=4, height=5)
    assert adj.shape[0] == 20
    # grid edges: w*(h-1) + h*(w-1)
    assert adj.nnz // 2 == 4 * 4 + 5 * 3


@pytest.mark.fast
def test_compute_vertex_degrees():
    dense = np.array([[0, 1, 1], [1, 0, 0], [1, 0, 0]])
    degrees = gr.compute_vertex_degrees(sp.csr_matrix(dense))
    assert degrees.tolist() == [2, 1, 1]


@pytest.mark.fast
def test_edges_to_sparse_adjacency_helper():
    from graphem_rapids_tpu.generators import _edges_to_sparse_adjacency

    adj = _edges_to_sparse_adjacency(np.array([[0, 1], [1, 2]]), 4)
    assert adj.shape == (4, 4)
    assert adj.nnz == 4
    empty = _edges_to_sparse_adjacency(np.empty((0, 2)), 3)
    assert empty.nnz == 0
