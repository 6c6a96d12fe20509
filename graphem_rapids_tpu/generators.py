"""Graph generators.

Same 13-generator surface as the reference (graphem_rapids/generators.py),
all returning scipy sparse CSR adjacency matrices. Generation is host-side
by design — it is not on the hot path (SURVEY.md §2.3) — and the generated
CSR feeds the TPU engine's COO edge extraction.
"""

import networkx as nx
import numpy as np
import scipy.sparse as sp


def _nx_to_sparse_adjacency(G):
    """NetworkX graph -> sparse CSR adjacency."""
    return sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))


def _edges_to_sparse_adjacency(edges, n):
    """Edge list -> symmetric sparse CSR adjacency."""
    edges = np.asarray(edges)
    if len(edges) == 0:
        return sp.csr_matrix((n, n), dtype=int)
    rows = np.concatenate([edges[:, 0], edges[:, 1]])
    cols = np.concatenate([edges[:, 1], edges[:, 0]])
    data = np.ones(len(rows), dtype=int)
    adj = sp.csr_matrix((data, (rows, cols)), shape=(n, n))
    adj.data[:] = 1  # collapse duplicates
    return adj


def compute_vertex_degrees(adjacency):
    """Per-vertex degree from the adjacency (row sums)."""
    return np.array(adjacency.sum(axis=1)).flatten()


def erdos_renyi_graph(n, p, seed=0):
    """Erdős–Rényi G(n, p) random graph -> sparse CSR adjacency."""
    G = nx.erdos_renyi_graph(n, p, seed=seed)
    return _nx_to_sparse_adjacency(G)


def generate_sbm(n_per_block=75, num_blocks=4, p_in=0.15, p_out=0.01,
                 labels=False, seed=0):
    """Stochastic block model; optionally returns block labels."""
    sizes = [n_per_block] * num_blocks
    p_matrix = np.full((num_blocks, num_blocks), p_out)
    np.fill_diagonal(p_matrix, p_in)
    G = nx.stochastic_block_model(sizes, p_matrix, seed=seed)
    adjacency = _nx_to_sparse_adjacency(G)
    if labels:
        vertex_labels = np.repeat(np.arange(num_blocks), n_per_block)
        return adjacency, vertex_labels
    return adjacency


def generate_ba(n=300, m=3, seed=0):
    """Barabási–Albert preferential-attachment graph."""
    G = nx.barabasi_albert_graph(n, m, seed=seed)
    return _nx_to_sparse_adjacency(G)


def generate_ws(n=1000, k=6, p=0.3, seed=0):
    """Watts–Strogatz small-world graph."""
    G = nx.watts_strogatz_graph(n, k, p, seed=seed)
    return _nx_to_sparse_adjacency(G)


def generate_power_cluster(n=1000, m=3, p=0.5, seed=0):
    """Powerlaw cluster graph."""
    G = nx.powerlaw_cluster_graph(n, m, p, seed=seed)
    return _nx_to_sparse_adjacency(G)


def generate_road_network(width=30, height=30):
    """2D grid graph (road-network proxy), nodes relabeled to ints."""
    G = nx.grid_2d_graph(width, height)
    mapping = {node: i for i, node in enumerate(G.nodes())}
    G = nx.relabel_nodes(G, mapping)
    return _nx_to_sparse_adjacency(G)


def generate_bipartite_graph(n_top=50, n_bottom=100, p=0.1, seed=None):
    """Random bipartite graph over n_top + n_bottom vertices."""
    G = nx.bipartite.random_graph(n_top, n_bottom, p, seed=seed)
    return _nx_to_sparse_adjacency(G)


def generate_balanced_tree(r=2, h=10):
    """Balanced r-ary tree of height h."""
    G = nx.balanced_tree(r, h)
    return _nx_to_sparse_adjacency(G)


def generate_random_regular(n=100, d=3, seed=0):
    """Random d-regular graph."""
    G = nx.random_regular_graph(d, n, seed=seed)
    return _nx_to_sparse_adjacency(G)


def generate_scale_free(n=100, alpha=0.41, beta=0.54, gamma=0.05,
                        delta_in=0.2, delta_out=0, seed=0):
    """Directed scale-free graph, symmetrized with self-loops removed."""
    G = nx.scale_free_graph(n, alpha, beta, gamma, delta_in, delta_out,
                            seed=seed)
    # collapse the MultiDiGraph to a simple undirected graph (binary edges)
    G = nx.Graph(G.to_undirected())
    G.remove_edges_from(nx.selfloop_edges(G))
    return _nx_to_sparse_adjacency(G)


def generate_geometric(n=100, radius=0.2, dim=2, seed=0):
    """Random geometric graph in the unit cube."""
    G = nx.random_geometric_graph(n, radius, dim=dim, seed=seed)
    return _nx_to_sparse_adjacency(G)


def generate_caveman(l=10, k=10):
    """Caveman graph: l disjoint cliques of size k."""
    G = nx.caveman_graph(l, k)
    return _nx_to_sparse_adjacency(G)


def generate_relaxed_caveman(l=10, k=10, p=0.1, seed=0):
    """Relaxed caveman graph with rewiring probability p."""
    G = nx.relaxed_caveman_graph(l, k, p, seed=seed)
    return _nx_to_sparse_adjacency(G)
