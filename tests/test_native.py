"""Native C parser tests: parity with the Python fallback and edge cases."""

import numpy as np
import pytest

from graphem_rapids_tpu.native import FASTGRAPH_AVAILABLE, parse_edges_native

needs_native = pytest.mark.skipif(
    not FASTGRAPH_AVAILABLE,
    reason="native extension not built (python setup_native.py)",
)


@pytest.mark.fast
@needs_native
def test_basic_parse():
    data = b"# comment\n0 1\n1 2\n\n2 3 99\n"
    edges = parse_edges_native(data)
    assert edges.tolist() == [[0, 1], [1, 2], [2, 3]]


@pytest.mark.fast
@needs_native
def test_mtx_style():
    data = b"%%MatrixMarket\n% note\n4 4 3\n1 2\n2 3\n3 4\n"
    edges = parse_edges_native(data, one_based=True, skip_header=True)
    assert edges.tolist() == [[0, 1], [1, 2], [2, 3]]


@pytest.mark.fast
@needs_native
def test_garbage_lines_skipped():
    data = b"hello world\n0 1\nnot numbers\n5\n2 3\n"
    edges = parse_edges_native(data)
    # '5' alone has no second int -> skipped; words -> skipped
    assert edges.tolist() == [[0, 1], [2, 3]]


@pytest.mark.fast
@needs_native
def test_empty_input():
    assert parse_edges_native(b"").shape == (0, 2)
    assert parse_edges_native(b"# only comments\n% more\n").shape == (0, 2)


@pytest.mark.fast
@needs_native
def test_crlf_and_tabs():
    data = b"0\t1\r\n1\t2\r\n"
    edges = parse_edges_native(data)
    assert edges.tolist() == [[0, 1], [1, 2]]


@pytest.mark.fast
@needs_native
def test_large_ids():
    data = b"4000000000 4000000001\n"
    edges = parse_edges_native(data)
    assert edges.tolist() == [[4000000000, 4000000001]]


@pytest.mark.fast
@needs_native
def test_matches_fallback_on_random_input(tmp_path):
    rng = np.random.default_rng(0)
    e = rng.integers(0, 10_000, size=(5000, 2))
    text = "# header\n" + "\n".join(f"{a} {b}" for a, b in e)
    f = tmp_path / "edges.txt"
    f.write_text(text)

    from graphem_rapids_tpu import datasets as ds

    native = parse_edges_native(f.read_bytes())
    # force the pandas fallback for comparison
    import unittest.mock as mock

    with mock.patch.object(ds, "_parse_edge_text",
                           wraps=ds._parse_edge_text):
        with mock.patch("graphem_rapids_tpu.native.parse_edges_native",
                        return_value=None):
            fallback = ds._parse_edge_text(f)
    np.testing.assert_array_equal(native, fallback)


@pytest.mark.fast
@needs_native
def test_csr_lt_edges_matches_numpy():
    """Threaded C upper-triangle extraction == the numpy formulation,
    over random graphs with empty rows and both CSR index dtypes."""
    import scipy.sparse as sp

    from graphem_rapids_tpu.native import csr_lt_edges_native

    rng = np.random.default_rng(0)
    for n, ne in [(50, 100), (1000, 5000), (7, 0), (3, 2)]:
        e = rng.integers(0, n, (ne, 2))
        e = e[e[:, 0] != e[:, 1]]
        a = sp.coo_matrix(
            (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n)
        ).tocsr()
        a = ((a + a.T) > 0).astype(np.float32).tocsr()
        rows = np.repeat(np.arange(n), np.diff(a.indptr))
        cols = a.indices
        ref = np.column_stack([rows[rows < cols], cols[rows < cols]])
        got = csr_lt_edges_native(a.indptr, a.indices, n)
        assert np.array_equal(got, ref.reshape(-1, 2)), (n, ne)
        a64 = sp.csr_matrix(
            (a.data, a.indices.astype(np.int64),
             a.indptr.astype(np.int64)),
            shape=a.shape,
        )
        got64 = csr_lt_edges_native(a64.indptr, a64.indices, n)
        assert np.array_equal(got64, ref.reshape(-1, 2))


@pytest.mark.fast
@needs_native
def test_embedder_uses_native_extraction():
    """The embedder's edge extraction routes through the C scanner and
    produces the same edge set as the numpy fallback (explicit zeros
    force the fallback)."""
    import scipy.sparse as sp

    import graphem_rapids_tpu as gr

    adj = gr.erdos_renyi_graph(n=200, p=0.05, seed=0)
    emb = gr.GraphEmbedderTPU(adj, n_components=2, seed=0, verbose=False)
    assert emb._edges_np.dtype == np.int32  # C path taken
    # an explicit zero on an upper-triangle entry forces the numpy
    # fallback, which must drop exactly that edge
    az = adj.tocsr().copy().astype(np.float32)
    rows = np.repeat(np.arange(az.shape[0]), np.diff(az.indptr))
    upper = np.flatnonzero(rows < az.indices)
    az.data[upper[0]] = 0.0
    emb_z = gr.GraphEmbedderTPU(az, n_components=2, seed=0, verbose=False)
    assert emb_z.n_edges == emb.n_edges - 1
