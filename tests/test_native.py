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


@pytest.mark.fast
@needs_native
def test_radix_argsort_matches_numpy():
    """Threaded LSD radix argsort == np.argsort(kind='stable') across
    sizes, key widths (1-4 passes), duplicates, and empty input."""
    from graphem_rapids_tpu.native import radix_argsort_native

    rng = np.random.default_rng(3)
    cases = [
        np.zeros(0, np.uint64),
        np.array([5], np.uint64),
        rng.integers(0, 7, 1000).astype(np.uint64),        # dups, 1 pass
        rng.integers(0, 2**30, 10_000).astype(np.uint64),  # 2 passes
        rng.integers(0, 2**45, 50_000).astype(np.uint64),  # 3 passes
        rng.integers(0, 2**60, 20_000).astype(np.uint64),  # 4 passes
        rng.integers(0, 100, 5000).astype(np.int32),       # int32 keys
        np.minimum(rng.integers(0, 40, 3000), 11),         # int64 keys
    ]
    for k in cases:
        got = radix_argsort_native(k)
        want = np.argsort(k, kind="stable")
        assert got is not None
        np.testing.assert_array_equal(got, want.astype(np.int32))
    # negative keys refuse (caller falls back)
    assert radix_argsort_native(np.array([-1, 3], np.int64)) is None


@pytest.mark.fast
@needs_native
def test_table_build_helpers_match_numpy():
    """apply_perm_minmax / permute_pairs / scatter_ranks == their numpy
    formulations (the lines they replace in build_neighbor_table*)."""
    from graphem_rapids_tpu.native import (
        apply_perm_minmax_native,
        permute_pairs_native,
        scatter_ranks_native,
    )

    rng = np.random.default_rng(4)
    n, E = 500, 4000
    edges = rng.integers(0, n, (E, 2)).astype(np.int32)
    inv = rng.permutation(n).astype(np.int32)
    lo, hi = apply_perm_minmax_native(edges, inv)
    a = inv[edges]
    np.testing.assert_array_equal(lo, np.minimum(a[:, 0], a[:, 1]))
    np.testing.assert_array_equal(hi, np.maximum(a[:, 0], a[:, 1]))

    order = rng.permutation(E).astype(np.int32)
    pairs, invp = permute_pairs_native(lo, hi, order)
    np.testing.assert_array_equal(
        pairs, np.column_stack([lo[order], hi[order]])
    )
    want_inv = np.empty(E, np.int32)
    want_inv[order] = np.arange(E, dtype=np.int32)
    np.testing.assert_array_equal(invp, want_inv)

    keys = rng.integers(0, n, E).astype(np.int32)
    perm = np.argsort(keys, kind="stable").astype(np.int32)
    starts = np.concatenate(
        [[0], np.cumsum(np.bincount(keys, minlength=n))[:-1]]
    ).astype(np.int32)
    got = scatter_ranks_native(perm, keys, starts)
    want = np.empty(E, np.int32)
    want[perm] = np.arange(E, dtype=np.int32) - starts[keys[perm]]
    np.testing.assert_array_equal(got, want)


@pytest.mark.fast
def test_native_is_active_when_required():
    """CI gate: after the workflow's build step, the native path must be
    ACTIVE — a silent fallback to numpy (e.g. an import error swallowed
    by the try/except) must fail the suite, not skip it. Opt-in via
    GRAPHEM_REQUIRE_NATIVE=1 so clean local checkouts keep skipping."""
    import os

    if os.environ.get("GRAPHEM_REQUIRE_NATIVE") != "1":
        pytest.skip("GRAPHEM_REQUIRE_NATIVE not set")
    assert FASTGRAPH_AVAILABLE, (
        "GRAPHEM_REQUIRE_NATIVE=1 but the fastgraph C extension did not "
        "import — the build step ran, so this is a real regression"
    )
    got = parse_edges_native(b"0 1\n1 2\n")
    assert got.tolist() == [[0, 1], [1, 2]]
