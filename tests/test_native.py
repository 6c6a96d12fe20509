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
