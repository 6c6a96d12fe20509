"""Degree-binned neighbor-table tests (ops/forces.py
build_neighbor_table_binned and the embedder's internal renumbering).

The binned structure must be INVISIBLE at every public boundary: user
vertex/edge ids in `positions`, `_edges_np`, injected sample indices,
and checkpoints, while the step math stays allclose to the flat engine
and the numpy oracle.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.models import oracle
from graphem_rapids_tpu.ops.forces import (
    build_neighbor_table,
    build_neighbor_table_binned,
)

PARAMS = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=5)


def _skewed_adj(n=400, seed=2):
    rng = np.random.default_rng(seed)
    e = [(0, j) for j in range(1, 300)] + [(1, j) for j in range(2, 200)]
    e += [(min(a, b), max(a, b))
          for a, b in rng.integers(0, n, (700, 2)) if a != b]
    e = np.unique(np.array(sorted(set(e)), np.int64), axis=0)
    adj = sp.coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n)
    ).tocsr()
    adj = adj + adj.T
    adj.data[:] = 1
    return adj


@pytest.mark.fast
def test_binned_structure_invariants():
    adj = _skewed_adj()
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int64)
    nbb = build_neighbor_table_binned(edges, 400, overhead_rows=0)
    assert nbb is not None and len(nbb["buckets"]) > 1

    # buckets tile [0, n) contiguously, caps ascending
    pos = 0
    prev_cap = -1
    for g in nbb["buckets"]:
        assert g["start"] == pos
        pos += g["count"]
        assert g["cap"] > prev_cap
        prev_cap = g["cap"]
        assert g["table"].shape == (g["count"], g["cap"])
    assert pos == 400

    # every directed (v, u) pair appears exactly once: in some bucket
    # table slot or in the overflow
    perm, inv = nbb["perm"], nbb["inv_perm"]
    np.testing.assert_array_equal(perm[inv], np.arange(400))
    seen = []
    for g in nbb["buckets"]:
        t = np.asarray(g["table"])
        own = np.repeat(
            np.arange(g["start"], g["start"] + g["count"]), g["cap"]
        )
        flat = t.reshape(-1)
        real = flat != own  # self-pads excluded
        seen.append(np.stack([own[real], flat[real]], axis=1))
    seen.append(np.asarray(nbb["overflow"], np.int64))
    got = np.concatenate(seen)
    e_int = nbb["edges_int"]
    want = np.concatenate([e_int, e_int[:, ::-1]])
    got = got[np.lexsort((got[:, 1], got[:, 0]))]
    want = want[np.lexsort((want[:, 1], want[:, 0]))]
    np.testing.assert_array_equal(got, want)

    # edge_map is a bijection consistent with the renumbering
    user_edges_roundtrip = np.sort(perm[e_int[nbb["edge_map"]]], axis=1)
    np.testing.assert_array_equal(user_edges_roundtrip, edges)

    # every edge owns exactly one valid ref slot
    ref_edge = np.asarray(nbb["ref_edge"])
    ref_valid = np.asarray(nbb["ref_valid"])
    E = len(edges)
    owners = np.concatenate([
        ref_edge[:len(ref_valid)][ref_valid],
        ref_edge[len(ref_valid):],
    ])
    assert sorted(owners.tolist()) == list(range(E))
    edge_ref = np.asarray(nbb["edge_ref"])
    assert (edge_ref >= 0).all()


@pytest.mark.fast
@pytest.mark.parametrize("make_adj", [
    lambda: gr.erdos_renyi_graph(300, 0.03, seed=0),
    _skewed_adj,
])
def test_binned_full_step_oracle_parity(make_adj):
    """Forced-binned engine == numpy oracle on user-id injected samples."""
    adj = make_adj()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=7, verbose=False, sample_size=64,
        binned_table=True, **PARAMS,
    )
    assert "buckets" in emb._nb, "binned structure must be active"
    edges = emb._edges_np
    positions = emb.positions.copy()

    rng = np.random.default_rng(3)
    sampled = rng.permutation(len(edges))[:64]
    expected = oracle.update_step_np(
        positions.astype(np.float64), edges, sampled, **PARAMS
    )
    emb.update_positions(sample_indices=sampled)
    np.testing.assert_allclose(emb.positions, expected,
                               rtol=1e-3, atol=1e-4)


@pytest.mark.fast
def test_binned_matches_flat_trajectory():
    """Binned and flat engines on the same injected samples stay allclose
    over several steps (identical math, different gather layout)."""
    adj = _skewed_adj(seed=5)
    kw = dict(n_components=3, seed=9, verbose=False, sample_size=48,
              **PARAMS)
    binned = gr.GraphEmbedderTPU(adj, binned_table=True, **kw)
    flat = gr.GraphEmbedderTPU(adj, binned_table=False, **kw)
    assert "buckets" in binned._nb and "buckets" not in flat._nb
    rng = np.random.default_rng(1)
    E = binned.n_edges
    for _ in range(4):
        sampled = rng.permutation(E)[:48]
        binned.update_positions(sample_indices=sampled)
        flat.update_positions(sample_indices=sampled)
    np.testing.assert_allclose(binned.positions, flat.positions,
                               rtol=2e-3, atol=2e-4)


@pytest.mark.fast
def test_binned_positions_roundtrip_and_checkpoint(tmp_path):
    adj = _skewed_adj(seed=7)
    emb = gr.GraphEmbedderTPU(
        adj, n_components=2, seed=3, verbose=False, binned_table=True,
    )
    assert "buckets" in emb._nb
    user_pos = emb.positions
    # setter/getter round-trip preserves user order
    emb.positions = user_pos
    np.testing.assert_allclose(emb.positions, user_pos, rtol=1e-6)

    emb.run_layout(num_iterations=3)
    ckpt = tmp_path / "state.npz"
    emb.save_checkpoint(ckpt)
    pos_after = emb.positions.copy()

    emb2 = gr.GraphEmbedderTPU(
        adj, n_components=2, seed=3, verbose=False, binned_table=True,
    )
    emb2.load_checkpoint(ckpt)
    np.testing.assert_allclose(emb2.positions, pos_after, rtol=1e-6)
    # and the restored engine keeps stepping identically
    emb.update_positions()
    emb2._key = emb._key  # align keys drifted by construction
    assert np.isfinite(emb2.run_layout(num_iterations=2)).all()


@pytest.mark.fast
def test_binned_auto_activates_at_scale():
    """The auto tier (binned_table=None) must bin a large non-regular
    graph and keep the flat table on a regular one."""
    adj = gr.erdos_renyi_graph(20_000, 0.0008, seed=1)
    emb = gr.GraphEmbedderTPU(adj, n_components=2, seed=0, verbose=False)
    assert "buckets" in emb._nb
    flat_rows = 0
    deg = np.asarray(adj.sum(axis=1)).ravel()
    nb_flat = build_neighbor_table(emb._edges_np, emb.n)
    flat_rows = nb_flat["table"].shape[0] * nb_flat["table"].shape[1]
    binned_rows = sum(
        g["count"] * g["cap"] for g in emb._nb["buckets"]
    )
    assert binned_rows < 0.85 * flat_rows, (binned_rows, flat_rows)

    reg = gr.generate_random_regular(n=1000, d=8, seed=0)
    emb_reg = gr.GraphEmbedderTPU(reg, n_components=2, seed=0,
                                  verbose=False)
    assert "buckets" not in emb_reg._nb


@pytest.mark.fast
def test_binned_int32_slot_guard():
    """Graphs whose slot space exceeds int32 indexing must be rejected
    up front (the device side indexes tables with int32 lanes)."""

    class FakeEdges:
        def __len__(self):
            return 1 << 30

    with pytest.raises(ValueError, match="int32"):
        build_neighbor_table_binned(FakeEdges(), 1000)


@pytest.mark.fast
def test_builders_fuzz_consistency():
    """Both table builders, fuzzed over random graph shapes: every edge
    is represented exactly once in the ref space (a table slot or an
    overflow_lt row), slot<->edge maps are mutually inverse, and each
    undirected edge contributes exactly two directed entries across
    tables + overflow."""
    rng = np.random.default_rng(11)
    for trial in range(8):
        n = int(rng.integers(20, 400))
        m = int(rng.integers(n, 4 * n))
        e = rng.integers(0, n, (m, 2))
        e = e[e[:, 0] != e[:, 1]]
        e = np.unique(np.sort(e, axis=1), axis=0).astype(np.int64)
        if len(e) == 0:
            continue
        E = len(e)

        for nb, renumbered in (
            (build_neighbor_table(e, n), False),
            (build_neighbor_table_binned(e, n, overhead_rows=0), True),
        ):
            if nb is None:
                continue
            er = np.asarray(nb["edge_ref"])
            re_ = np.asarray(nb["ref_edge"])
            rv = np.asarray(nb["ref_valid"])
            # every edge's ref slot maps back to that edge
            assert (re_[er] == np.arange(E)).all()
            # valid slots + overflow_lt rows partition the edge set
            assert int(rv.sum()) + len(nb["overflow_lt"]) == E
            # directed-entry conservation: table non-pad entries plus
            # overflow pairs == 2E
            if renumbered:
                tables = [np.asarray(g["table"]) for g in nb["buckets"]]
                starts = [g["start"] for g in nb["buckets"]]
                non_pad = sum(
                    int((t != (np.arange(t.shape[0])[:, None] + s)).sum())
                    for t, s in zip(tables, starts)
                )
            else:
                t = np.asarray(nb["table"])
                non_pad = int(
                    (t != np.arange(t.shape[0])[:, None]).sum()
                )
            assert non_pad + len(nb["overflow"]) == 2 * E, (
                trial, non_pad, len(nb["overflow"]))
