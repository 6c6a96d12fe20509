"""Slot-major ref layout (ref_order='slot') correctness.

The slot-major enumeration + per-slot 2D gathers exist so very large
graphs compile: the row-major path makes XLA materialize cap-minor
temps whose (cap -> 128) lane padding is a 16x HBM blowup at 30M
vertices (BASELINE.md round 3). These tests pin (a) oracle parity of
the slotwise step, (b) slot-vs-row trajectory agreement on every
engine path, and (c) the host-side slot-index bookkeeping.
"""

import numpy as np
import pytest

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.models import oracle
from graphem_rapids_tpu.ops.forces import (
    build_neighbor_table,
    build_neighbor_table_binned,
)

PARAMS = dict(k_attr=0.5, L_min=10.0, k_inter=0.1, n_neighbors=15)


@pytest.mark.fast
def test_slot_order_oracle_parity_binned_fused():
    """Slotwise binned+fused step matches the numpy reference oracle."""
    adj = gr.generate_ba(n=300, m=3, seed=2)
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=7, verbose=False, sample_size=128,
        ref_order="slot", binned_table=True, fused_midpoints=True,
        **PARAMS,
    )
    edges = emb._edges_np
    expected = emb.positions.astype(np.float64)
    rng = np.random.default_rng(3)
    for _ in range(3):
        sampled = rng.permutation(len(edges))[:128]
        expected = oracle.update_step_np(expected, edges, sampled, **PARAMS)
        emb.update_positions(sample_indices=sampled)
    np.testing.assert_allclose(emb.positions, expected, rtol=5e-3, atol=5e-4)


@pytest.mark.fast
@pytest.mark.parametrize("case", ["binned_fused", "flat_fused", "auto"])
def test_slot_vs_row_trajectory(case):
    """ref_order='slot' reproduces the row-major trajectory."""
    kw = {
        "binned_fused": dict(binned_table=True, fused_midpoints=True),
        "flat_fused": dict(binned_table=False, fused_midpoints=True),
        "auto": {},
    }[case]
    adj = gr.erdos_renyi_graph(n=400, p=0.03, seed=1)
    got = {}
    for order in ("row", "slot"):
        emb = gr.GraphEmbedderTPU(
            adj, n_components=3, seed=7, verbose=False, ref_order=order,
            sample_size=64, n_neighbors=8, **kw,
        )
        for t in range(6):
            sampled = np.sort(np.random.default_rng(100 + t).choice(
                emb.n_edges, 64, replace=False
            ))
            emb.update_positions(sample_indices=sampled)
        got[order] = np.asarray(emb.positions)
    np.testing.assert_allclose(got["slot"], got["row"], rtol=1e-3,
                               atol=1e-4)


def _check_maps(nb, edges_int, n_table_slots):
    """edge_ref/ref_edge round-trip: every in-table edge's slot maps back."""
    edge_ref = np.asarray(nb["edge_ref"])
    ref_edge = np.asarray(nb["ref_edge"])
    ref_valid = np.asarray(nb["ref_valid"])
    E = len(edges_int)
    assert (edge_ref >= 0).all()
    in_table = edge_ref < n_table_slots
    assert ref_valid[edge_ref[in_table]].all()
    np.testing.assert_array_equal(
        ref_edge[edge_ref], np.arange(E, dtype=np.int32)
    )
    # valid slots are exactly the in-table edges' slots
    assert ref_valid.sum() == in_table.sum()


@pytest.mark.fast
def test_slot_order_host_maps_flat():
    adj = gr.generate_random_regular(n=120, d=6, seed=0)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int32)
    nb = build_neighbor_table(edges, 120, ref_order="slot")
    assert nb["ref_order"] == "slot"
    assert "table_t" in nb and "table" not in nb
    assert nb["table_t"].shape[1] == 120
    _check_maps(nb, edges, 120 * nb["ref_cap"])
    # slot-major arithmetic: slot (v, s) -> s*n + v
    edge_ref = np.asarray(nb["edge_ref"])
    tt = np.asarray(nb["table_t"])
    in_table = edge_ref < 120 * nb["ref_cap"]
    s, v = np.divmod(edge_ref[in_table], 120)
    lo = np.minimum(edges[in_table, 0], edges[in_table, 1])
    hi = np.maximum(edges[in_table, 0], edges[in_table, 1])
    np.testing.assert_array_equal(v, lo)
    np.testing.assert_array_equal(tt[s, v], hi)


@pytest.mark.fast
def test_slot_order_host_maps_binned():
    adj = gr.generate_ba(n=300, m=3, seed=4)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int32)
    nbb = build_neighbor_table_binned(edges, 300, overhead_rows=0,
                                      ref_order="slot")
    assert nbb is not None and nbb["ref_order"] == "slot"
    R = sum(g["count"] * g["ref_cap"] for g in nbb["buckets"])
    _check_maps(nbb, nbb["edges_int"], R)
    for g in nbb["buckets"]:
        assert "table_t" in g and "table" not in g
        assert g["table_t"].shape == (g["cap"], g["count"])
    # slot-major arithmetic inside each bucket
    edge_ref = np.asarray(nbb["edge_ref"])
    e0 = nbb["edges_int"][:, 0]
    for g in nbb["buckets"]:
        lo, hi = g["ref_offset"], g["ref_offset"] + g["count"] * g["ref_cap"]
        sel = (edge_ref >= lo) & (edge_ref < hi)
        s, p = np.divmod(edge_ref[sel] - lo, g["count"])
        np.testing.assert_array_equal(p + g["start"], e0[sel])
        assert (s < g["ref_cap"]).all()


@pytest.mark.fast
def test_slot_order_accepted_on_sharded():
    """Round 4: the sharded tier gained slot-major support
    (parallel/sharded_step.py slot_order branches) — the explicit
    kwarg must construct and run, where it raised through round 3."""
    from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh

    adj = gr.generate_random_regular(n=64, d=4, seed=0)
    emb = ShardedGraphEmbedder(
        adj, n_components=2, mesh=make_mesh(2), seed=0, verbose=False,
        ref_order="slot",
    )
    assert emb.ref_order == "slot"
    emb.update_positions()
    assert np.isfinite(np.asarray(emb.positions)).all()


@pytest.mark.fast
@pytest.mark.parametrize("order", ["row", "slot"])
def test_ref_budget_trim_midpoints_exact(order):
    """A ref_budget that forces column trims keeps every edge's ref
    midpoint exact (trimmed edges spill to overflow refs)."""
    import jax.numpy as jnp

    from graphem_rapids_tpu.ops.forces import (
        midpoint_refs_binned,
        spring_refs_binned_slotwise,
    )

    adj = gr.generate_ba(n=400, m=4, seed=3)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int32)
    E = len(edges)
    free = build_neighbor_table_binned(edges, 400, overhead_rows=0,
                                       ref_order=order)
    budget = int(free["ref_edge"].shape[0] * 0.7)
    nbb = build_neighbor_table_binned(edges, 400, overhead_rows=0,
                                      ref_order=order, ref_budget=budget)
    assert int(nbb["ref_edge"].shape[0]) <= budget
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((400, 3)).astype(np.float32))
    ov = jnp.asarray(nbb["overflow_lt"]) if len(nbb["overflow_lt"]) else None
    if order == "slot":
        tables_t = [g["table_t"] for g in nbb["buckets"]]
        _, refs = spring_refs_binned_slotwise(
            pos, tables_t, nbb, 0.1, 1.0,
            ref_valid=nbb["ref_valid"], overflow_lt=ov,
        )
    else:
        pn_list = [pos[g["table"]] for g in nbb["buckets"]]
        refs = midpoint_refs_binned(pos, pn_list, nbb, ov)
    refs = np.asarray(refs)
    # every edge's ref slot holds its midpoint (internal numbering)
    ei = nbb["edges_int"]
    expect = np.asarray((pos[ei[:, 0]] + pos[ei[:, 1]]) / 2.0)
    got = refs[np.asarray(nbb["edge_ref"])]
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)
    assert E == len(ei)


@pytest.mark.fast
@pytest.mark.parametrize("d", [2, 3, 4])
def test_packed_take_matches_plain_gather(d):
    """packed_take is value-identical to positions[idx] — including a
    non-G-divisible n (zero-padded packed rows) and every engine dim."""
    import jax.numpy as jnp

    from graphem_rapids_tpu.ops.forces import pack_positions, packed_take

    rng = np.random.default_rng(4)
    n = 1003  # not divisible by G=8
    pos = rng.standard_normal((n, d)).astype(np.float32)
    idx = rng.integers(0, n, 500).astype(np.int32)
    packed = pack_positions(jnp.asarray(pos))
    out = packed_take(packed, jnp.asarray(idx), d)
    np.testing.assert_array_equal(np.asarray(out), pos[idx])


@pytest.mark.fast
@pytest.mark.parametrize("case", ["binned_fused", "flat_fused"])
def test_packed_gather_trajectory_matches_plain(case):
    """packed_gather=True reproduces the plain slot trajectory exactly
    (the one-hot reduce adds 1.0*v + 0.0*neighbors — bit-identical)."""
    kw = {
        "binned_fused": dict(binned_table=True, fused_midpoints=True),
        "flat_fused": dict(binned_table=False, fused_midpoints=True),
    }[case]
    adj = gr.generate_ba(n=350, m=4, seed=3)
    got = {}
    for packed in (False, True):
        emb = gr.GraphEmbedderTPU(
            adj, n_components=3, seed=7, verbose=False, ref_order="slot",
            packed_gather=packed, sample_size=64, n_neighbors=8, **kw,
        )
        assert emb._packed_gather_active == packed
        for t in range(5):
            sampled = np.sort(np.random.default_rng(200 + t).choice(
                emb.n_edges, size=64, replace=False,
            ))
            emb.update_positions(sample_indices=sampled)
        got[packed] = np.asarray(emb.positions)
    np.testing.assert_allclose(
        got[True], got[False], rtol=1e-6, atol=1e-7
    )
