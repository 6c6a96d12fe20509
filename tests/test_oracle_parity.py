"""Layer-by-layer allclose parity: TPU engine vs numpy oracle.

The oracle (models/oracle.py) transcribes the reference PyTorch-CPU
update_positions step; these tests drive both implementations with IDENTICAL
injected sample indices (SURVEY.md §7.1.4) and compare per-layer outputs.
This is the BASELINE.md config-1 parity gate.
"""

import numpy as np
import pytest

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.models import oracle
from graphem_rapids_tpu.ops.forces import (
    build_scatter_plan,
    intersection_forces,
    spring_forces,
)
from graphem_rapids_tpu.ops.knn import knn_chunked, knn_exact

PARAMS = dict(k_attr=0.5, L_min=10.0, k_inter=0.1, n_neighbors=15)


def _setup(n=300, p=0.03, d=3, seed=0):
    adj = gr.erdos_renyi_graph(n, p, seed=seed)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int64)
    rng = np.random.default_rng(seed)
    positions = rng.standard_normal((n, d)).astype(np.float32)
    return edges, positions


@pytest.mark.fast
def test_spring_forces_parity():
    edges, positions = _setup()
    expected = oracle.spring_forces_np(positions, edges, 0.5, 10.0)
    plan = build_scatter_plan(edges, positions.shape[0])
    import jax.numpy as jnp

    got = np.asarray(
        spring_forces(jnp.asarray(positions), jnp.asarray(edges, jnp.int32),
                      0.5, 10.0, plan)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.fast
def test_spring_forces_nbtable_parity():
    """Gather-based neighbor-table aggregation == scatter == oracle."""
    from graphem_rapids_tpu.ops.forces import (
        build_neighbor_table,
        spring_forces_nbtable,
    )
    import jax.numpy as jnp

    edges, positions = _setup()
    expected = oracle.spring_forces_np(positions, edges, 0.5, 10.0)
    nb = build_neighbor_table(edges, positions.shape[0])
    overflow = jnp.asarray(nb["overflow"]) if len(nb["overflow"]) else None
    got = np.asarray(
        spring_forces_nbtable(jnp.asarray(positions), nb, 0.5, 10.0,
                              overflow)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.fast
def test_spring_forces_nbtable_overflow_path():
    """Power-law graph with a tiny table cap exercises the COO overflow."""
    from graphem_rapids_tpu.ops.forces import (
        build_neighbor_table,
        spring_forces_nbtable,
    )
    import graphem_rapids_tpu as gr
    import jax.numpy as jnp

    adj = gr.generate_ba(n=200, m=4, seed=0)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int64)
    rng = np.random.default_rng(0)
    positions = rng.standard_normal((200, 3)).astype(np.float32)

    expected = oracle.spring_forces_np(positions, edges, 0.5, 10.0)
    nb = build_neighbor_table(edges, 200, cap=3)  # force overflow
    assert len(nb["overflow"]) > 0
    got = np.asarray(
        spring_forces_nbtable(jnp.asarray(positions), nb, 0.5, 10.0,
                              jnp.asarray(nb["overflow"]))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.fast
def test_spring_forces_overflow_plan_parity():
    """Block-fold overflow plan == legacy segment_sum == oracle.

    The plan pads hub runs with self-pairs (exact zero force) and
    scatters only per-block partial sums (ops/forces.py
    build_overflow_plan) — the skewed-degree 1M tier's scatter fix.
    """
    from graphem_rapids_tpu.ops.forces import (
        build_neighbor_table,
        build_overflow_plan,
        spring_forces_nbtable,
    )
    import jax.numpy as jnp

    adj = gr.generate_ba(n=200, m=4, seed=0)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int64)
    rng = np.random.default_rng(0)
    positions = rng.standard_normal((200, 3)).astype(np.float32)

    expected = oracle.spring_forces_np(positions, edges, 0.5, 10.0)
    nb = build_neighbor_table(edges, 200, cap=3)  # force overflow
    plan = build_overflow_plan(nb["overflow"])
    if plan is None:  # cost model may keep legacy at this size: force it
        plan = build_overflow_plan(
            np.repeat(nb["overflow"], 50, axis=0)
        )
        assert plan is not None  # repeated hub runs must produce a plan
        plan = None
    if plan is not None:
        # padded rows are exact self-pairs
        pad = plan["pairs"][:, 0] == plan["pairs"][:, 1]
        assert pad.sum() == len(plan["pairs"]) - len(nb["overflow"])
        got = np.asarray(
            spring_forces_nbtable(
                jnp.asarray(positions), nb, 0.5, 10.0,
                overflow_plan={
                    k: (jnp.asarray(v) if k != "block" else v)
                    for k, v in plan.items()
                },
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.fast
def test_overflow_plan_matches_segment_sum():
    """Plan path == legacy scatter on a forced-overflow skewed graph."""
    from graphem_rapids_tpu.ops.forces import (
        build_neighbor_table,
        build_overflow_plan,
        spring_forces_nbtable,
    )
    import jax.numpy as jnp

    # star-heavy graph: two hubs adjacent to most of the graph
    n = 500
    rng = np.random.default_rng(1)
    e = [(0, j) for j in range(1, 400)] + [(1, j) for j in range(2, 300)]
    e += [tuple(sorted(p)) for p in rng.integers(0, n, (300, 2))
          if p[0] != p[1]]
    edges = np.unique(np.array(sorted(set(e)), np.int64), axis=0)
    positions = rng.standard_normal((n, 3)).astype(np.float32)

    nb = build_neighbor_table(edges, n, cap=8)
    assert len(nb["overflow"]) > 0
    plan = build_overflow_plan(nb["overflow"])
    assert plan is not None
    legacy = np.asarray(
        spring_forces_nbtable(jnp.asarray(positions), nb, 0.5, 10.0,
                              jnp.asarray(nb["overflow"]))
    )
    got = np.asarray(
        spring_forces_nbtable(
            jnp.asarray(positions), nb, 0.5, 10.0,
            overflow_plan={
                k: (jnp.asarray(v) if k != "block" else v)
                for k, v in plan.items()
            },
        )
    )
    np.testing.assert_allclose(got, legacy, rtol=1e-4, atol=1e-5)


@pytest.mark.fast
def test_spring_forces_parity_unsorted_scatter():
    edges, positions = _setup()
    expected = oracle.spring_forces_np(positions, edges, 0.5, 10.0)
    import jax.numpy as jnp

    got = np.asarray(
        spring_forces(jnp.asarray(positions), jnp.asarray(edges, jnp.int32),
                      0.5, 10.0, None)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.fast
@pytest.mark.parametrize("knn_fn", [knn_exact, knn_chunked])
def test_knn_parity(knn_fn):
    edges, positions = _setup()
    midpoints = (positions[edges[:, 0]] + positions[edges[:, 1]]) / 2.0
    sampled = np.arange(0, len(edges), 3)
    expected = oracle.knn_np(midpoints[sampled], midpoints, 8)
    import jax.numpy as jnp

    got, _ = knn_fn(jnp.asarray(midpoints[sampled]), jnp.asarray(midpoints), 8)
    got = np.asarray(got)
    # Compare neighbor SETS per row (tie order may differ across engines);
    # distances of the selected neighbors must match exactly as multisets.
    d2 = ((midpoints[sampled][:, None] - midpoints[None]) ** 2).sum(-1)
    exp_d = np.sort(np.take_along_axis(d2, expected, axis=1), axis=1)
    got_d = np.sort(np.take_along_axis(d2, got, axis=1), axis=1)
    np.testing.assert_allclose(got_d, exp_d, rtol=1e-4, atol=1e-6)


@pytest.mark.fast
def test_intersection_forces_parity():
    edges, positions = _setup()
    midpoints = (positions[edges[:, 0]] + positions[edges[:, 1]]) / 2.0
    rng = np.random.default_rng(1)
    sampled = rng.permutation(len(edges))[:128]
    knn_idx = oracle.knn_np(midpoints[sampled], midpoints, 16)[:, 1:]
    expected = oracle.intersection_forces_np(
        positions, edges, knn_idx, sampled, 0.1
    )
    import jax.numpy as jnp

    got = np.asarray(
        intersection_forces(
            jnp.asarray(positions), jnp.asarray(edges, jnp.int32),
            jnp.asarray(knn_idx, jnp.int32), jnp.asarray(sampled, jnp.int32),
            0.1,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.fast
def test_full_step_parity():
    """One full update step, injected sample, engine vs oracle."""
    adj = gr.erdos_renyi_graph(300, 0.03, seed=0)
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=7, verbose=False, sample_size=128,
        **PARAMS,
    )
    edges = emb._edges_np
    positions = emb.positions.copy()

    rng = np.random.default_rng(3)
    sampled = rng.permutation(len(edges))[:128]

    expected = oracle.update_step_np(
        positions.astype(np.float64), edges, sampled, **PARAMS
    )
    emb.update_positions(sample_indices=sampled)
    got = emb.positions

    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


@pytest.mark.fast
def test_multi_step_parity():
    """Five sequential steps with injected samples stay allclose."""
    adj = gr.generate_random_regular(n=200, d=4, seed=0)
    emb = gr.GraphEmbedderTPU(
        adj, n_components=2, seed=7, verbose=False, sample_size=64, **PARAMS
    )
    edges = emb._edges_np
    expected = emb.positions.astype(np.float64)

    rng = np.random.default_rng(5)
    for _ in range(5):
        sampled = rng.permutation(len(edges))[:64]
        expected = oracle.update_step_np(expected, edges, sampled, **PARAMS)
        emb.update_positions(sample_indices=sampled)

    np.testing.assert_allclose(emb.positions, expected, rtol=5e-3, atol=5e-4)


@pytest.mark.fast
@pytest.mark.parametrize("cap", [None, 3])
def test_midpoint_refs_fused_parity(cap):
    """Slot-midpoint refs from the spring gather == direct midpoints.

    The fused path (ops/forces.py midpoint_refs_from_gathered) must place
    every edge's midpoint at exactly one reference slot, bitwise equal to
    the direct (pos[e0]+pos[e1])/2 formula, with working edge<->slot maps.
    cap=3 forces table overflow (appended-refs branch).
    """
    from graphem_rapids_tpu.ops.forces import (
        REF_PAD_VALUE,
        build_neighbor_table,
        midpoint_refs_from_gathered,
    )
    import jax.numpy as jnp

    adj = gr.generate_ba(n=200, m=4, seed=0)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int64)
    rng = np.random.default_rng(0)
    positions = rng.standard_normal((200, 3)).astype(np.float32)

    nb = build_neighbor_table(edges, 200, cap=cap)
    if cap is not None:
        assert len(nb["overflow_lt"]) > 0

    p = jnp.asarray(positions)
    pn = p[nb["table"]]
    overflow_lt = (
        jnp.asarray(nb["overflow_lt"]) if len(nb["overflow_lt"]) else None
    )
    refs = np.asarray(midpoint_refs_from_gathered(p, pn, nb, overflow_lt))

    direct = (positions[edges[:, 0]] + positions[edges[:, 1]]) / 2.0
    edge_ref = np.asarray(nb["edge_ref"])
    ref_edge = np.asarray(nb["ref_edge"])

    # every edge's slot holds its midpoint, bitwise
    np.testing.assert_array_equal(refs[edge_ref], direct)
    # slot -> edge inverts edge -> slot
    np.testing.assert_array_equal(ref_edge[edge_ref], np.arange(len(edges)))
    # exactly E live refs; all others parked at the pad value
    live = refs[:, 0] < REF_PAD_VALUE
    assert live.sum() == len(edges)
    assert (refs[~live] == REF_PAD_VALUE).all()


@pytest.mark.fast
def test_knn_over_fused_refs_matches_direct():
    """kNN over slot refs, mapped to edge ids, == kNN over direct midpoints."""
    from graphem_rapids_tpu.ops.forces import (
        build_neighbor_table,
        midpoint_refs_from_gathered,
    )
    from graphem_rapids_tpu.ops.knn import knn_exact
    import jax.numpy as jnp

    edges, positions = _setup()
    nb = build_neighbor_table(edges, positions.shape[0])
    p = jnp.asarray(positions)
    pn = p[nb["table"]]
    overflow_lt = (
        jnp.asarray(nb["overflow_lt"]) if len(nb["overflow_lt"]) else None
    )
    refs = midpoint_refs_from_gathered(p, pn, nb, overflow_lt)

    midpoints = (positions[edges[:, 0]] + positions[edges[:, 1]]) / 2.0
    sampled = np.arange(0, len(edges), 3)
    queries = refs[nb["edge_ref"][jnp.asarray(sampled)]]

    slot_idx, slot_d = knn_exact(queries, refs, 8)
    fused_eids = np.asarray(nb["ref_edge"])[np.asarray(slot_idx)]
    direct_idx, direct_d = knn_exact(
        jnp.asarray(midpoints[sampled]), jnp.asarray(midpoints), 8
    )
    # neighbor distance multisets must agree exactly (tie order may differ)
    np.testing.assert_allclose(
        np.sort(np.asarray(slot_d), axis=1),
        np.sort(np.asarray(direct_d), axis=1),
        rtol=1e-5, atol=1e-7,
    )
    # and where distances are unique, the edge ids agree
    d2 = ((midpoints[sampled][:, None] - midpoints[None]) ** 2).sum(-1)
    for r in range(0, len(sampled), 7):
        row = np.sort(d2[r])
        if len(np.unique(np.round(row[:9], 10))) == 9:  # no ties in top-9
            assert set(fused_eids[r]) == set(np.asarray(direct_idx)[r])


@pytest.mark.fast
@pytest.mark.multichip
def test_sharded_full_step_oracle_parity():
    """The SHARDED step driven layer-by-layer with injected samples
    (ShardedGraphEmbedder._raw_step via update_positions) matches the
    numpy oracle — the same gate the single-chip engine passes, now on
    the 4-device mesh."""
    from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh

    adj = gr.erdos_renyi_graph(300, 0.03, seed=0)
    emb = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(4), seed=7, verbose=False,
        sample_size=128, **PARAMS,
    )
    edges = emb._edges_np
    positions = emb.positions.copy()

    rng = np.random.default_rng(3)
    sampled = rng.permutation(len(edges))[:128]

    expected = oracle.update_step_np(
        positions.astype(np.float64), edges, sampled, **PARAMS
    )
    emb.update_positions(sample_indices=sampled)
    np.testing.assert_allclose(emb.positions, expected, rtol=1e-3,
                               atol=1e-4)


@pytest.mark.fast
@pytest.mark.multichip
def test_sharded_multi_step_oracle_parity_binned():
    """Five injected-sample steps of the BINNED sharded tier vs the
    oracle: the user->internal edge_map translation and the
    bucket-row-sharded gathers must preserve reference semantics."""
    from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh
    import scipy.sparse as sp

    # skewed degrees so the binned plan has >1 bucket
    rng0 = np.random.default_rng(0)
    star = np.column_stack([np.zeros(60, np.int64),
                            np.arange(1, 61, dtype=np.int64)])
    rand = rng0.integers(0, 200, (300, 2)).astype(np.int64)
    rand = rand[rand[:, 0] != rand[:, 1]]
    e = np.concatenate([star, rand])
    adj = sp.coo_matrix(
        (np.ones(len(e), np.float32), (e[:, 0], e[:, 1])), shape=(200, 200)
    )
    adj = ((adj + adj.T) > 0).astype(np.float32).tocsr()

    emb = ShardedGraphEmbedder(
        adj, n_components=2, mesh=make_mesh(4), seed=7, verbose=False,
        sample_size=64, binned_table=True, **PARAMS,
    )
    edges = emb._edges_np
    expected = emb.positions.astype(np.float64)

    rng = np.random.default_rng(5)
    for _ in range(3):
        sampled = rng.permutation(len(edges))[:64]
        expected = oracle.update_step_np(expected, edges, sampled, **PARAMS)
        emb.update_positions(sample_indices=sampled)

    np.testing.assert_allclose(emb.positions, expected, rtol=5e-3,
                               atol=5e-4)
