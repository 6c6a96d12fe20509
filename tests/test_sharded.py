"""Multi-chip tests on the virtual 8-device CPU mesh.

The reference has nothing distributed to test (SURVEY.md §2.4); these are
the new-capability tests: sharded step correctness vs the single-chip
engine (1-vs-N allclose, BASELINE.md) and mesh-size robustness.
"""

import jax
import numpy as np
import pytest

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.parallel import (
    ShardedGraphEmbedder,
    build_sharded_step,
    make_mesh,
)
from graphem_rapids_tpu.parallel.sharded_step import pad_edges

pytestmark = pytest.mark.multichip


@pytest.mark.fast
def test_cpu_mesh_has_8_devices():
    assert jax.device_count() >= 8


@pytest.mark.fast
@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_layout_runs_and_is_finite(n_devices):
    adj = gr.erdos_renyi_graph(150, 0.05, seed=0)
    mesh = make_mesh(n_devices)
    emb = ShardedGraphEmbedder(
        adj, n_components=3, mesh=mesh, seed=1, verbose=False,
        sample_size=64,
    )
    pos = emb.run_layout(num_iterations=5)
    assert pos.shape == (150, 3)
    assert np.isfinite(pos).all()


@pytest.mark.fast
def test_sharded_matches_single_chip_spring_only():
    """With k_inter=0 (no sampling randomness in the force), the sharded
    and single-chip engines must produce allclose trajectories."""
    adj = gr.generate_random_regular(n=120, d=4, seed=0)

    single = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=5, verbose=False, k_inter=0.0,
        sample_size=32,
    )
    sharded = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(4), seed=5, verbose=False,
        k_inter=0.0, sample_size=32,
    )
    # identical spectral init
    np.testing.assert_allclose(single.positions, sharded.positions,
                               rtol=1e-5, atol=1e-6)
    for _ in range(5):
        single.update_positions()
        sharded.update_positions()
    np.testing.assert_allclose(
        sharded.positions, single.positions, rtol=1e-3, atol=1e-4
    )


@pytest.mark.fast
def test_sharded_full_step_parity_with_oracle_sample():
    """Full sharded step (springs + intersections) vs single-chip engine
    with the SAME key stream: identical seeds give identical samples, so
    trajectories must stay allclose."""
    adj = gr.erdos_renyi_graph(100, 0.08, seed=2)
    single = gr.GraphEmbedderTPU(
        adj, n_components=2, seed=9, verbose=False, sample_size=48,
        n_neighbors=6,
    )
    sharded = ShardedGraphEmbedder(
        adj, n_components=2, mesh=make_mesh(4), seed=9, verbose=False,
        sample_size=48, n_neighbors=6,
    )
    for _ in range(3):
        single.update_positions()
        sharded.update_positions()
    np.testing.assert_allclose(
        sharded.positions, single.positions, rtol=5e-3, atol=5e-4
    )


@pytest.mark.fast
def test_pad_edges():
    edges = np.array([[0, 1], [1, 2], [2, 3]], np.int64)
    padded, valid = pad_edges(edges, 4)
    assert padded.shape == (4, 2)
    assert valid.tolist() == [1.0, 1.0, 1.0, 0.0]
    padded, valid = pad_edges(edges, 3)
    assert padded.shape == (3, 2)


@pytest.mark.fast
def test_build_sharded_step_smoke():
    adj = gr.generate_ba(n=80, m=2, seed=1)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]])
    mesh = make_mesh(8)
    step, multi, ops = build_sharded_step(
        mesh, 80, len(edges), n_components=3, k_attr=0.2, L_min=1.0,
        k_inter=0.5, n_neighbors=5, sample_size=32,
    )
    import jax.numpy as jnp

    edges_p, valid = pad_edges(edges, 8)
    pos = jnp.asarray(
        np.random.default_rng(0).standard_normal((80, 3)), jnp.float32
    )
    key = jax.random.PRNGKey(0)
    new_pos, key = step(
        pos, jnp.asarray(edges_p), jnp.asarray(valid), key, ops
    )
    assert np.isfinite(np.asarray(new_pos)).all()
    # step/multi DONATE positions and key: continue from the outputs
    # (reusing `pos` here would be a use-after-donate)
    (new_pos2, _) = multi(
        new_pos, jnp.asarray(edges_p), jnp.asarray(valid), key, ops,
        num_steps=3,
    )
    assert np.isfinite(np.asarray(new_pos2)).all()


@pytest.mark.fast
def test_build_sharded_step_approx_local_branch():
    """The approx_min_k local-top-k branch (auto only on TPU meshes)
    stays finite and selects plausible neighbors when forced on a CPU
    mesh, including the lane-padding path (E_loc not a 128 multiple)."""
    adj = gr.generate_random_regular(n=120, d=6, seed=2)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]])
    mesh = make_mesh(4)
    from graphem_rapids_tpu.ops.forces import build_neighbor_table

    nb = build_neighbor_table(edges.astype(np.int64), 120)
    step, multi, ops = build_sharded_step(
        mesh, 120, len(edges), n_components=3, k_attr=0.2, L_min=1.0,
        k_inter=0.5, n_neighbors=5, sample_size=16, nb=nb,
        use_approx_local=True,
    )
    import jax.numpy as jnp

    edges_p, valid = pad_edges(edges, 4)
    pos = jnp.asarray(
        np.random.default_rng(0).standard_normal((120, 3)), jnp.float32
    )
    key = jax.random.PRNGKey(0)
    new_pos, _ = multi(
        pos, jnp.asarray(edges_p), jnp.asarray(valid), key, ops,
        num_steps=3,
    )
    assert np.isfinite(np.asarray(new_pos)).all()


@pytest.mark.fast
def test_sharded_fused_refs_with_approx_local():
    """The PRODUCTION TPU-mesh program shape — fused slot-midpoint refs
    AND the approx_min_k local top-k (both auto only on TPU meshes) —
    must compile and stay finite when forced on the CPU mesh, covering
    the fused R_loc lane-padding path (SL+O2 not a 128 multiple)."""
    adj = gr.generate_random_regular(n=120, d=6, seed=2)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]])
    mesh = make_mesh(4)
    from graphem_rapids_tpu.ops.forces import build_neighbor_table

    nb = build_neighbor_table(edges.astype(np.int64), 120)
    step, multi, ops = build_sharded_step(
        mesh, 120, len(edges), n_components=3, k_attr=0.2, L_min=1.0,
        k_inter=0.5, n_neighbors=5, sample_size=16, nb=nb,
        use_approx_local=True, fused_refs=True,
    )
    assert "ref_valid_pad" in ops
    import jax.numpy as jnp

    edges_p, valid = pad_edges(edges, 4)
    pos = jnp.asarray(
        np.random.default_rng(0).standard_normal((120, 3)), jnp.float32
    )
    key = jax.random.PRNGKey(0)
    new_pos, _ = multi(
        pos, jnp.asarray(edges_p), jnp.asarray(valid), key, ops,
        num_steps=3,
    )
    assert np.isfinite(np.asarray(new_pos)).all()


@pytest.mark.fast
def test_sharded_overflow_plan_matches_single_chip():
    """Skewed graph where the table cap spills hub rows into the
    block-fold overflow plan (ops/forces.py build_overflow_plan): the
    sharded step applies the same plan replicated per device, so the
    trajectory must match the single-chip engine."""
    import scipy.sparse as sp

    n = 300
    rng = np.random.default_rng(3)
    e = [(0, j) for j in range(1, 250)] + [(1, j) for j in range(2, 180)]
    e += [(min(a, b), max(a, b))
          for a, b in rng.integers(0, n, (500, 2)) if a != b]
    e = np.unique(np.array(sorted(set(e)), np.int64), axis=0)
    adj = sp.coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n)
    ).tocsr()
    adj = adj + adj.T
    adj.data[:] = 1

    single = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=11, verbose=False, sample_size=64,
        n_neighbors=5,
    )
    sharded = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(4), seed=11, verbose=False,
        sample_size=64, n_neighbors=5,
    )
    assert single._nb.get("overflow_plan") is not None
    assert "ov_plan" in sharded._step_ops
    for _ in range(3):
        single.update_positions()
        sharded.update_positions()
    np.testing.assert_allclose(
        sharded.positions, single.positions, rtol=5e-3, atol=5e-4
    )


@pytest.mark.fast
def test_sharded_fused_refs_matches_single_chip():
    """Fused kNN refs (slot midpoints from the sharded table gather,
    forced on for the CPU mesh) must reproduce the single-chip
    trajectory: the candidate set is the same edges, midpoints bitwise
    equal to the direct (p1+p2)/2 formula."""
    adj = gr.erdos_renyi_graph(100, 0.08, seed=2)
    # binned_table=False pins the single-chip engine to the sharded
    # tier's (flat) edge numbering: the per-iteration edge sample is
    # drawn by index, so engines with different internal numberings are
    # different (both valid) stochastic runs, not comparable pointwise
    single = gr.GraphEmbedderTPU(
        adj, n_components=2, seed=9, verbose=False, sample_size=48,
        n_neighbors=6, binned_table=False,
    )
    fused = ShardedGraphEmbedder(
        adj, n_components=2, mesh=make_mesh(4), seed=9, verbose=False,
        sample_size=48, n_neighbors=6, fused_midpoints=True,
    )
    assert fused._fused_refs_active
    for _ in range(3):
        single.update_positions()
        fused.update_positions()
    np.testing.assert_allclose(
        fused.positions, single.positions, rtol=5e-3, atol=5e-4
    )


@pytest.mark.fast
def test_sharded_fused_refs_hub_stress():
    """Larger skewed graph (5K vertices, 1200-degree hub): the fused
    sharded trajectory must be exact against the flat single-chip
    engine across uneven device spans, ref-cap packing, and the
    device-0 overflow block together."""
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n = 5000
    e = [(0, j) for j in range(1, 1200)] + [(1, j) for j in range(2, 400)]
    e += [(min(a, b), max(a, b))
          for a, b in rng.integers(0, n, (12000, 2)) if a != b]
    e = np.unique(np.array(sorted(set(e)), np.int64), axis=0)
    adj = sp.coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n)
    ).tocsr()
    adj = adj + adj.T
    adj.data[:] = 1

    single = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=7, verbose=False, sample_size=256,
        n_neighbors=8, binned_table=False,
    )
    fused = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(8), seed=7, verbose=False,
        sample_size=256, n_neighbors=8, fused_midpoints=True,
        binned_table=False,  # this test pins the FLAT fused path on
        # both sides (the sharded default now auto-bins like the
        # single-chip engine; binned-vs-binned parity is covered by
        # test_sharded_binned_* below)
    )
    assert fused._fused_refs_active
    for _ in range(5):
        single.update_positions()
        fused.update_positions()
    np.testing.assert_allclose(
        fused.positions, single.positions, rtol=5e-3, atol=5e-4
    )


@pytest.mark.fast
def test_sharded_fused_refs_with_overflow_refs():
    """Hub graph whose i<j degree exceeds the ref_cap prefix: fused refs
    must route the overflow midpoints through the device-0 block and
    still match the single-chip engine."""
    import scipy.sparse as sp

    n = 200
    rng = np.random.default_rng(7)
    e = [(0, j) for j in range(1, 160)]
    e += [(min(a, b), max(a, b))
          for a, b in rng.integers(0, n, (400, 2)) if a != b]
    e = np.unique(np.array(sorted(set(e)), np.int64), axis=0)
    adj = sp.coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n)
    ).tocsr()
    adj = adj + adj.T
    adj.data[:] = 1

    single = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=13, verbose=False, sample_size=64,
        n_neighbors=5, binned_table=False,  # match sharded edge numbering
    )
    assert len(single._nb["overflow_lt"]) > 0  # the path under test
    fused = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(4), seed=13, verbose=False,
        sample_size=64, n_neighbors=5, fused_midpoints=True,
    )
    assert fused._fused_refs_active
    for _ in range(3):
        single.update_positions()
        fused.update_positions()
    np.testing.assert_allclose(
        fused.positions, single.positions, rtol=5e-3, atol=5e-4
    )


@pytest.mark.fast
def test_sharded_binned_matches_single_chip_binned():
    """Opt-in degree-binned sharded tables (bucket-row-sharded): the
    trajectory must be exact against the single-chip BINNED engine —
    same internal numbering, so the same sampled edges — for both the
    fused-refs and unfused kNN paths, on a hub-heavy graph exercising
    ref-cap packing and the overflow plan."""
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n = 2000
    e = [(0, j) for j in range(1, 600)] + [(1, j) for j in range(2, 200)]
    e += [(min(a, b), max(a, b))
          for a, b in rng.integers(0, n, (5000, 2)) if a != b]
    e = np.unique(np.array(sorted(set(e)), np.int64), axis=0)
    adj = sp.coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n)
    ).tocsr()
    adj = adj + adj.T
    adj.data[:] = 1

    for fused in (True, False):
        single = gr.GraphEmbedderTPU(
            adj, n_components=3, seed=7, verbose=False, sample_size=128,
            n_neighbors=6, binned_table=True, fused_midpoints=fused,
        )
        assert single._perm is not None  # binned is active
        sharded = ShardedGraphEmbedder(
            adj, n_components=3, mesh=make_mesh(8), seed=7, verbose=False,
            sample_size=128, n_neighbors=6, binned_table=True,
            fused_midpoints=fused,
        )
        assert "buckets" in sharded._nb
        assert sharded._fused_refs_active == fused
        for _ in range(4):
            single.update_positions()
            sharded.update_positions()
        np.testing.assert_allclose(
            sharded.positions, single.positions, rtol=5e-3, atol=5e-4
        )


@pytest.mark.fast
def test_sharded_binned_tiny_buckets():
    """Buckets smaller than the device count (count_g < ndev): padded
    rows and clamped dynamic_slice reads must not leak into forces or
    the ref space — exact vs the single-chip binned engine."""
    adj = gr.erdos_renyi_graph(60, 0.12, seed=6)
    single = gr.GraphEmbedderTPU(
        adj, n_components=2, seed=3, verbose=False, sample_size=32,
        n_neighbors=4, binned_table=True, fused_midpoints=True,
    )
    if single._perm is None:
        pytest.skip("bucket plan degenerated to one bucket")
    sharded = ShardedGraphEmbedder(
        adj, n_components=2, mesh=make_mesh(8), seed=3, verbose=False,
        sample_size=32, n_neighbors=4, binned_table=True,
        fused_midpoints=True,
    )
    assert any(
        b["count"] < 8 for b in sharded._nb["buckets"]
    ), "test wants at least one bucket smaller than the mesh"
    for _ in range(4):
        single.update_positions()
        sharded.update_positions()
    np.testing.assert_allclose(
        sharded.positions, single.positions, rtol=5e-3, atol=5e-4
    )


@pytest.mark.fast
def test_ring_matches_all_gather_unfused():
    """knn_comm='ring' (query-shard + carry rotation via ppermute) must
    reproduce the all_gather merge exactly on the f32 CPU mesh — the
    two-key (distance, ref index) sort selects the same neighbor set
    whenever distances are tie-free."""
    adj = gr.erdos_renyi_graph(100, 0.08, seed=2)
    kw = dict(n_components=2, seed=9, verbose=False, sample_size=48,
              n_neighbors=6)
    gather = ShardedGraphEmbedder(adj, mesh=make_mesh(4), **kw)
    ring = ShardedGraphEmbedder(adj, mesh=make_mesh(4), knn_comm="ring",
                                **kw)
    for _ in range(4):
        gather.update_positions()
        ring.update_positions()
    np.testing.assert_array_equal(ring.positions, gather.positions)


@pytest.mark.fast
def test_ring_matches_all_gather_fused_refs():
    """Ring merge over the fused slot-midpoint ref space (global padded
    ref indices span per-device vertex-major segments + the device-0
    overflow block) must match the all_gather merge exactly."""
    import scipy.sparse as sp

    n = 200
    rng = np.random.default_rng(7)
    e = [(0, j) for j in range(1, 160)]
    e += [(min(a, b), max(a, b))
          for a, b in rng.integers(0, n, (400, 2)) if a != b]
    e = np.unique(np.array(sorted(set(e)), np.int64), axis=0)
    adj = sp.coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n)
    ).tocsr()
    adj = adj + adj.T
    adj.data[:] = 1

    kw = dict(n_components=3, seed=13, verbose=False, sample_size=64,
              n_neighbors=5, fused_midpoints=True)
    gather = ShardedGraphEmbedder(adj, mesh=make_mesh(4), **kw)
    ring = ShardedGraphEmbedder(adj, mesh=make_mesh(4), knn_comm="ring",
                                **kw)
    assert gather._fused_refs_active and ring._fused_refs_active
    for _ in range(3):
        gather.update_positions()
        ring.update_positions()
    np.testing.assert_array_equal(ring.positions, gather.positions)


@pytest.mark.fast
def test_ring_matches_all_gather_binned():
    """Ring merge over the bucket-row-sharded binned ref space (per-
    bucket segment maps) must match the all_gather merge exactly."""
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n = 2000
    e = [(0, j) for j in range(1, 600)] + [(1, j) for j in range(2, 200)]
    e += [(min(a, b), max(a, b))
          for a, b in rng.integers(0, n, (5000, 2)) if a != b]
    e = np.unique(np.array(sorted(set(e)), np.int64), axis=0)
    adj = sp.coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n)
    ).tocsr()
    adj = adj + adj.T
    adj.data[:] = 1

    kw = dict(n_components=3, seed=7, verbose=False, sample_size=128,
              n_neighbors=6, binned_table=True, fused_midpoints=True)
    gather = ShardedGraphEmbedder(adj, mesh=make_mesh(8), **kw)
    ring = ShardedGraphEmbedder(adj, mesh=make_mesh(8), knn_comm="ring",
                                **kw)
    assert gather._fused_refs_active and ring._fused_refs_active
    for _ in range(3):
        gather.update_positions()
        ring.update_positions()
    np.testing.assert_array_equal(ring.positions, gather.positions)


@pytest.mark.fast
def test_ring_query_pad_path():
    """sample_size not divisible by the mesh: the padded 1e30 query rows
    must be sliced off without polluting real rows — exact vs
    all_gather, and exact vs a mesh size that divides S."""
    adj = gr.generate_random_regular(n=120, d=6, seed=2)
    kw = dict(n_components=3, seed=4, verbose=False, sample_size=50,
              n_neighbors=5)
    gather = ShardedGraphEmbedder(adj, mesh=make_mesh(8), **kw)
    ring = ShardedGraphEmbedder(adj, mesh=make_mesh(8), knn_comm="ring",
                                **kw)
    for _ in range(4):
        gather.update_positions()
        ring.update_positions()
    np.testing.assert_array_equal(ring.positions, gather.positions)


@pytest.mark.fast
def test_ring_matches_single_chip():
    """End-to-end: ring-comm sharded trajectory vs the single-chip
    engine (same seed => same sampled edges) stays allclose."""
    adj = gr.erdos_renyi_graph(100, 0.08, seed=2)
    single = gr.GraphEmbedderTPU(
        adj, n_components=2, seed=9, verbose=False, sample_size=48,
        n_neighbors=6,
    )
    ring = ShardedGraphEmbedder(
        adj, n_components=2, mesh=make_mesh(4), seed=9, verbose=False,
        sample_size=48, n_neighbors=6, knn_comm="ring",
    )
    for _ in range(3):
        single.update_positions()
        ring.update_positions()
    np.testing.assert_allclose(
        ring.positions, single.positions, rtol=5e-3, atol=5e-4
    )


@pytest.mark.fast
@pytest.mark.parametrize("flat", [False, True])
def test_sharded_slot_order_matches_single_chip(flat):
    """Slot-major sharded tier (round 4: transposed tables column-
    sharded, per-slot gathers + fold, slot-major ref enumeration) must
    reproduce the single-chip slot engine's trajectory on a hub graph
    exercising the overflow machinery — for both the binned and flat
    table structures."""
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n = 300
    e = [(0, j) for j in range(1, 250)] + [(1, j) for j in range(2, 180)]
    e += [(min(a, b), max(a, b))
          for a, b in rng.integers(0, n, (500, 2)) if a != b]
    e = np.unique(np.array(sorted(set(e)), np.int64), axis=0)
    adj = sp.coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n)
    ).tocsr()
    adj = adj + adj.T
    adj.data[:] = 1

    kw = dict(n_components=3, seed=11, verbose=False, sample_size=64,
              n_neighbors=5, ref_order="slot", binned_table=not flat,
              fused_midpoints=True)
    single = gr.GraphEmbedderTPU(adj, **kw)
    shard = ShardedGraphEmbedder(adj, mesh=make_mesh(4), **kw)
    assert single._nb.get("ref_order") == "slot"
    assert shard._fused_refs_active
    for _ in range(3):
        single.update_positions()
        shard.update_positions()
    np.testing.assert_allclose(
        shard.positions, single.positions, rtol=5e-3, atol=5e-4
    )


@pytest.mark.fast
def test_sharded_slot_ring_matches_all_gather():
    """Ring merge over the slot-major ref enumeration (div/mod
    to_global segments) must match the all_gather merge bitwise."""
    adj = gr.erdos_renyi_graph(200, 0.06, seed=5)
    kw = dict(n_components=3, seed=7, verbose=False, sample_size=64,
              n_neighbors=5, ref_order="slot", binned_table=True,
              fused_midpoints=True)
    gather = ShardedGraphEmbedder(adj, mesh=make_mesh(4), **kw)
    ring = ShardedGraphEmbedder(adj, mesh=make_mesh(4), knn_comm="ring",
                                **kw)
    for _ in range(4):
        gather.update_positions()
        ring.update_positions()
    np.testing.assert_array_equal(ring.positions, gather.positions)


@pytest.mark.fast
def test_sharded_slot_ring_pallas_runs():
    """Slot-major refs composed with the RDMA bin ring (TPU-interpret
    mode on the CPU mesh): the kernel consumes the (R_loc, d) ref tile
    layout-agnostically, but the combination must compile and stay
    finite."""
    adj = gr.erdos_renyi_graph(120, 0.08, seed=4)
    emb = ShardedGraphEmbedder(
        adj, n_components=2, mesh=make_mesh(4), seed=6, verbose=False,
        sample_size=32, n_neighbors=4, ref_order="slot",
        fused_midpoints=True, knn_comm="ring_pallas",
    )
    emb.update_positions()
    assert np.isfinite(np.asarray(emb.positions)).all()


@pytest.mark.fast
@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_slot_mesh_sizes(n_devices):
    """Slot-major sharding at non-dividing mesh sizes: the column pads
    (index start_g / 0) and the [:count] all_gather slices must keep
    trajectories equal to the single-chip slot engine."""
    adj = gr.generate_ba(n=150, m=3, seed=2)
    kw = dict(n_components=2, seed=3, verbose=False, sample_size=48,
              n_neighbors=4, ref_order="slot", fused_midpoints=True)
    single = gr.GraphEmbedderTPU(adj, **kw)
    shard = ShardedGraphEmbedder(adj, mesh=make_mesh(n_devices), **kw)
    for _ in range(3):
        single.update_positions()
        shard.update_positions()
    np.testing.assert_allclose(
        shard.positions, single.positions, rtol=5e-3, atol=5e-4
    )


@pytest.mark.fast
@pytest.mark.parametrize("variant", ["unfused", "fused", "binned"])
def test_ring_matches_all_gather_200_iters_with_ties(variant):
    """Ring merge must stay bitwise-equal to the all_gather merge over a
    LONG run on a graph WITH duplicate midpoints. Twin vertices (same
    neighbor set) pinned to identical positions make every incident edge
    midpoint an exact duplicate, so kNN distance ties are guaranteed —
    the merge's tie-break then decides WHICH edge id wins, and that
    choice scatters repulsion to different endpoints (trajectory
    divergence). The ring carries the all_gather merge's (device, rank)
    column key as its tie-break key, so both tiers make the same choice.
    The fused/binned variants matter most: their to_global maps
    interleave devices in the global ref space (per-bucket segments,
    shared overflow block), so the round-3 (distance, global ref index)
    lex tie-break disagreed with all_gather's stable-top_k device order
    there (rel drift ~1.4 over 200 iters — BASELINE.md r3)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(11)
    n0 = 60
    base = sorted({(min(a, b), max(a, b))
                   for a, b in rng.integers(0, n0, (240, 2)) if a != b})
    # a hub forces a skewed degree histogram -> multi-bucket binned plan
    base = sorted(set(base) | {(0, j) for j in range(1, 40)})
    twins = list(range(20))  # vertex n0+t duplicates vertex t's edges
    e2 = list(base)
    for t, v in enumerate(twins):
        tv = n0 + t
        for a, b in base:
            if a == v:
                e2.append((min(tv, b), max(tv, b)))
            elif b == v:
                e2.append((min(tv, a), max(tv, a)))
    n = n0 + len(twins)
    e2 = np.unique(np.array(e2, np.int64), axis=0)
    adj = sp.coo_matrix(
        (np.ones(len(e2)), (e2[:, 0], e2[:, 1])), shape=(n, n)
    ).tocsr()
    adj = adj + adj.T
    adj.data[:] = 1

    kw = dict(n_components=2, seed=5, verbose=False, sample_size=64,
              n_neighbors=6)
    if variant in ("fused", "binned"):
        kw["fused_midpoints"] = True
    if variant == "binned":
        kw["binned_table"] = True
    gather = ShardedGraphEmbedder(adj, mesh=make_mesh(4), **kw)
    ring = ShardedGraphEmbedder(adj, mesh=make_mesh(4), knn_comm="ring",
                                **kw)
    if variant in ("fused", "binned"):
        assert gather._fused_refs_active and ring._fused_refs_active
    p0 = np.array(gather.positions)
    for t, v in enumerate(twins):
        p0[n0 + t] = p0[v]
    gather.positions = p0
    ring.positions = p0
    # sanity: the pinned layout really produces duplicate midpoints
    mids = (p0[e2[:, 0]] + p0[e2[:, 1]]) / 2
    assert len(np.unique(mids, axis=0)) < len(mids)
    for it in range(200):
        gather.update_positions()
        ring.update_positions()
        if it % 50 == 49:
            np.testing.assert_array_equal(
                ring.positions, gather.positions,
                err_msg=f"diverged by iteration {it + 1}",
            )


@pytest.mark.fast
def test_ring_with_approx_local():
    """Ring merge composed with the approx_min_k local top-k (the TPU
    production shape) compiles and stays finite on the CPU mesh."""
    adj = gr.generate_random_regular(n=120, d=6, seed=2)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]])
    mesh = make_mesh(4)
    step, multi, ops = build_sharded_step(
        mesh, 120, len(edges), n_components=3, k_attr=0.2, L_min=1.0,
        k_inter=0.5, n_neighbors=5, sample_size=16,
        use_approx_local=True, knn_comm="ring",
    )
    import jax.numpy as jnp

    edges_p, valid = pad_edges(edges, 4)
    pos = jnp.asarray(
        np.random.default_rng(0).standard_normal((120, 3)), jnp.float32
    )
    key = jax.random.PRNGKey(0)
    new_pos, _ = multi(
        pos, jnp.asarray(edges_p), jnp.asarray(valid), key, ops,
        num_steps=3,
    )
    assert np.isfinite(np.asarray(new_pos)).all()


# --------------------------------------------------------------------- #
# Quality gates for the PRODUCTION TPU-mesh program shape: on TPU meshes
# the sharded step auto-selects bf16 distances + approx_min_k (or the
# binfold kernel) for the local top-k (build_sharded_step knn_dtype /
# use_approx_local policy). These force that exact combination on the
# CPU mesh and bound its SEMANTICS — neighbor recall vs exact ground
# truth and trajectory/Spearman drift vs the exact path — not just
# finiteness.
# --------------------------------------------------------------------- #

def _lt_edges(adj):
    rows, cols = adj.nonzero()
    mask = rows < cols
    return np.column_stack([rows[mask], cols[mask]]).astype(np.int64)


@pytest.mark.fast
@pytest.mark.parametrize("shape_kw", [
    pytest.param({}, id="unfused"),
    pytest.param({"fused_refs": True}, id="fused"),
    pytest.param({"fused_refs": True, "use_binfold_local": True},
                 id="fused-binfold"),
    pytest.param({"knn_comm": "ring"}, id="ring"),
])
def test_tpu_mesh_shape_knn_recall(shape_kw):
    """Forced bf16 + approx local top-k (every production variant) must
    recover the exact k nearest edge midpoints at high recall."""
    import jax.numpy as jnp

    from graphem_rapids_tpu.ops.forces import build_neighbor_table

    n, k, S = 600, 8, 128
    adj = gr.generate_random_regular(n=n, d=8, seed=3)
    edges = _lt_edges(adj)
    E = len(edges)
    mesh = make_mesh(4)
    kw = dict(shape_kw)
    if kw.get("fused_refs"):
        kw["nb"] = build_neighbor_table(edges, n)
    step, _, ops = build_sharded_step(
        mesh, n, E, n_components=3, k_attr=0.2, L_min=1.0, k_inter=0.5,
        n_neighbors=k, sample_size=S, use_approx_local=True,
        knn_dtype=jnp.bfloat16, _debug_knn=True, **kw,
    )
    pos = np.random.default_rng(1).standard_normal((n, 3)).astype(
        np.float32
    )
    edges_p, valid = pad_edges(edges, 4)
    (knn_idx, sampled), _ = step(
        jnp.asarray(pos), jnp.asarray(edges_p), jnp.asarray(valid),
        jax.random.PRNGKey(0), ops,
    )
    knn_idx, sampled = np.asarray(knn_idx), np.asarray(sampled)

    mids = (pos[edges[:, 0]] + pos[edges[:, 1]]) / 2.0
    d2 = (
        (mids[sampled][:, None, :] - mids[None, :, :]) ** 2
    ).sum(-1)
    order = np.argsort(d2, axis=1)[:, :k + 2]
    recalls = [
        len(set(sel) & set([j for j in row if j != s][:k])) / k
        for sel, row, s in zip(knn_idx, order, sampled)
    ]
    # measured (experiments/probe_bf16_recall.py): mean 0.994+, min 0.875
    # — bf16 rounding flips only near-ties
    assert np.mean(recalls) >= 0.97, np.mean(recalls)
    assert np.min(recalls) >= 0.75, np.min(recalls)


@pytest.mark.fast
def test_tpu_mesh_shape_trajectory_quality():
    """30 steps of the forced bf16 + approx + fused-refs shape vs the
    exact path: bounded position drift and Spearman(radius, degree)
    within noise of exact."""
    import jax.numpy as jnp
    from scipy.stats import spearmanr

    from graphem_rapids_tpu.ops.forces import build_neighbor_table

    n, k, S = 600, 8, 128
    adj = gr.erdos_renyi_graph(n=n, p=0.02, seed=5)
    edges = _lt_edges(adj)
    E = len(edges)
    deg = np.asarray(adj.sum(axis=1)).ravel()
    mesh = make_mesh(4)
    nb = build_neighbor_table(edges, n)
    pos0 = np.random.default_rng(1).standard_normal((n, 3)).astype(
        np.float32
    )
    edges_p, valid = pad_edges(edges, 4)

    def run(kw):
        _, multi, ops = build_sharded_step(
            mesh, n, E, n_components=3, k_attr=0.5, L_min=10.0,
            k_inter=0.1, n_neighbors=k, sample_size=S, **kw,
        )
        pos, _ = multi(
            jnp.asarray(pos0), jnp.asarray(edges_p), jnp.asarray(valid),
            jax.random.PRNGKey(0), ops, num_steps=30,
        )
        pos = np.asarray(pos)
        radius = np.linalg.norm(pos - pos.mean(0), axis=1)
        return pos, spearmanr(radius, deg).statistic

    p_exact, rho_exact = run(dict(use_approx_local=False, knn_dtype=None))
    p_forced, rho_forced = run(dict(
        use_approx_local=True, knn_dtype=jnp.bfloat16, fused_refs=True,
        nb=nb,
    ))
    assert np.isfinite(p_forced).all()
    rel = np.linalg.norm(p_forced - p_exact) / np.linalg.norm(p_exact)
    # measured drift 1e-4 / relpos 0.5% (experiments/probe_bf16_traj.py)
    assert abs(rho_exact - rho_forced) < 0.02, (rho_exact, rho_forced)
    assert rho_forced > 0.9, rho_forced
    assert rel < 0.05, rel


@pytest.mark.fast
@pytest.mark.parametrize("n_devices", [4, 8])
def test_all_to_all_merge_matches_all_gather(n_devices):
    """knn_comm='all_to_all' (query-sharded merge) must be BITWISE equal
    to the all_gather merge: same candidate pool per query in the same
    (device, rank) order, exact top-k either way — including when S does
    not divide the mesh (query pad rows)."""
    adj = gr.erdos_renyi_graph(300, 0.04, seed=2)
    base = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(n_devices), seed=5,
        verbose=False, sample_size=100, n_neighbors=6,
    )
    a2a = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(n_devices), seed=5,
        verbose=False, sample_size=100, n_neighbors=6,
        knn_comm="all_to_all",
    )
    for _ in range(3):
        base.update_positions()
        a2a.update_positions()
    np.testing.assert_array_equal(a2a.positions, base.positions)


@pytest.mark.fast
def test_all_to_all_merge_fused_refs():
    """all_to_all merge composed with fused slot-midpoint refs."""
    adj = gr.generate_random_regular(n=120, d=6, seed=2)
    base = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(4), seed=5, verbose=False,
        sample_size=32, n_neighbors=5, fused_midpoints=True,
    )
    a2a = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(4), seed=5, verbose=False,
        sample_size=32, n_neighbors=5, fused_midpoints=True,
        knn_comm="all_to_all",
    )
    for _ in range(3):
        base.update_positions()
        a2a.update_positions()
    np.testing.assert_array_equal(a2a.positions, base.positions)


@pytest.mark.fast
@pytest.mark.parametrize("variant", ["flat", "binned"])
def test_packed_gather_sharded_matches_plain(variant):
    """packed_gather=True reproduces the plain sharded slot trajectory
    (the one-hot packed select is value-identical; see ops/forces.py
    packed_take). Covers both slot spring branches on a 4-device mesh."""
    adj = gr.generate_ba(n=400, m=4, seed=6)
    kw = dict(n_components=3, seed=5, verbose=False, sample_size=64,
              n_neighbors=6, ref_order="slot", fused_midpoints=True)
    if variant == "binned":
        kw["binned_table"] = True
    got = {}
    for packed in (False, True):
        emb = ShardedGraphEmbedder(
            adj, mesh=make_mesh(4), packed_gather=packed, **kw
        )
        # two injected steps: enough to traverse both spring branches
        # and the fused ref path; more iterations amplify one-ulp
        # fusion-rounding differences through the chaotic map (the
        # packed select itself is value-identical — the 1-step bound
        # below is what pins it)
        for t in range(2):
            sampled = np.sort(np.random.default_rng(300 + t).choice(
                emb.n_edges, size=64, replace=False,
            ))
            emb.update_positions(sample_indices=sampled)
        got[packed] = np.asarray(emb.positions)
    np.testing.assert_allclose(
        got[True], got[False], rtol=2e-5, atol=1e-6
    )
