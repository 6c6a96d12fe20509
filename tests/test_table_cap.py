"""Unit tests for the neighbor-table cap cost model and overflow plan.

The cap model (ops/forces.py _optimal_table_cap) replaces the reference's
live-GPU-memory chunk heuristics (reference embedder_pytorch.py:260-322)
with a compile-time plan: static shapes are a TPU requirement, so the
width is chosen once per graph from its degree histogram.
"""

import numpy as np
import pytest

from graphem_rapids_tpu.ops.forces import (
    _optimal_table_cap,
    build_neighbor_table,
    build_overflow_plan,
)


def _cost(deg, n, C):
    """Reference cost: gather rows + overflow rows + pad + scatter."""
    O = int(np.maximum(deg - C, 0).sum())
    H = int((deg > C).sum())
    return n * C + O + 64 * H + 14 * (O // 128 + H)


@pytest.mark.fast
def test_cap_regular_graph_full_width():
    """d-regular graph: no overflow is ever worth it; cap == d."""
    deg = np.full(1000, 8)
    assert _optimal_table_cap(deg, 1000) == 8


@pytest.mark.fast
def test_cap_star_graph_small():
    """One hub with huge degree, everyone else degree 1: padding every
    row to the hub's width would cost n*deg_max gathers; the model must
    spill the hub instead."""
    deg = np.ones(10_000, np.int64)
    deg[0] = 9_999
    cap = _optimal_table_cap(deg, 10_000)
    assert cap < 64


@pytest.mark.fast
def test_cap_is_argmin_of_reference_cost():
    """The vectorized histogram computation must agree with the direct
    per-candidate cost on random degree distributions."""
    rng = np.random.default_rng(0)
    for dist in (
        rng.poisson(8, 5000),
        np.minimum(rng.zipf(1.7, 5000), 4000),
        rng.integers(1, 40, 5000),
    ):
        deg = np.maximum(dist, 0)
        n = len(deg)
        cap = _optimal_table_cap(deg, n)
        hi = int(min(deg.max(), 1024))
        costs = [_cost(deg, n, C) for C in range(1, hi + 1)]
        assert _cost(deg, n, cap) == min(costs)


@pytest.mark.fast
def test_cap_respects_max_cap():
    deg = np.full(10, 5000)
    assert _optimal_table_cap(deg, 10, max_cap=1024) <= 1024


@pytest.mark.fast
def test_overflow_plan_none_when_empty():
    assert build_overflow_plan(np.zeros((0, 2), np.int32)) is None


@pytest.mark.fast
def test_overflow_plan_blocks_cover_all_pairs():
    """Every original pair appears exactly once; pads are self-pairs."""
    rng = np.random.default_rng(1)
    hubs = np.repeat([3, 7, 42], [500, 300, 130])
    nbrs = rng.integers(0, 1000, hubs.shape)
    overflow = np.stack([hubs, nbrs], axis=1).astype(np.int32)
    plan = build_overflow_plan(overflow)
    assert plan is not None
    pairs = plan["pairs"]
    B = plan["block"]
    assert len(pairs) % B == 0
    assert len(plan["block_hub"]) == len(pairs) // B
    pad = pairs[:, 0] == pairs[:, 1]
    real = pairs[~pad]
    assert len(real) == len(overflow)
    got = real[np.lexsort((real[:, 1], real[:, 0]))]
    want = overflow[np.lexsort((overflow[:, 1], overflow[:, 0]))]
    np.testing.assert_array_equal(got, want)
    # every block's rows belong to the block's hub
    hub_of_row = np.repeat(plan["hub_ids"][plan["block_hub"]], B)
    np.testing.assert_array_equal(pairs[:, 0], hub_of_row)


@pytest.mark.fast
def test_overflow_plan_skipped_when_scatter_cheaper():
    """Thousands of distinct single-pair hubs: folding buys nothing, the
    plan must stay None so callers keep the plain segment_sum."""
    overflow = np.stack(
        [np.arange(5000), np.arange(5000) + 1], axis=1
    ).astype(np.int32)
    assert build_overflow_plan(overflow) is None


@pytest.mark.fast
def test_build_neighbor_table_attaches_plan():
    rng = np.random.default_rng(2)
    e = [(0, j) for j in range(1, 400)]
    e += [(min(a, b), max(a, b))
          for a, b in rng.integers(0, 500, (800, 2)) if a != b]
    edges = np.unique(np.array(sorted(set(e)), np.int64), axis=0)
    nb = build_neighbor_table(edges, 500)
    assert nb["overflow_plan"] is not None or len(nb["overflow"]) == 0
