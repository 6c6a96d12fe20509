"""Tests for the fused Pallas bin-fold kNN strategy (ops/knn_binfold.py).

Off-TPU the kernel runs in pallas interpret mode — the same kernel logic
the TPU executes, minus Mosaic lowering — so correctness (bin-min folding,
index bookkeeping, padding, phase-2 top-k) is fully exercised on the CPU
suite; only the Mosaic compile itself needs the TPU (covered by the
engine's probe on real hardware).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from graphem_rapids_tpu.ops.knn import knn, knn_exact
from graphem_rapids_tpu.ops import knn_binfold as bf


def _structural_recall(k, bins):
    return math.prod(1 - i / bins for i in range(k))


@pytest.mark.fast
@pytest.mark.parametrize(
    "S,E,d,k,T,G",
    [
        (64, 5000, 3, 8, 256, 4),
        (32, 1000, 2, 5, 128, 3),
        (16, 300, 4, 17, 128, 2),
        (64, 9001, 3, 8, 256, 4),  # ragged E across supertiles
        (7, 500, 3, 4, 128, 2),    # S not a sublane multiple
    ],
)
def test_binfold_matches_exact(S, E, d, k, T, G):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(S, d)).astype(np.float32) * 10
    r = rng.normal(size=(E, d)).astype(np.float32) * 10
    ei, _ = knn_exact(jnp.asarray(q), jnp.asarray(r), k)
    bi, bv = bf.knn_binfold(jnp.asarray(q), jnp.asarray(r), k, T=T, G=G)
    assert bi.shape == (S, k) and bv.shape == (S, k)
    ei, bi, bv = np.asarray(ei), np.asarray(bi), np.asarray(bv)

    # returned distances are the true squared distances of returned ids
    true_d = ((q[:, None, :] - r[bi]) ** 2).sum(-1)
    np.testing.assert_allclose(bv, true_d, rtol=1e-4, atol=1e-4)
    # ids are in range and unique per row
    assert (bi >= 0).all() and (bi < E).all()
    for s in range(S):
        assert len(set(bi[s])) == k
    # recall against exact within the structural bin model (with slack)
    bins = min(G, -(-E // T)) * 128
    recall = np.mean([len(set(ei[s]) & set(bi[s])) / k for s in range(S)])
    assert recall >= _structural_recall(k, bins) - 0.1


@pytest.mark.fast
def test_binfold_via_strategy_dispatch():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(2000, 3)).astype(np.float32))
    bi, bv = knn(q, r, 6, strategy="binfold")
    ei, _ = knn_exact(q, r, 6)
    recall = np.mean([
        len(set(np.asarray(ei)[s]) & set(np.asarray(bi)[s])) / 6
        for s in range(32)
    ])
    assert recall > 0.85


@pytest.mark.fast
def test_params_for_scales_bins_with_k():
    T1, G1 = bf.params_for(10, 0.95)
    T2, G2 = bf.params_for(40, 0.95)
    assert G2 >= G1
    # tighter recall target -> at least as many bins
    _, G3 = bf.params_for(40, 0.99)
    assert G3 >= G2
    # clamps
    assert 24 <= G1 <= 64 and 24 <= G3 <= 64
    # default workload: k=17 at 0.95 keeps the measured G=24 layout
    assert bf.params_for(17, 0.95) == (2048, 24)


@pytest.mark.fast
def test_binfold_k_exceeding_bins_raises():
    q = jnp.zeros((8, 3), jnp.float32)
    r = jnp.zeros((300, 3), jnp.float32)
    with pytest.raises(ValueError, match="bins"):
        bf.knn_binfold(q, r, 24 * 128 + 1)


@pytest.mark.fast
def test_binfold_max_refs_raises():
    q = jnp.zeros((8, 3), jnp.float32)

    class FakeRefs:
        shape = (bf.MAX_REFS_SEGMENTED + 1, 3)

    with pytest.raises(ValueError, match="references"):
        bf.knn_binfold(q, FakeRefs(), 5)


@pytest.mark.fast
def test_binfold_segments_merge_matches_exact():
    """The segmented path (E > MAX_REFS in production, exercised here
    with a small forced segment size) must return globally-indexed
    neighbors whose recall matches the single-kernel structural model."""
    rng = np.random.default_rng(4)
    S, E, d, k = 16, 2000, 3, 10
    q = jnp.asarray(rng.standard_normal((S, d)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((E, d)), jnp.float32)

    idx, vals = bf._binfold_segments(
        q, r, k, 128, 4, S, seg=512, n_seg=4, interpret=True
    )
    idx = np.asarray(idx)
    vals = np.asarray(vals)
    assert idx.shape == (S, k) and (idx >= 0).all() and (idx < E).all()
    # returned distances are the true squared distances of the returned ids
    d2 = np.asarray(
        ((np.asarray(q)[:, None, :] - np.asarray(r)[idx]) ** 2).sum(-1)
    )
    np.testing.assert_allclose(vals, d2, rtol=1e-4, atol=1e-5)
    # rows are sorted ascending (exact top-k merge)
    assert (np.diff(vals, axis=1) >= -1e-6).all()

    ei, _ = knn_exact(q, r, k)
    ei = np.asarray(ei)
    recall = np.mean([len(set(ei[s]) & set(idx[s])) / k for s in range(S)])
    # 4 segments x 512 bins: structural recall per segment, merged exactly
    assert recall >= _structural_recall(k, 512) - 0.1


@pytest.mark.fast
def test_probe_caches_and_succeeds_off_tpu():
    bf._probe_cache.clear()
    assert bf.probe(3, 16, 5) is True  # interpret mode off-TPU
    assert len(bf._probe_cache) == 1
    assert bf.probe(3, 16, 5) is True  # cached, no recompile
    assert len(bf._probe_cache) == 1


@pytest.mark.fast
def test_engine_runs_with_binfold_strategy():
    import graphem_rapids_tpu as gr

    adj = gr.erdos_renyi_graph(80, 0.1, seed=0)
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, knn_strategy="binfold", seed=3, verbose=False
    )
    pos = emb.run_layout(3)
    assert pos.shape == (80, 3)
    assert np.isfinite(pos).all()


@pytest.mark.fast
def test_auto_rule_prefers_binfold_on_tpu(monkeypatch):
    """The auto tier picks binfold on TPU (gates + probe), approx when a
    gate fails, without needing TPU hardware (probe stubbed)."""
    import graphem_rapids_tpu as gr

    adj = gr.erdos_renyi_graph(200, 0.1, seed=0)
    emb = gr.GraphEmbedderTPU(adj, verbose=False, seed=0)

    class FakeDev:
        platform = "tpu"

    monkeypatch.setattr(emb, "device", FakeDev())
    monkeypatch.setattr(emb, "n_edges", 100_000)  # past the exact tier
    monkeypatch.setattr(bf, "probe", lambda *a, **kw: True)
    assert emb._resolved_strategy() == "binfold"

    # probe failure tiers down to approx (PyKeOps-probe pattern)
    monkeypatch.setattr(bf, "probe", lambda *a, **kw: False)
    assert emb._resolved_strategy() == "approx"

    # dimensionality gate
    monkeypatch.setattr(bf, "probe", lambda *a, **kw: True)
    monkeypatch.setattr(emb, "n_components", bf.MAX_DIM + 1)
    assert emb._resolved_strategy() == "approx"
