"""kNN strategy tests: exact / chunked / approx / pallas consistency.

Mirror of the reference kNN-backend tests
(tests/test_pytorch_backend.py:408-558) reshaped for kernel strategies on
one engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphem_rapids_tpu.ops.knn import (
    knn,
    knn_approx,
    knn_chunked,
    knn_exact,
    squared_distances,
)
from graphem_rapids_tpu.ops.knn_pallas import knn_pallas


def _points(n_q=64, n_r=1500, d=3, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n_q, d)).astype(np.float32)
    r = rng.standard_normal((n_r, d)).astype(np.float32)
    return q, r


def _brute(q, r, k):
    d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
    return np.sort(d2, axis=1)[:, :k]


@pytest.mark.fast
def test_squared_distances_matches_numpy():
    q, r = _points(16, 64)
    got = np.asarray(squared_distances(jnp.asarray(q), jnp.asarray(r)))
    want = ((q[:, None] - r[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.fast
def test_squared_distances_matmul_path():
    q, r = _points(16, 64, d=32)
    got = np.asarray(squared_distances(jnp.asarray(q), jnp.asarray(r)))
    want = ((q[:, None] - r[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.fast
@pytest.mark.parametrize("fn", [knn_exact, knn_chunked])
def test_exact_strategies_match_brute_force(fn):
    q, r = _points()
    k = 10
    idx, vals = fn(jnp.asarray(q), jnp.asarray(r), k)
    np.testing.assert_allclose(
        np.sort(np.asarray(vals), axis=1), _brute(q, r, k),
        rtol=1e-4, atol=1e-5,
    )
    # Returned indices must actually point at those distances.
    d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
    picked = np.take_along_axis(d2, np.asarray(idx), axis=1)
    np.testing.assert_allclose(
        np.sort(picked, axis=1), _brute(q, r, k), rtol=1e-4, atol=1e-5
    )


@pytest.mark.fast
def test_chunked_with_ragged_tail():
    q, r = _points(n_r=1000)
    idx_a, vals_a = knn_chunked(jnp.asarray(q), jnp.asarray(r), 7,
                                chunk_size=333)
    np.testing.assert_allclose(
        np.sort(np.asarray(vals_a), axis=1), _brute(q, r, 7),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.fast
def test_approx_recall():
    q, r = _points(n_q=32, n_r=4096)
    k = 10
    idx, _ = knn_approx(jnp.asarray(q), jnp.asarray(r), k, chunk_size=1024)
    d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
    true_idx = np.argsort(d2, axis=1)[:, :k]
    recall = np.mean(
        [
            len(set(np.asarray(idx)[i]) & set(true_idx[i])) / k
            for i in range(len(q))
        ]
    )
    assert recall >= 0.9, f"approx_min_k recall too low: {recall}"


@pytest.mark.fast
def test_small_budget_forces_scan_path(monkeypatch):
    """A tiny HBM budget must route knn_approx off the one-shot (S, E)
    buffer onto the blockwise scan (VERDICT r1 #6) — and the derived
    budget must come from the device, not a hardcoded constant."""
    import importlib

    # ops/__init__ re-exports a `knn` FUNCTION that shadows the submodule
    # on attribute access; resolve the module itself explicitly.
    knn_mod = importlib.import_module("graphem_rapids_tpu.ops.knn")

    q, r = _points(n_q=32, n_r=4096)
    k = 10

    calls = {"scan": 0, "oneshot": 0}
    real_scan, real_oneshot = knn_mod._knn_scanned, knn_mod._oneshot_approx

    def spy_scan(*a, **kw):
        calls["scan"] += 1
        return real_scan(*a, **kw)

    def spy_oneshot(*a, **kw):
        calls["oneshot"] += 1
        return real_oneshot(*a, **kw)

    monkeypatch.setattr(knn_mod, "_knn_scanned", spy_scan)
    monkeypatch.setattr(knn_mod, "_oneshot_approx", spy_oneshot)

    monkeypatch.setattr(knn_mod, "ONESHOT_BUDGET_OVERRIDE", 1024)
    idx, _ = knn_approx(jnp.asarray(q), jnp.asarray(r), k)
    assert calls == {"scan": 1, "oneshot": 0}
    assert idx.shape == (32, k)

    monkeypatch.setattr(knn_mod, "ONESHOT_BUDGET_OVERRIDE", None)
    assert knn_mod.oneshot_budget_bytes() > 32 * 4096 * 4
    knn_approx(jnp.asarray(q), jnp.asarray(r), k)
    assert calls["oneshot"] == 1


@pytest.mark.fast
def test_pallas_kernel_matches_brute_force():
    q, r = _points(n_q=16, n_r=700, d=3)
    k = 9
    idx, vals = knn_pallas(jnp.asarray(q), jnp.asarray(r), k, tile=256)
    np.testing.assert_allclose(
        np.asarray(vals), _brute(q, r, k), rtol=1e-4, atol=1e-5
    )
    d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
    picked = np.take_along_axis(d2, np.asarray(idx), axis=1)
    np.testing.assert_allclose(picked, _brute(q, r, k), rtol=1e-4, atol=1e-5)


@pytest.mark.fast
def test_pallas_kernel_small_ref_set():
    q, r = _points(n_q=8, n_r=100, d=2)
    idx, vals = knn_pallas(jnp.asarray(q), jnp.asarray(r), 5)
    np.testing.assert_allclose(
        np.asarray(vals), _brute(q, r, 5), rtol=1e-4, atol=1e-5
    )


@pytest.mark.fast
def test_strategy_dispatch():
    q, r = _points(n_q=8, n_r=256)
    for strategy in ("auto", "exact", "chunked", "approx"):
        idx, vals = knn(jnp.asarray(q), jnp.asarray(r), 5, strategy=strategy)
        assert idx.shape == (8, 5)
    with pytest.raises(ValueError):
        knn(jnp.asarray(q), jnp.asarray(r), 5, strategy="nope")


@pytest.mark.fast
def test_auto_routes_cpu_hosts_to_exact_scan(monkeypatch):
    """'auto' above EXACT_MAX_REFS must match the engine's CPU tiering:
    the exact blockwise scan, never 'approx' (approx_min_k has no fast
    CPU lowering — models/embedder.py _resolved_strategy)."""
    import importlib

    knn_mod = importlib.import_module("graphem_rapids_tpu.ops.knn")

    assert jax.devices()[0].platform == "cpu"
    routed = []
    real = knn_mod.knn_chunked

    def spy(q, r, k, chunk_size=knn_mod.DEFAULT_CHUNK):
        routed.append("chunked")
        return real(q, r, k, chunk_size)

    monkeypatch.setattr(knn_mod, "knn_chunked", spy)
    monkeypatch.setattr(
        knn_mod, "knn_approx",
        lambda *a, **k: routed.append("approx") or (None, None),
    )
    q, r = _points(n_q=4, n_r=knn_mod.EXACT_MAX_REFS + 128)
    idx, _ = knn_mod.knn(jnp.asarray(q), jnp.asarray(r), 3, strategy="auto")
    assert routed == ["chunked"]
    assert idx.shape == (4, 3)
