"""Sampling helper tests."""

import jax
import numpy as np
import pytest

from graphem_rapids_tpu.ops.sampling import FAST_SAMPLE_MIN_EDGES, sample_indices


@pytest.mark.fast
def test_small_path_no_replacement():
    idx = np.asarray(sample_indices(jax.random.PRNGKey(0), 1000, 100))
    assert len(idx) == 100
    assert len(set(idx.tolist())) == 100
    assert idx.min() >= 0 and idx.max() < 1000


@pytest.mark.fast
def test_all_items_when_sample_exceeds():
    idx = np.asarray(sample_indices(jax.random.PRNGKey(0), 50, 100))
    assert idx.tolist() == list(range(50))


@pytest.mark.fast
def test_fast_path_no_replacement_and_uniform_marginals():
    E = FAST_SAMPLE_MIN_EDGES
    S = 256
    counts = np.zeros(4)  # quartile histogram
    for seed in range(8):
        idx = np.asarray(sample_indices(jax.random.PRNGKey(seed), E, S))
        assert len(set(idx.tolist())) == S  # distinct
        assert idx.min() >= 0 and idx.max() < E
        counts += np.histogram(idx, bins=4, range=(0, E))[0]
    # roughly uniform across quartiles (8*256/4 = 512 expected per bin)
    assert counts.min() > 512 * 0.7
    assert counts.max() < 512 * 1.3


@pytest.mark.fast
def test_different_keys_differ():
    E = FAST_SAMPLE_MIN_EDGES
    a = np.asarray(sample_indices(jax.random.PRNGKey(1), E, 64))
    b = np.asarray(sample_indices(jax.random.PRNGKey(2), E, 64))
    assert not np.array_equal(a, b)
