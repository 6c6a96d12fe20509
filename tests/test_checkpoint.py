"""Checkpoint/resume tests (new capability; SURVEY.md §5.4)."""

import numpy as np
import pytest

import graphem_rapids_tpu as gr


@pytest.mark.fast
def test_checkpoint_roundtrip(tmp_path):
    adj = gr.erdos_renyi_graph(60, 0.1, seed=0)
    emb = gr.GraphEmbedderTPU(adj, seed=5, verbose=False)
    emb.run_layout(num_iterations=4)
    ckpt = tmp_path / "state.npz"
    emb.save_checkpoint(ckpt)

    emb2 = gr.GraphEmbedderTPU(adj, seed=999, verbose=False)
    emb2.load_checkpoint(ckpt)
    np.testing.assert_allclose(emb2.positions, emb.positions)
    assert emb2._iteration == emb._iteration


@pytest.mark.fast
def test_checkpoint_resume_continues_identically(tmp_path):
    """Resume from a checkpoint reproduces the uninterrupted trajectory
    (positions AND RNG stream restored)."""
    adj = gr.erdos_renyi_graph(60, 0.1, seed=0)
    full = gr.GraphEmbedderTPU(adj, seed=5, verbose=False)
    full.run_layout(num_iterations=3, block_size=1)
    ckpt_state = full.positions.copy()
    full.run_layout(num_iterations=3, block_size=1)
    expected = full.positions

    resumed = gr.GraphEmbedderTPU(adj, seed=5, verbose=False)
    resumed.run_layout(num_iterations=3, block_size=1)
    ckpt = tmp_path / "mid.npz"
    resumed.save_checkpoint(ckpt)
    np.testing.assert_allclose(resumed.positions, ckpt_state)

    fresh = gr.GraphEmbedderTPU(adj, seed=0, verbose=False)
    fresh.load_checkpoint(ckpt)
    fresh.run_layout(num_iterations=3, block_size=1)
    np.testing.assert_allclose(fresh.positions, expected, rtol=1e-5,
                               atol=1e-6)


@pytest.mark.fast
def test_checkpoint_shape_mismatch_raises(tmp_path):
    adj = gr.erdos_renyi_graph(60, 0.1, seed=0)
    emb = gr.GraphEmbedderTPU(adj, seed=0, verbose=False)
    ckpt = tmp_path / "state.npz"
    emb.save_checkpoint(ckpt)

    other = gr.GraphEmbedderTPU(gr.erdos_renyi_graph(50, 0.1, seed=0),
                                verbose=False)
    with pytest.raises(ValueError, match="mismatch"):
        other.load_checkpoint(ckpt)

    other_dim = gr.GraphEmbedderTPU(adj, n_components=3, verbose=False)
    with pytest.raises(ValueError, match="n_components"):
        other_dim.load_checkpoint(ckpt)
