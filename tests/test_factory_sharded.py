"""Factory routing to the sharded tier + mesh helpers."""

import numpy as np
import pytest

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, default_mesh, make_mesh


@pytest.mark.fast
@pytest.mark.multichip
def test_factory_sharded_backend():
    adj = gr.erdos_renyi_graph(120, 0.05, seed=0)
    emb = gr.create_graphem(adj, n_components=2, backend="sharded",
                            seed=0, verbose=False, sample_size=32)
    assert isinstance(emb, ShardedGraphEmbedder)
    pos = emb.run_layout(num_iterations=3)
    assert np.isfinite(pos).all()


@pytest.mark.fast
@pytest.mark.multichip
def test_factory_sharded_custom_mesh():
    adj = gr.erdos_renyi_graph(80, 0.08, seed=0)
    emb = gr.create_graphem(adj, backend="sharded", mesh=make_mesh(2),
                            seed=0, verbose=False, sample_size=16)
    assert emb._n_mesh_devices == 2
    emb.update_positions()
    assert np.isfinite(emb.positions).all()


@pytest.mark.fast
def test_mesh_helpers():
    import jax

    m = default_mesh()
    assert sum(m.shape.values()) == jax.device_count()
    m2 = make_mesh(4)
    assert list(m2.shape.values()) == [4]


@pytest.mark.fast
@pytest.mark.multichip
def test_sharded_checkpoint_roundtrip(tmp_path):
    adj = gr.erdos_renyi_graph(100, 0.06, seed=0)
    emb = ShardedGraphEmbedder(adj, mesh=make_mesh(4), seed=1,
                               verbose=False, sample_size=32)
    emb.run_layout(num_iterations=2)
    ckpt = tmp_path / "s.npz"
    emb.save_checkpoint(ckpt)
    emb2 = ShardedGraphEmbedder(adj, mesh=make_mesh(4), seed=9,
                                verbose=False, sample_size=32)
    emb2.load_checkpoint(ckpt)
    np.testing.assert_allclose(emb2.positions, emb.positions)


@pytest.mark.fast
@pytest.mark.multichip
def test_sharded_sample_injection_works():
    """Sample injection (the layer-by-layer parity hook) is supported on
    single-process meshes — tests/test_oracle_parity.py drives the full
    oracle gate through it; here just the plumbing contract."""
    adj = gr.erdos_renyi_graph(60, 0.1, seed=0)
    emb = ShardedGraphEmbedder(adj, mesh=make_mesh(2), seed=0,
                               verbose=False, sample_size=16)
    emb.update_positions(sample_indices=np.arange(16))
    assert np.isfinite(np.asarray(emb.positions)).all()
