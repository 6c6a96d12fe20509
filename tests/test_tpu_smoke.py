"""Real-TPU smoke tests (reference's `gpu` marker analog, SURVEY.md §4).

These run ONLY when a TPU is attached (`pytest -m tpu` outside the
CPU-forced conftest — e.g. via scripts/run_comprehensive_tests.py --phases
tpu with JAX_PLATFORMS unset). Under the default CPU-mesh conftest they
skip.
"""

import numpy as np
import pytest

import jax

requires_tpu = pytest.mark.skipif(
    not any(d.platform == "tpu" for d in jax.devices()),
    reason="no TPU attached (tests force the CPU mesh by default)",
)

pytestmark = [pytest.mark.tpu, requires_tpu]


def test_layout_on_tpu():
    import graphem_rapids_tpu as gr

    adj = gr.erdos_renyi_graph(300, 0.03, seed=0)
    emb = gr.create_graphem(adj, n_components=3, seed=0, verbose=False)
    assert emb.device.platform == "tpu"
    pos = emb.run_layout(num_iterations=10)
    assert np.isfinite(pos).all()


def test_pallas_kernel_compiles_on_tpu():
    from graphem_rapids_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(0)
    q = rng.standard_normal((64, 3)).astype(np.float32)
    r = rng.standard_normal((5000, 3)).astype(np.float32)
    idx, vals = knn_pallas(q, r, 8)
    d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
    want = np.sort(d2, axis=1)[:, :8]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-4, atol=1e-5)
