"""Visualization module tests (stats always available; plotly gated)."""

import numpy as np
import pytest

import graphem_rapids_tpu as gr
from graphem_rapids_tpu import visualization as viz


@pytest.mark.fast
def test_report_corr_values():
    rng = np.random.default_rng(0)
    x = rng.random(200)
    rho, p = gr.report_corr("self", x, x, reps=20, seed=0)
    assert rho == pytest.approx(1.0)
    rho2, _ = gr.report_corr("anti", x, -x, reps=20, seed=0)
    assert rho2 == pytest.approx(-1.0)


@pytest.mark.fast
def test_report_corr_handles_noise():
    rng = np.random.default_rng(0)
    rho, p = gr.report_corr("noise", rng.random(200), rng.random(200),
                            reps=20, seed=0)
    assert abs(rho) < 0.3


@pytest.mark.fast
def test_plot_functions_gated_without_plotly():
    if viz._PLOTLY_AVAILABLE:
        pytest.skip("plotly installed; gating not exercised")
    with pytest.raises(ImportError, match="plotly"):
        gr.plot_radial_vs_centrality(np.ones(3), [np.ones(3)], ["x"])
    with pytest.raises(ImportError, match="plotly"):
        viz.plot_layout(np.zeros((3, 2)), np.array([[0, 1]]))


@pytest.mark.fast
def test_plot_layout_dim_validation():
    if viz._PLOTLY_AVAILABLE:
        with pytest.raises(ValueError, match="2D or 3D"):
            viz.plot_layout(np.zeros((3, 5)), np.array([[0, 1]]))
    else:
        with pytest.raises(ImportError):
            viz.plot_layout(np.zeros((3, 5)), np.array([[0, 1]]))


@pytest.mark.fast
def test_display_benchmark_results_column_order():
    df = gr.display_benchmark_results(
        [{"m": 1, "n": 2, "graph_type": "g", "extra": 9}]
    )
    assert list(df.columns)[:3] == ["graph_type", "n", "m"]
