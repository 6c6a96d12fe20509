"""Profiling utility tests."""

import jax.numpy as jnp
import pytest

from graphem_rapids_tpu.utils.profiling import roofline, time_fn


@pytest.mark.fast
def test_time_fn_measures():
    def f(x):
        return x * 2.0

    t = time_fn(f, jnp.ones((128, 128)), reps=3, warmup=1)
    assert t > 0


@pytest.mark.fast
def test_roofline_classification():
    # 1 TFLOP in 0.1s with tiny bytes -> compute-ish fractions computed
    r = roofline("matmul", 0.1, flops=1e12, bytes_accessed=1e6)
    assert r["achieved_tflops"] == pytest.approx(10.0)
    assert r["bound"] == "compute"
    r2 = roofline("copy", 0.1, flops=1e6, bytes_accessed=80e9)
    assert r2["bound"] == "memory"
    assert r2["achieved_gbps"] == pytest.approx(800.0)
