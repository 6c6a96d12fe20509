"""Profiling / tracing utilities (SURVEY.md §5.1).

The reference exposes cProfile / line_profiler / torch.profiler modes in
its benchmark CLI (benchmarks/run_benchmarks.py:990-1065 there). The TPU
equivalents here:

- ``time_fn``        : block_until_ready wall-clock harness (median of N)
- ``trace``          : jax.profiler trace context (Perfetto / XProf /
                       TensorBoard readable)
- ``roofline``       : achieved FLOP/s + bytes/s against per-chip peaks —
                       the BASELINE "speed-of-light per chip" bookkeeping
"""

import contextlib
import time

import jax
import numpy as np

# Per-chip peaks used for roofline fractions. TPU v5e: 197 TFLOP/s bf16
# (~49 TFLOP/s fp32 via MXU), 819 GB/s HBM bandwidth.
CHIP_PEAKS = {
    "tpu v5 lite": {"flops_bf16": 197e12, "flops_f32": 49e12,
                    "hbm_bytes_per_s": 819e9},
    "default": {"flops_bf16": 197e12, "flops_f32": 49e12,
                "hbm_bytes_per_s": 819e9},
}


def _chip_peaks():
    kind = "default"
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover
        pass
    return CHIP_PEAKS.get(kind, CHIP_PEAKS["default"])


def time_fn(fn, *args, reps=10, warmup=2, **kwargs):
    """Median wall-clock seconds of ``fn(*args)`` with device completion.

    Each rep blocks on the result, so dispatch pipelining cannot hide
    device time (the jax.block_until_ready timing-harness pattern).
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace context; view with XProf/TensorBoard/Perfetto."""
    with jax.profiler.trace(str(log_dir)):
        yield


def roofline(name, seconds, flops=0, bytes_accessed=0, dtype="f32"):
    """Achieved rates and peak fractions for a timed kernel.

    Returns dict with achieved_tflops, achieved_gbps, flops_fraction,
    bandwidth_fraction, bound ('compute' | 'memory').
    """
    peaks = _chip_peaks()
    peak_flops = peaks["flops_bf16"] if dtype == "bf16" else peaks["flops_f32"]
    achieved_flops = flops / seconds if seconds > 0 else 0.0
    achieved_bw = bytes_accessed / seconds if seconds > 0 else 0.0
    f_frac = achieved_flops / peak_flops
    b_frac = achieved_bw / peaks["hbm_bytes_per_s"]
    return {
        "name": name,
        "seconds": seconds,
        "achieved_tflops": achieved_flops / 1e12,
        "achieved_gbps": achieved_bw / 1e9,
        "flops_fraction": f_frac,
        "bandwidth_fraction": b_frac,
        "bound": "compute" if f_frac >= b_frac else "memory",
    }
