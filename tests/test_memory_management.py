"""Memory-management tests (mirror of reference
tests/test_memory_management.py: chunk-size bounds/monotonicity, context
manager, decorator, requirement recommendations)."""

import pytest

from graphem_rapids_tpu.utils.memory_management import (
    MemoryManager,
    adaptive_batch_size,
    check_memory_requirements,
    cleanup_device_memory,
    get_device_memory_info,
    get_optimal_chunk_size,
    monitor_memory_usage,
)


@pytest.mark.fast
class TestChunkSize:
    def test_bounds(self):
        for strategy in ("auto", "chunked", "pallas"):
            c = get_optimal_chunk_size(10_000, 3, strategy=strategy)
            assert 1024 <= c <= 65536
            assert c % 128 == 0

    def test_pallas_fits_vmem_budget(self):
        c = get_optimal_chunk_size(1_000_000, 3, strategy="pallas",
                                   sample_size=1024)
        # (sample x chunk) fp32 distance block within the ~16 MiB/core
        # VMEM budget (double-buffered)
        assert 1024 * c * 4 * 2 <= 2 * 16 * 1024**2

    def test_larger_sample_smaller_chunk(self):
        a = get_optimal_chunk_size(10**6, 3, strategy="pallas",
                                   sample_size=256)
        b = get_optimal_chunk_size(10**6, 3, strategy="pallas",
                                   sample_size=4096)
        assert a >= b


@pytest.mark.fast
class TestMemoryInfo:
    def test_info_shape(self):
        info = get_device_memory_info()
        assert set(info) == {"bytes_in_use", "bytes_limit", "bytes_free"}

    def test_cleanup_runs(self):
        cleanup_device_memory()  # must not raise


@pytest.mark.fast
class TestMonitoring:
    def test_decorator_passthrough(self):
        @monitor_memory_usage
        def f(x):
            return x + 1

        assert f(1) == 2
        assert f.__name__ == "f"

    def test_context_manager(self):
        with MemoryManager() as mm:
            pass
        assert mm.before is not None
        assert mm.after is not None

    def test_context_manager_cleanup(self):
        with MemoryManager(cleanup_on_exit=True):
            pass  # must not raise

    def test_context_manager_propagates_exceptions(self):
        with pytest.raises(RuntimeError):
            with MemoryManager():
                raise RuntimeError("boom")


@pytest.mark.fast
class TestAdaptiveBatch:
    def test_respects_floor_and_cap(self):
        assert adaptive_batch_size(10**9, 4) <= 1 << 20
        assert adaptive_batch_size(10**9, 10**12) >= 1024

    def test_respects_n_items(self):
        assert adaptive_batch_size(2048, 4) == 2048


@pytest.mark.fast
class TestRequirements:
    def test_small_graph_sufficient(self):
        r = check_memory_requirements(1000, 3)
        assert r["sufficient"]
        assert r["required_gb"] < r["available_gb"]

    def test_huge_graph_recommends_tiering(self):
        r = check_memory_requirements(200_000_000, 16, sample_size=4096)
        assert r["recommendation"] in (
            "sharded", "auto_chunked", "pallas_chunked", "chunked_chunked",
        )
