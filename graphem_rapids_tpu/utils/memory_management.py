"""Memory management for TPU execution.

The reference sizes its kNN chunks from LIVE GPU free-memory queries
(graphem_rapids/utils/memory_management.py:45-114,
backends/embedder_pytorch.py:260-322) because CUDA memory is dynamic. Under
XLA everything inside jit is compiled against STATIC shapes, so here chunk
sizes are derived once from static HBM/VMEM budgets (SURVEY.md §7.2 M3);
live stats are used only for observability (the decorator / context
manager), mirroring the reference's @monitor_memory_usage and MemoryManager
UX (memory_management.py:131-208).
"""

import functools
import gc
import logging
import time

import jax

logger = logging.getLogger(__name__)

# Static per-chip budgets (bytes). Conservative defaults: TPU v5e has 16 GiB
# HBM and ~16 MiB VMEM per core (pallas_guide memory hierarchy; the same
# figure parallel/ring_binfold.py budgets its resident buffers against);
# CPU hosts get a 4 GiB working budget.
HBM_BUDGET = {"tpu": 16 * 1024**3, "cpu": 4 * 1024**3}
VMEM_BUDGET = 16 * 1024**2

# Fraction of the HBM budget a single kNN distance block may use.
KNN_BLOCK_FRACTION = 0.25


def get_device_memory_info(device=None):
    """Live memory stats for a device, if the platform exposes them.

    Returns dict with 'bytes_in_use', 'bytes_limit', 'bytes_free' (None when
    unavailable, e.g. on CPU).
    """
    if device is None:
        device = jax.devices()[0]
    stats = None
    try:
        stats = device.memory_stats()
    except Exception:  # pragma: no cover - platform-dependent
        stats = None
    if not stats:
        return {"bytes_in_use": None, "bytes_limit": None, "bytes_free": None}
    in_use = stats.get("bytes_in_use")
    limit = stats.get("bytes_limit")
    free = limit - in_use if (limit is not None and in_use is not None) else None
    return {"bytes_in_use": in_use, "bytes_limit": limit, "bytes_free": free}


def _platform_budget(device=None):
    if device is None:
        device = jax.devices()[0]
    info = get_device_memory_info(device)
    if info["bytes_limit"]:
        return info["bytes_limit"]
    return HBM_BUDGET.get(device.platform, HBM_BUDGET["cpu"])


def get_optimal_chunk_size(n_vertices, n_components, strategy="auto",
                           sample_size=1024, device=None, dtype_bytes=4):
    """Reference-tile width for chunked/Pallas kNN from static budgets.

    A distance block is (sample_size x chunk) floats; we cap it at
    KNN_BLOCK_FRACTION of the HBM budget and keep the Pallas tile within
    VMEM. Floors/caps mirror the reference's bounds
    (memory_management.py:96-111) but are computed once, statically.
    """
    budget = _platform_budget(device)
    max_block = int(budget * KNN_BLOCK_FRACTION)
    chunk = max_block // max(sample_size * dtype_bytes, 1)

    if strategy == "pallas":
        # Pallas tiles live in VMEM: (sample x tile) f32 distance block plus
        # double-buffered (d x tile) reference blocks.
        vmem_cap = VMEM_BUDGET // max(sample_size * dtype_bytes * 2, 1)
        chunk = min(chunk, vmem_cap)

    # Lane alignment and sane bounds.
    chunk = max(1024, min(chunk, 65536))
    chunk = (chunk // 128) * 128
    return chunk


def cleanup_device_memory():
    """Drop cached host references and collect garbage.

    XLA owns device allocation; unlike torch.cuda.empty_cache there is no
    allocator cache to flush — releasing array references is what frees HBM.
    """
    gc.collect()


def monitor_memory_usage(func):
    """Decorator logging live device-memory delta around a call
    (reference memory_management.py:131-167)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        before = get_device_memory_info()["bytes_in_use"]
        start = time.perf_counter()
        result = func(*args, **kwargs)
        elapsed = time.perf_counter() - start
        after = get_device_memory_info()["bytes_in_use"]
        if before is not None and after is not None:
            logger.debug(
                "%s: %.1f MiB -> %.1f MiB (delta %+.1f MiB) in %.3fs",
                func.__name__, before / 1024**2, after / 1024**2,
                (after - before) / 1024**2, elapsed,
            )
        return result

    return wrapper


class MemoryManager:
    """Context manager recording before/after device memory
    (reference memory_management.py:170-208)."""

    def __init__(self, cleanup_on_exit=False, device=None):
        self.cleanup_on_exit = cleanup_on_exit
        self.device = device
        self.before = None
        self.after = None

    def __enter__(self):
        self.before = get_device_memory_info(self.device)
        return self

    def __exit__(self, exc_type, exc, tb):
        self.after = get_device_memory_info(self.device)
        if self.cleanup_on_exit:
            cleanup_device_memory()
        if (
            self.before["bytes_in_use"] is not None
            and self.after["bytes_in_use"] is not None
        ):
            logger.debug(
                "MemoryManager: %+.1f MiB",
                (self.after["bytes_in_use"] - self.before["bytes_in_use"])
                / 1024**2,
            )
        return False


def adaptive_batch_size(n_items, item_bytes, device=None, fraction=0.3,
                        floor=1024, cap=1 << 20):
    """Largest batch of ``item_bytes``-sized items within a budget fraction
    (reference memory_management.py:211-249)."""
    budget = _platform_budget(device)
    batch = int(budget * fraction) // max(item_bytes, 1)
    return max(floor, min(batch, cap, n_items))


def check_memory_requirements(n_vertices, n_components, strategy="auto",
                              sample_size=1024, device=None):
    """Estimate footprint and recommend an execution tier
    (reference memory_management.py:252-308).

    Returns dict with required_gb, available_gb, sufficient, recommendation
    in {'<strategy>', '<strategy>_chunked', 'sharded'}.
    """
    # positions + forces + edge gathers (~5 position-sized buffers) plus one
    # distance block.
    pos_bytes = n_vertices * n_components * 4
    avg_degree_guess = 8
    edge_bytes = n_vertices * avg_degree_guess * (2 * 4 + n_components * 4)
    block_bytes = sample_size * get_optimal_chunk_size(
        n_vertices, n_components, strategy, sample_size, device
    ) * 4
    required = 5 * pos_bytes + edge_bytes + block_bytes

    budget = _platform_budget(device)
    sufficient = required < budget * 0.8
    if sufficient:
        recommendation = strategy if strategy != "auto" else "single_chip"
    elif required < budget:
        recommendation = f"{strategy}_chunked"
    else:
        recommendation = "sharded"
    return {
        "required_gb": required / 1024**3,
        "available_gb": budget / 1024**3,
        "sufficient": sufficient,
        "recommendation": recommendation,
    }
