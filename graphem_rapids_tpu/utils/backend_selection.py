"""Execution-strategy ("backend") selection.

The reference picks among {pytorch-cuda, pytorch-cpu, cuvs} external
libraries (graphem_rapids/utils/backend_selection.py:142-206). The TPU
framework has ONE engine, so this layer selects a kernel strategy + device
tier on that engine (SURVEY.md §7.1.2) while keeping the reference's
BackendConfig / env-var UX:

- 'exact'   : dense XLA kNN (small graphs)
- 'chunked' : blockwise scan kNN (large graphs, CPU hosts)
- 'approx'  : TPU PartialReduce approx-kNN (very large graphs)
- 'pallas'  : hand-tiled Pallas kNN kernel (large graphs on TPU)
- 'sharded' : multi-chip edge-partitioned execution over a jax Mesh

Legacy reference names are accepted as aliases: 'pytorch'/'cpu' -> exact or
chunked tiers, 'cuvs' -> pallas/approx tier.

Environment variables (reference backend_selection.py:286-293):
GRAPHEM_BACKEND, GRAPHEM_PREFER_TPU (alias GRAPHEM_PREFER_GPU),
GRAPHEM_MEMORY_LIMIT, GRAPHEM_VERBOSE.
"""

import logging
import math
import os
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)

VALID_STRATEGIES = (
    "auto", "exact", "chunked", "approx", "binfold", "pallas", "sharded"
)
LEGACY_ALIASES = {
    "pytorch": "auto",
    "cuda": "auto",
    "gpu": "auto",
    "tpu": "auto",
    "cpu": "chunked",
    "cuvs": "pallas",
    "rapids": "pallas",
}

# Vertex-count tiers, mirroring the reference decision thresholds
# (backend_selection.py:178-206 / embedder_cuvs.py:264-272).
LARGE_GRAPH_VERTICES = 100_000
MEDIUM_GRAPH_VERTICES = 10_000
# Edge-count equivalents (avg degree 8, E = 4n — the same guess
# estimate_memory_usage falls back to): what the kNN reference set and
# the spring gather actually scale with, matching the engine's own
# E-based tiering (models/embedder.py _resolved_strategy). A dense-ish
# graph (1M edges on 50K vertices) tiers by its edges, not its vertices.
LARGE_GRAPH_EDGES = 4 * LARGE_GRAPH_VERTICES
MEDIUM_GRAPH_EDGES = 4 * MEDIUM_GRAPH_VERTICES


@dataclass
class BackendConfig:
    """Configuration for strategy selection
    (reference backend_selection.py:16-29)."""

    n_vertices: int
    n_components: int = 2
    n_edges: int | None = None
    force_backend: str | None = None
    prefer_tpu: bool = True
    memory_limit: float | None = None  # GB
    verbose: bool = False
    # None = auto-detect the local device count at decision time
    mesh_devices: int | None = field(default=None)

    def __post_init__(self):
        if self.n_vertices <= 0:
            raise ValueError(
                f"n_vertices must be positive, got {self.n_vertices}"
            )
        if self.n_components <= 0:
            raise ValueError(
                f"n_components must be positive, got {self.n_components}"
            )
        if self.force_backend is not None:
            resolved = LEGACY_ALIASES.get(
                self.force_backend, self.force_backend
            )
            if resolved not in VALID_STRATEGIES:
                raise ValueError(
                    f"force_backend must be one of {VALID_STRATEGIES} (or a "
                    f"legacy alias {tuple(LEGACY_ALIASES)}), got "
                    f"{self.force_backend!r}"
                )
            self.force_backend = resolved


def check_tpu_availability():
    """Probe for an attached TPU (reference check_torch_availability analog,
    backend_selection.py:32-57)."""
    try:
        import jax

        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:  # pragma: no cover
        return False


def check_device_count():
    """Number of GLOBAL accelerator devices (all processes).

    The sharded tier spans the global mesh, so in a multi-host run the
    factory must count every process's devices, not just the local ones
    (identical in single-process runs).
    """
    try:
        import jax

        return jax.device_count()
    except Exception:  # pragma: no cover
        return 1


def get_data_complexity_score(n_vertices, n_components):
    """Sigmoid complexity score in [0, 1] (reference
    backend_selection.py:94-139; informational/logging only there and here)."""
    vertex_score = 1.0 / (1.0 + math.exp(-(n_vertices - 1e6) / 2**18))
    dim_score = 1.0 / (1.0 + math.exp(-(n_components - 5)))
    return 0.8 * vertex_score + 0.2 * dim_score


def estimate_memory_usage(n_vertices, n_components, strategy="exact",
                          sample_size=1024, n_edges=None):
    """Rough working-set estimate in GB (reference
    backend_selection.py:209-252).

    Uses the real edge count when the caller knows it (BackendConfig
    carries it from the adjacency's nnz); falls back to the avg-degree-8
    guess otherwise.
    """
    E = n_edges if n_edges is not None else n_vertices * 4
    pos = n_vertices * n_components * 4
    edges = E * 2 * 4 * 2  # int32 pairs, both scatter directions
    if strategy == "exact":
        # one-shot (S, E) f32 distance block plus the (E, d) f32 ref
        # midpoints themselves: refs are the E edge midpoints
        block = sample_size * max(E, n_vertices) * 4 \
            + max(E, n_vertices) * max(n_components, 1) * 4
    else:
        block = sample_size * 8192 * 4
    return (5 * pos + edges + block) / 1024**3


def get_optimal_backend(config: BackendConfig):
    """Decision tree mapping graph scale + hardware to a strategy
    (reference backend_selection.py:142-206 reshaped per SURVEY.md §7.1.2).
    """
    score = get_data_complexity_score(config.n_vertices, config.n_components)
    if config.verbose:
        logger.info("Data complexity score: %.3f", score)

    if config.force_backend and config.force_backend != "auto":
        if config.verbose:
            logger.info("Forced strategy: %s", config.force_backend)
        return config.force_backend

    n = config.n_vertices
    # Tier on BOTH axes: vertices (position/gather state) and edges (the
    # kNN reference set — what the engine's own _resolved_strategy tiers
    # on, models/embedder.py). Unknown E falls back to the avg-degree-8
    # guess so vertex-only callers keep the old thresholds exactly.
    E = config.n_edges if config.n_edges is not None else 4 * n
    has_tpu = check_tpu_availability() and config.prefer_tpu
    n_devices = (
        config.mesh_devices
        if config.mesh_devices is not None
        else check_device_count()
    )

    # Auto-select the multi-chip tier only on real accelerator meshes:
    # a CPU host with forced virtual devices (the test configuration,
    # XLA_FLAGS=--xla_force_host_platform_device_count=N) must NOT route
    # big graphs to the CPU-mesh sharded tier — it is slower there than
    # the single-chip engine. Explicit opt-in stays available via
    # force_backend='sharded' or mesh_devices=N.
    large = n > LARGE_GRAPH_VERTICES or E > LARGE_GRAPH_EDGES
    if large and n_devices > 1 and (
        has_tpu or config.mesh_devices is not None
    ):
        return "sharded"
    # Single-device TPU tiers resolve to 'auto': the engine's
    # _resolved_strategy owns the kernel choice (exact / binfold /
    # approx) because it tiers on EDGE count — what the kNN reference
    # set actually scales with — and compile-probes the Pallas binfold
    # kernel. CPU hosts take the exact blockwise scan. The hand-written
    # Pallas tiled kernel stays available via force_backend='pallas'.
    if large:
        return "auto" if has_tpu else "chunked"
    if n > MEDIUM_GRAPH_VERTICES or E > MEDIUM_GRAPH_EDGES:
        if config.memory_limit is not None:
            est = estimate_memory_usage(
                n, config.n_components, "exact",
                n_edges=config.n_edges,
            )
            if est > config.memory_limit:
                return "chunked"
        return "auto" if has_tpu else "chunked"
    return "exact"


def log_backend_selection(strategy, config):
    """Log the selected strategy (reference backend_selection.py:255-283)."""
    logger.info(
        "Selected strategy %s for n=%d, d=%d (tpu=%s, devices=%d)",
        strategy, config.n_vertices, config.n_components,
        check_tpu_availability(), check_device_count(),
    )


def get_default_config(n_vertices, n_components=2, n_edges=None):
    """Build a BackendConfig honoring environment variables
    (reference backend_selection.py:286-293)."""
    prefer = os.environ.get(
        "GRAPHEM_PREFER_TPU", os.environ.get("GRAPHEM_PREFER_GPU", "true")
    ).lower() in ("1", "true", "yes")
    mem = os.environ.get("GRAPHEM_MEMORY_LIMIT")
    return BackendConfig(
        n_vertices=n_vertices,
        n_components=n_components,
        n_edges=n_edges,
        force_backend=os.environ.get("GRAPHEM_BACKEND"),
        prefer_tpu=prefer,
        memory_limit=float(mem) if mem else None,
        verbose=os.environ.get("GRAPHEM_VERBOSE", "false").lower()
        in ("1", "true", "yes"),
    )
