"""GraphEm Rapids TPU: a TPU-native graph embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the graphem-rapids capability set
(force-directed graph layout whose radial coordinate proxies node centrality,
plus influence maximization): one jitted engine with kernel-strategy
selection instead of the reference's per-library backends, Pallas tiled kNN
instead of PyKeOps/cuVS, deterministic segment-sum scatter instead of CUDA
atomics, and multi-chip scaling via jax.sharding meshes (new capability).

Public surface mirrors the reference package root
(graphem_rapids/__init__.py): ``create_graphem`` factory, generators,
influence, visualization, datasets, benchmarks.
"""

import logging
import os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (TPU layout-step compiles are
    10-60s; caching makes repeat invocations start warm). Respects an
    existing user configuration; override dir with GRAPHEM_CACHE_DIR."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = os.environ.get(
                "GRAPHEM_CACHE_DIR",
                os.path.join(os.path.expanduser("~"), ".cache",
                             "graphem_rapids_tpu", "jax"),
            )
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .benchmark import (
    benchmark_correlations,
    run_benchmark,
    run_influence_benchmark,
)
from .datasets import (
    list_available_datasets,
    load_dataset,
    load_dataset_as_adjacency,
    load_dataset_as_networkx,
)
from .generators import (
    compute_vertex_degrees,
    erdos_renyi_graph,
    generate_ba,
    generate_balanced_tree,
    generate_bipartite_graph,
    generate_caveman,
    generate_geometric,
    generate_power_cluster,
    generate_random_regular,
    generate_relaxed_caveman,
    generate_road_network,
    generate_sbm,
    generate_scale_free,
    generate_ws,
)
from .influence import (
    estimated_influence,
    graphem_seed_selection,
    greedy_seed_selection,
    ndlib_estimated_influence,
)
from .models.embedder import GraphEmbedderTPU

# Migration aliases: the reference exports its primary engine as
# GraphEmbedderPyTorch and, when RAPIDS is installed, its large-scale tier
# as GraphEmbedderCuVS (graphem_rapids/__init__.py:173-220, :218-220). Here
# there is ONE engine whose strategy tiering covers both regimes; code
# written against either reference name keeps working unchanged (the cuVS
# alias is unconditional — the TPU tiers need no optional dependency).
GraphEmbedderPyTorch = GraphEmbedderTPU
GraphEmbedderCuVS = GraphEmbedderTPU
from .utils.backend_selection import (
    BackendConfig,
    check_tpu_availability,
    get_default_config,
    get_optimal_backend,
)
from .visualization import (
    display_benchmark_results,
    plot_radial_vs_centrality,
    report_corr,
    report_full_correlation_matrix,
)

__version__ = "0.1.0"


def __getattr__(name):  # PEP 562 lazy export
    if name == "ShardedGraphEmbedder":
        from .parallel.sharded_embedder import ShardedGraphEmbedder

        return ShardedGraphEmbedder
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )


def create_graphem(adjacency, n_components=2, backend=None, mesh=None,
                   **kwargs):
    """Create a graph embedder with automatic strategy selection.

    The factory keeps the reference's entry-point shape
    (graphem_rapids/__init__.py:78-136) but selects a kernel strategy and
    device tier on the single TPU engine instead of choosing among external
    libraries. Environment variables (GRAPHEM_BACKEND, GRAPHEM_PREFER_TPU,
    GRAPHEM_MEMORY_LIMIT, GRAPHEM_VERBOSE) are honored.

    Parameters
    ----------
    adjacency : array-like or scipy.sparse matrix
        Square adjacency matrix.
    n_components : int, default=2
        Embedding dimensionality.
    backend : str, optional
        Force a strategy: 'auto' | 'exact' | 'chunked' | 'approx' |
        'binfold' | 'pallas' | 'sharded' (legacy aliases 'pytorch',
        'cuvs', 'cpu' accepted).
    mesh : jax.sharding.Mesh, optional
        Device mesh for the 'sharded' strategy; defaults to all local
        devices when sharding is selected.
    **kwargs
        Forwarded to the embedder constructor.

    Returns
    -------
    GraphEmbedderTPU (or ShardedGraphEmbedder for the multi-chip tier).
    """
    if "index_type" in kwargs:
        # reference cuVS-only knob (embedder_cuvs.py:63-78): there is no
        # ANN index to build here — the binfold kernel replaces it.
        # Accept and drop so migrating call sites keep working.
        idx = kwargs.pop("index_type")
        logging.getLogger(__name__).info(
            "index_type=%r ignored: the TPU engine has no ANN index "
            "(see docs/PARITY.md)", idx,
        )
    n_vertices = adjacency.shape[0]
    # Edge count from the adjacency's nnz (O(1) on sparse formats):
    # undirected i<j edges ~ nnz/2 on a symmetric matrix. The factory
    # tiers on it like the engine's _resolved_strategy does — dense-ish
    # graphs (1M edges on 50K vertices) tier by E, not n.
    try:
        nnz = adjacency.nnz  # scipy sparse
    except AttributeError:
        import numpy as _np

        nnz = int(_np.count_nonzero(_np.asarray(adjacency)))
    config = get_default_config(
        n_vertices, n_components, n_edges=max(nnz // 2, 1)
    )
    if backend is not None:
        config.force_backend = backend
        config.__post_init__()

    strategy = get_optimal_backend(config)

    if strategy == "sharded":
        from .parallel.sharded_embedder import ShardedGraphEmbedder

        return ShardedGraphEmbedder(
            adjacency, n_components=n_components, mesh=mesh, **kwargs
        )
    if strategy == "chunked" and "device" not in kwargs and not check_tpu_availability():
        kwargs["device"] = "cpu"
    return GraphEmbedderTPU(
        adjacency, n_components=n_components, knn_strategy=strategy, **kwargs
    )


def get_backend_info():
    """Hardware/strategy availability report
    (reference graphem_rapids/__init__.py:139-169)."""
    import jax

    devices = jax.devices()
    platforms = sorted({d.platform for d in devices})
    tpu = [d for d in devices if d.platform == "tpu"]
    info = {
        "jax_version": jax.__version__,
        "platforms": platforms,
        "tpu_available": bool(tpu),
        "tpu_device_count": len(tpu),
        "tpu_device_kind": tpu[0].device_kind if tpu else None,
        "device_count": len(devices),
        "pallas_available": True,
        # matches the auto-selection policy: on TPU the engine resolves
        # the tier itself (exact / binfold / approx, BASELINE.md)
        "recommended_backend": "auto" if tpu else "chunked",
    }
    return info


__all__ = [
    # Factory + engine
    "create_graphem",
    "GraphEmbedderTPU",
    "ShardedGraphEmbedder",  # multi-chip tier (lazy import)
    "GraphEmbedderPyTorch",  # migration alias for reference users
    "GraphEmbedderCuVS",  # migration alias for reference cuVS users
    # Graph generators
    "erdos_renyi_graph",
    "generate_sbm",
    "generate_ba",
    "generate_ws",
    "generate_caveman",
    "generate_geometric",
    "generate_scale_free",
    "generate_road_network",
    "generate_balanced_tree",
    "generate_power_cluster",
    "generate_random_regular",
    "generate_bipartite_graph",
    "generate_relaxed_caveman",
    "compute_vertex_degrees",
    # Influence maximization
    "graphem_seed_selection",
    "ndlib_estimated_influence",
    "estimated_influence",
    "greedy_seed_selection",
    # Visualization
    "report_corr",
    "report_full_correlation_matrix",
    "plot_radial_vs_centrality",
    "display_benchmark_results",
    # Datasets
    "load_dataset",
    "load_dataset_as_networkx",
    "load_dataset_as_adjacency",
    "list_available_datasets",
    # Utilities
    "get_backend_info",
    "BackendConfig",
    "get_optimal_backend",
    "check_tpu_availability",
    # Benchmarks
    "run_benchmark",
    "benchmark_correlations",
    "run_influence_benchmark",
]


def _show_backend_info():  # pragma: no cover - cosmetic
    info = get_backend_info()
    status = [f"JAX {info['jax_version']}"]
    if info["tpu_available"]:
        status.append(
            f"TPU ✓ ({info['tpu_device_count']}x {info['tpu_device_kind']})"
        )
    else:
        status.append(f"TPU ✗ ({'/'.join(info['platforms'])})")
    print(f"GraphEm Rapids TPU v{__version__} - {' | '.join(status)}")
    print(f"Recommended strategy: {info['recommended_backend'].upper()}")


def backend_info_main():  # pragma: no cover - console entry point
    """Console-script entry: print backend info and exit 0."""
    _show_backend_info()


# The banner is OPT-IN (unlike the reference's opt-out banner,
# __init__.py:251-255): printing it calls jax.devices(), which initializes
# the JAX backend as an import side effect — on this host that pins the
# platform before a consumer can call jax.config.update('jax_platforms',
# ...) and on the TPU host it claims the single-user tunnel (ADVICE r1).
# Use GRAPHEM_RAPIDS_QUIET=false to request it, or the
# `graphem-rapids-tpu-info` console entry point.
if os.environ.get("GRAPHEM_RAPIDS_QUIET", "true").lower() in ("false", "0"):
    try:  # pragma: no cover - cosmetic
        _show_backend_info()
    except Exception:  # pragma: no cover
        pass
