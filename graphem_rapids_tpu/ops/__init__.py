"""TPU-native compute ops: forces, kNN, intersection tests, spectral init, IC simulation.

These are the JAX/XLA/Pallas equivalents of the native libraries the reference
delegates to (torch/ATen, PyKeOps, RAPIDS cuVS, CuPy, SciPy/ARPACK); see
reference graphem_rapids/backends/embedder_pytorch.py and SURVEY.md §2.3.
"""

from .forces import spring_forces, intersection_forces, build_scatter_plan
from .intersect import segments_intersect_2d
from .knn import knn, knn_exact, knn_chunked, knn_approx
from .laplacian import spectral_init
from .ic_sim import independent_cascade
from .sampling import sample_indices

# NOTE: ic_sim.estimated_influence (edge-list signature) is intentionally
# NOT re-exported here — the public scoring API is
# graphem_rapids_tpu.influence.estimated_influence (graph signature).

__all__ = [
    "spring_forces",
    "intersection_forces",
    "build_scatter_plan",
    "segments_intersect_2d",
    "knn",
    "knn_exact",
    "knn_chunked",
    "knn_approx",
    "spectral_init",
    "independent_cascade",
    "sample_indices",
]
