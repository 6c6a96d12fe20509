"""Native host-side components (C extensions with Python fallbacks).

Build in place with:  python setup_native.py build_ext --inplace
(or `make native`). Import failures are silent — callers fall back to the
vectorized-Python implementations.
"""

try:
    from . import _fastgraph  # type: ignore

    FASTGRAPH_AVAILABLE = True
except ImportError:  # pragma: no cover - depends on local build
    _fastgraph = None
    FASTGRAPH_AVAILABLE = False


def parse_edges_native(data: bytes, one_based=False, skip_header=False):
    """Parse raw edge-list bytes -> (E, 2) int64 array via the C scanner.

    Returns None when the extension is not built.
    """
    if _fastgraph is None:
        return None
    import numpy as np

    packed = _fastgraph.parse_edges(data, int(one_based), int(skip_header))
    return np.frombuffer(packed, dtype=np.int64).reshape(-1, 2).copy()


def csr_lt_edges_native(indptr, indices, n, nthreads=None):
    """(E, 2) int32 upper-triangle edges from CSR structure, threaded C.

    Returns None when the extension is not built or the index dtypes are
    not int32/int64 (caller falls back to the numpy path). The caller
    must have excluded explicit zeros.
    """
    if _fastgraph is None:
        return None
    import os

    import numpy as np

    dt = {np.dtype(np.int32): 0, np.dtype(np.int64): 1}
    if indptr.dtype not in dt or indices.dtype not in dt:
        return None
    if nthreads is None:
        nthreads = min(os.cpu_count() or 1, 16)
    packed = _fastgraph.csr_lt_edges(
        np.ascontiguousarray(indptr), np.ascontiguousarray(indices),
        dt[indptr.dtype], dt[indices.dtype], int(n), int(nthreads),
    )
    return np.frombuffer(packed, dtype=np.int32).reshape(-1, 2).copy()
