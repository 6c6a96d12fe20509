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
