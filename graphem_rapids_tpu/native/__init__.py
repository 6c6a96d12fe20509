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


def radix_argsort_native(keys, nthreads=None):
    """Stable ascending argsort of NON-NEGATIVE integer keys -> int32
    permutation, via the threaded C LSD radix sort.

    Returns None when the extension is not built, the key array is too
    large for int32 indices, or keys are not a non-negative integer
    dtype (caller falls back to np.argsort(kind='stable')).
    """
    if _fastgraph is None:
        return None
    import os

    import numpy as np

    keys = np.asarray(keys)
    if keys.dtype.kind not in "ui" or len(keys) >= 2**31:
        return None
    if keys.dtype.kind == "i" and len(keys) and int(keys.min()) < 0:
        return None
    if nthreads is None:
        nthreads = min(os.cpu_count() or 1, 16)
    packed = _fastgraph.radix_argsort_u64(
        np.ascontiguousarray(keys.astype(np.uint64, copy=False)),
        int(nthreads),
    )
    return np.frombuffer(packed, dtype=np.int32).copy()


def _nthreads(nthreads):
    import os

    return (min(os.cpu_count() or 1, 16)
            if nthreads is None else int(nthreads))


def apply_perm_minmax_native(edges, inv, nthreads=None):
    """(e_lo, e_hi) int32 arrays of inv-relabelled edges; None if the
    extension is absent or dtypes are not int32."""
    if _fastgraph is None:
        return None
    import numpy as np

    if edges.dtype != np.int32 or inv.dtype != np.int32:
        return None
    packed = _fastgraph.apply_perm_minmax(
        np.ascontiguousarray(edges), np.ascontiguousarray(inv),
        _nthreads(nthreads),
    )
    both = np.frombuffer(packed, dtype=np.int32)
    E = len(both) // 2
    return both[:E].copy(), both[E:].copy()


def permute_pairs_native(e_lo, e_hi, order, nthreads=None):
    """(pairs (E,2) int32, inverse-perm (E,) int32); None if unavailable
    or dtypes are not int32."""
    if _fastgraph is None:
        return None
    import numpy as np

    if any(a.dtype != np.int32 for a in (e_lo, e_hi, order)):
        return None
    pairs, invp = _fastgraph.permute_pairs(
        np.ascontiguousarray(e_lo), np.ascontiguousarray(e_hi),
        np.ascontiguousarray(order), _nthreads(nthreads),
    )
    return (
        np.frombuffer(pairs, dtype=np.int32).reshape(-1, 2).copy(),
        np.frombuffer(invp, dtype=np.int32).copy(),
    )


def scatter_ranks_native(perm, keys, starts, nthreads=None):
    """out[perm[i]] = i - starts[keys[perm[i]]] as int32; None if
    unavailable or dtypes are not int32."""
    if _fastgraph is None:
        return None
    import numpy as np

    if any(a.dtype != np.int32 for a in (perm, keys, starts)):
        return None
    packed = _fastgraph.scatter_ranks(
        np.ascontiguousarray(perm), np.ascontiguousarray(keys),
        np.ascontiguousarray(starts), _nthreads(nthreads),
    )
    return np.frombuffer(packed, dtype=np.int32).copy()


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
