"""Spectral (Laplacian-eigenvector) initialization.

Mirrors reference embedder_pytorch.py:337-379 / embedder_cuvs.py:217-253:
symmetrize + binarize the adjacency, take the normalized Laplacian, compute
the (d+1) smallest eigenvectors, drop the trivial constant one, fall back to
0.1 * randn on solver failure.

Two tiers (tiered-fallback pattern, SURVEY.md §5.3):
- 'scipy' : host ARPACK eigsh — exact parity with the reference; runs once
  at init so host execution is acceptable at small/medium n.
- 'lobpcg': jax.experimental.sparse.linalg.lobpcg_standard on the shifted
  normalized Laplacian as device SpMV — the TPU-native path for large n.
Failures tier down: lobpcg -> scipy -> random.
"""

import logging

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
from scipy.sparse.csgraph import laplacian as _csgraph_laplacian

logger = logging.getLogger(__name__)


def _normalized_laplacian(adjacency):
    """Symmetrized, binarized normalized Laplacian (reference :351-359)."""
    if not sp.issparse(adjacency):
        adjacency = sp.csr_matrix(adjacency)
    A = sp.csr_matrix(adjacency + adjacency.transpose())
    A.data = np.ones_like(A.data)
    return _csgraph_laplacian(A, normed=True)


def _spectral_scipy(L, n_components, seed=None):
    k = n_components + 1
    # Deterministic ARPACK start vector: eigenvector signs (and thus the
    # embedding's reflection class) become reproducible for a given seed.
    v0 = np.random.default_rng(0 if seed is None else seed).standard_normal(
        L.shape[0]
    )
    _, eigenvectors = spla.eigsh(L, k, which="SM", v0=v0)
    return eigenvectors[:, 1:k]


def _spectral_lobpcg(L, n_components, seed):
    """Device-side LOBPCG on 2I - L (largest <-> smallest eigenpairs of L)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse
    from jax.experimental.sparse.linalg import lobpcg_standard

    n = L.shape[0]
    k = n_components + 1
    coo = L.tocoo()
    L_bcoo = jsparse.BCOO(
        (jnp.asarray(coo.data, jnp.float32),
         jnp.asarray(np.stack([coo.row, coo.col], axis=1), jnp.int32)),
        shape=L.shape,
    )

    # Normalized Laplacian eigenvalues lie in [0, 2]; LOBPCG finds the
    # LARGEST eigenpairs of (2I - L), which are the smallest of L.
    def matvec(x):
        return 2.0 * x - L_bcoo @ x

    key = jax.random.PRNGKey(0 if seed is None else seed)
    X0 = jax.random.normal(key, (n, k), jnp.float32)
    _, eigenvectors, _ = lobpcg_standard(matvec, X0, m=200)
    return np.asarray(eigenvectors[:, 1:k])


def spectral_init(adjacency, n_components, method="auto", seed=None,
                  lobpcg_threshold=5_000_000):
    """Initial positions from the graph spectrum, (n, n_components) float32.

    method in {'auto', 'scipy', 'lobpcg', 'random'}. 'auto' uses host ARPACK
    up to ``lobpcg_threshold`` vertices: measured on this class of graphs,
    eigsh is exact in 6.7s at n=250K and 78s at n=1M, while unpreconditioned
    device LOBPCG at n=250K took 103s and converged poorly (Rayleigh
    quotients ~0.59 after 200 iterations). LOBPCG remains the explicit
    device tier for when init must stay off-host; it needs a preconditioner
    to be competitive (ROADMAP.md).
    """
    n = adjacency.shape[0]
    rng = np.random.default_rng(seed)

    if method == "random":
        return (rng.standard_normal((n, n_components)) * 0.1).astype(np.float32)

    if method == "auto":
        method = "scipy" if n < lobpcg_threshold else "lobpcg"

    try:
        L = _normalized_laplacian(adjacency)
    except Exception as e:  # pragma: no cover
        logger.warning("Laplacian construction failed: %s", e)
        return (rng.standard_normal((n, n_components)) * 0.1).astype(np.float32)

    if method == "lobpcg":
        try:
            return _spectral_lobpcg(L, n_components, seed).astype(np.float32)
        except Exception as e:
            logger.warning("LOBPCG failed (%s); falling back to scipy eigsh", e)
            method = "scipy"

    try:
        return _spectral_scipy(L, n_components, seed).astype(np.float32)
    except Exception as e:
        logger.warning("Eigendecomposition failed: %s", e)
        return (rng.standard_normal((n, n_components)) * 0.1).astype(np.float32)
