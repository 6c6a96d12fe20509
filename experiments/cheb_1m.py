"""Chebyshev device spectral init at the 1M tier vs host ARPACK.

Measures wall-clock and subspace quality of the 'chebyshev' tier
(ops/laplacian.py) on the bench_1m ring+chords graph. Host eigsh measured
78 s at n=1M on this machine (BASELINE.md); if the device tier lands well
under that with subspace alignment > 0.9, spectral_init's auto threshold
(currently 5M vertices) should drop so the 1M tier inits on device.

Run AFTER any other TPU process exits (one TPU process at a time).
"""

import argparse
import time

import numpy as np

from bench_1m import build_adj


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-components", type=int, default=3)
    parser.add_argument("--skip-eigsh", action="store_true",
                        help="skip the slow host-ARPACK comparison run")
    args = parser.parse_args()

    from graphem_rapids_tpu.ops import laplacian as lap

    adj = build_adj()
    k = args.n_components

    t0 = time.perf_counter()
    Xc = lap._spectral_chebyshev(adj, k, seed=0)
    t_cheb = time.perf_counter() - t0
    print(f"chebyshev (incl. plan build + compile): {t_cheb:.1f}s", flush=True)

    t0 = time.perf_counter()
    Xc2 = lap._spectral_chebyshev(adj, k, seed=0)
    print(f"chebyshev warm repeat: {time.perf_counter()-t0:.1f}s", flush=True)
    assert np.isfinite(Xc2).all()

    if not args.skip_eigsh:
        t0 = time.perf_counter()
        L = lap._normalized_laplacian(adj)
        Xs = lap._spectral_scipy(L, k, seed=0)
        print(f"host eigsh: {time.perf_counter()-t0:.1f}s", flush=True)

        Qc, _ = np.linalg.qr(Xc)
        Qs, _ = np.linalg.qr(Xs)
        sv = np.linalg.svd(Qc.T @ Qs, compute_uv=False)
        print(f"subspace alignment (min canonical corr): {sv.min():.4f}",
              flush=True)


if __name__ == "__main__":
    import os
    import sys

    os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
