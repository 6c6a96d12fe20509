"""A/B at the 10M tier: ref_order='row' (current auto, 9.0 ns/row
gather + pad/transpose per binfold segment) vs ref_order='slot' (the
30M+ layout, which measured 7.5 ns/row and ~1.7 ms per Mref binfold).

If slot wins at 10M, SLOT_REF_ORDER_MIN_N (models/embedder.py, 16M)
comes down. Methodology: bench_10m.py's fused 50-step blocks, best of 3,
2-row sync.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np

from experiments.bench_10m import build_adj  # noqa: E402


def run(ref_order):
    import graphem_rapids_tpu as gr

    adj = build_adj()
    t0 = time.perf_counter()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random",
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512, ref_order=ref_order,
    )
    E = emb.n_edges
    print(f"[{ref_order}] init {time.perf_counter()-t0:.1f}s "
          f"strategy={emb._resolved_strategy()} "
          f"fused={emb._fused_refs_active}", flush=True)

    def block():
        emb._positions, emb._key = emb._multi_step(
            emb._positions, emb._key, emb._step_ops, num_steps=50
        )
        np.asarray(emb._positions[:2])

    t0 = time.perf_counter()
    block()
    print(f"[{ref_order}] first block {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        block()
        best = min(best, time.perf_counter() - t0)
    print(f"[{ref_order}] warm 50 iters {best:.2f}s -> "
          f"{E*50/best/1e6:.2f}M edges/s ({best/50*1e3:.1f} ms/iter)",
          flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "slot")
