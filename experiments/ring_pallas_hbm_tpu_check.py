"""Real-TPU compile+run check of the HBM-carry ring_pallas kernel.

S=512 on a 1-device mesh is exactly the shape BASELINE.md recorded as
"refuses by design" in round 2 (the whole sample becomes one shard's
carry: 37 MB > the VMEM budget). With the HBM-carry kernel
(parallel/ring_binfold.py _kernel_hbm) the geometry routes to ANY/HBM
space and must compile + run on the real chip, with bounded drift vs
the all_gather merge (same seed, same samples; the binfold bin model is
approximate). Also times 50-iter blocks of both programs for the
BASELINE note on when the ring beats the lax ring / all_gather tiers.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh
from graphem_rapids_tpu.parallel.ring_binfold import _geometry

N, DEG, S, K, ITERS = 100_000, 8, 512, 15, 50


def time_engine(name, emb, E):
    pos, key = emb._positions, emb._key

    def block(pos, key):
        pos, key = emb._multi_step(pos, key, emb._step_ops,
                                   num_steps=ITERS)
        np.asarray(pos[:2])
        return pos, key

    t0 = time.perf_counter()
    pos, key = block(pos, key)
    print(f"  [{name}: first block {time.perf_counter()-t0:.1f}s]",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pos, key = block(pos, key)
        best = min(best, time.perf_counter() - t0)
    emb._positions, emb._key = pos, key
    print(f"{name:36s} {best/ITERS*1e3:8.2f} ms/iter "
          f"({E*ITERS/best/1e6:6.1f}M edges/s)", flush=True)
    return best / ITERS


def main():
    adj = gr.generate_random_regular(n=N, d=DEG, seed=0)
    E = adj.nnz // 2
    # confirm this is the HBM geometry on one device (S_loc = S = 512)
    hbm = _geometry(4 * E, S, 1, K + 1, 0.95)[-1]
    print(f"S={S} ndev=1 routes to HBM carry: {hbm}", flush=True)
    assert hbm

    results = {}
    for name, kw in [
        ("ring_pallas (HBM carry)", dict(knn_comm="ring_pallas")),
        ("ring (lax.ppermute)", dict(knn_comm="ring")),
        ("all_gather", {}),
    ]:
        emb = ShardedGraphEmbedder(
            adj, n_components=3, mesh=make_mesh(1), seed=0, verbose=False,
            sample_size=S, n_neighbors=K, fused_midpoints=True, **kw,
        )
        results[name] = (time_engine(name, emb, E),
                         np.asarray(emb.positions))
        del emb

    ref = results["all_gather"][1]
    for name in ("ring_pallas (HBM carry)", "ring (lax.ppermute)"):
        pos = results[name][1]
        rel = np.linalg.norm(pos - ref) / np.linalg.norm(ref)
        print(f"{name}: rel drift vs all_gather after {ITERS * 4} iters "
              f"= {rel:.4f}", flush=True)
        assert np.isfinite(pos).all()


if __name__ == "__main__":
    main()
