"""A/B at the 1M (and 2M) tier: lane-packed slot gathers on vs off.

The isolated probe (packed_gather_probe.py) measured the packed
composed gather at 3.3 vs 5.9 ns/row at 1M (G=8) and 4.7 vs 5.6 at 2M
(G=16). This measures the real engine step end to end — same harness
as the banked tier numbers (fused 50-step blocks, best of 3, 2-row
sync, fresh donated buffers each dispatch).

Usage: python experiments/ab_1m_packed.py [1m|2m] [on|off|both]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np
import scipy.sparse as sp


def build_adj(n, chords, seed=0):
    rng = np.random.default_rng(seed)
    ring = np.column_stack([np.arange(n), (np.arange(n) + 1) % n])
    ch = rng.integers(0, n, (chords, 2))
    ch = ch[ch[:, 0] != ch[:, 1]]
    e = np.concatenate([ring, ch])
    i, j = np.minimum(e[:, 0], e[:, 1]), np.maximum(e[:, 0], e[:, 1])
    a = sp.coo_matrix((np.ones(len(e)), (i, j)), shape=(n, n)).tocsr()
    a.data[:] = 1
    return a + a.T


def run(adj, packed):
    import graphem_rapids_tpu as gr

    t0 = time.perf_counter()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random",
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512, packed_gather=packed,
    )
    E = emb.n_edges
    tag = f"packed={packed}"
    print(f"[{tag}] init {time.perf_counter()-t0:.1f}s "
          f"strategy={emb._resolved_strategy()} "
          f"fused={emb._fused_refs_active} "
          f"packed_active={emb._packed_gather_active}", flush=True)

    def block():
        emb._positions, emb._key = emb._multi_step(
            emb._positions, emb._key, emb._step_ops, num_steps=50
        )
        np.asarray(emb._positions[:2])

    t0 = time.perf_counter()
    block()
    print(f"[{tag}] first block {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        block()
        best = min(best, time.perf_counter() - t0)
    print(f"[{tag}] warm 50 iters {best:.2f}s -> "
          f"{E*50/best/1e6:.2f}M edges/s ({best/50*1e3:.2f} ms/iter)",
          flush=True)
    del emb


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "1m"
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    n, chords = {
        "100k": (100_000, 300_000),
        "150k": (150_000, 450_000),
        "250k": (250_000, 750_000),
        "500k": (500_000, 1_500_000),
        "1m": (1_000_000, 3_000_000),
        "2m": (2_000_000, 6_000_000),
        "4m": (4_000_000, 12_000_000),
    }[tier]
    adj = build_adj(n, chords)
    print(f"tier {tier}: n={n:,} E~={adj.nnz//2:,}", flush=True)
    if which in ("off", "both"):
        run(adj, False)
    if which in ("on", "both"):
        run(adj, True)


if __name__ == "__main__":
    main()
