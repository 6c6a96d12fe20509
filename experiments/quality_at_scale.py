"""Quality columns for the scale tiers (VERDICT r4 #4).

The >=1M benches were perf-only on near-regular ring+chords synthetics;
a quality regression specific to the segmented-binfold / slot-major /
binned / packed machinery at scale would have been invisible. This runs
the PRODUCTION auto strategy on heavy-tailed topologies and banks,
next to edges/s:

  - spearman_all: Spearman(radius, degree) over all vertices. On
    heavy-tailed graphs ties dominate this number (BASELINE r1 skewed
    note: 0.36 on a graph whose degree vector is constant except at
    hubs) — kept for comparability, interpreted with the two below.
  - spearman_hubs: Spearman(radius, degree) over the top-1% by degree
    (the rank signal the influence pipeline consumes lives here).
  - hub_pctile: mean radius PERCENTILE of the top-100 degree vertices
    (1.0 = hubs at maximum radius; the paper's claim is that high
    degree maps to large radius).

Tiers: 1M uniform ring+chords (control), 1M Zipf-skewed (hub degree
~731K — the bench_1m_skewed workload, which also re-banks the
truncated r4 log per ADVICE), 10M Zipf-skewed.

Usage: python experiments/quality_at_scale.py [--tiers 1m,1m_skewed,10m_skewed]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np
import scipy.sparse as sp
from scipy import stats


def ring_chords(n, chords, seed=0, zipf=None):
    rng = np.random.default_rng(seed)
    ring = np.column_stack([np.arange(n), (np.arange(n) + 1) % n])
    if zipf is None:
        ch = rng.integers(0, n, (chords, 2))
    else:
        # heavy-tailed endpoint selection: map Zipf draws onto vertex
        # ids so a handful of vertices own huge degrees (the
        # bench_1m_skewed recipe)
        a = np.minimum(rng.zipf(zipf, chords) - 1, n - 1)
        b = rng.integers(0, n, chords)
        ch = np.column_stack([a, b])
    ch = ch[ch[:, 0] != ch[:, 1]]
    e = np.concatenate([ring, ch])
    i, j = np.minimum(e[:, 0], e[:, 1]), np.maximum(e[:, 0], e[:, 1])
    a = sp.coo_matrix((np.ones(len(e)), (i, j)), shape=(n, n)).tocsr()
    a.data[:] = 1
    return a + a.T


TIERS = {
    "1m": dict(n=1_000_000, chords=3_000_000, zipf=None),
    "1m_skewed": dict(n=1_000_000, chords=3_300_000, zipf=1.6),
    "10m_skewed": dict(n=10_000_000, chords=25_000_000, zipf=1.8),
}


def run_tier(name, cfg, iters=50):
    import graphem_rapids_tpu as gr

    t0 = time.perf_counter()
    adj = ring_chords(cfg["n"], cfg["chords"], zipf=cfg["zipf"])
    deg = np.asarray(adj.sum(axis=1)).ravel()
    print(f"[{name}] graph {time.perf_counter()-t0:.0f}s: n={cfg['n']:,} "
          f"E={adj.nnz//2:,} deg mean {deg.mean():.1f} max "
          f"{int(deg.max()):,}", flush=True)

    t0 = time.perf_counter()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False,
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512,
    )
    print(f"[{name}] init {time.perf_counter()-t0:.0f}s "
          f"strategy={emb._resolved_strategy()} "
          f"fused={emb._fused_refs_active} "
          f"packed={emb._packed_gather_active}", flush=True)

    def block(k):
        emb._positions, emb._key = emb._multi_step(
            emb._positions, emb._key, emb._step_ops, num_steps=k
        )
        np.asarray(emb._positions[:2])

    t0 = time.perf_counter()
    block(iters)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    block(iters)
    warm = time.perf_counter() - t0
    E = emb.n_edges
    print(f"[{name}] first {first:.1f}s; warm {iters} iters {warm:.2f}s "
          f"-> {E*iters/warm/1e6:.2f}M edges/s "
          f"({warm/iters*1e3:.1f} ms/iter)", flush=True)

    pos = np.asarray(emb.positions)
    assert np.isfinite(pos).all(), "non-finite positions"
    radius = np.linalg.norm(pos, axis=1)
    rho_all = stats.spearmanr(radius, deg).statistic
    k_hub = max(100, cfg["n"] // 100)
    hub_idx = np.argsort(-deg)[:k_hub]
    rho_hubs = stats.spearmanr(radius[hub_idx], deg[hub_idx]).statistic
    pct = stats.rankdata(radius) / len(radius)
    hub_pctile = float(pct[np.argsort(-deg)[:100]].mean())
    print(f"[{name}] QUALITY spearman_all={rho_all:.3f} "
          f"spearman_top1pct={rho_hubs:.3f} hub100_radius_pctile="
          f"{hub_pctile:.3f}", flush=True)
    del emb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="1m,1m_skewed,10m_skewed")
    args = ap.parse_args()
    for t in args.tiers.split(","):
        run_tier(t, TIERS[t])


if __name__ == "__main__":
    main()
