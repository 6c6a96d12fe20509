"""A/B: block-fold overflow plan vs legacy segment_sum, skewed 100K tier.

The skewed-degree 1M tier measured 378 ms/iter vs 189 for the uniform
graph (BASELINE.md); the gap is the per-iteration overflow scatter for
hub rows (~1.5M directed pairs through a 1M-segment segment_sum, ~111
ns/row on v5e). build_overflow_plan pads each hub's run to block-aligned
self-pairs and scatters only per-block partial sums. This script
measures both paths at a 100K-vertex Zipf workload in one process
(bench variance across processes is ~±10%, CLAUDE.md).
"""

import sys
import time

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")

N, CHORDS, D = 100_000, 300_000, 3


def build_adj():
    rng = np.random.default_rng(0)
    ring = np.column_stack([np.arange(N), (np.arange(N) + 1) % N])
    za = np.minimum(rng.zipf(1.6, CHORDS), N) - 1
    zb = rng.integers(0, N, CHORDS)
    chords = np.column_stack([za, zb])
    chords = chords[chords[:, 0] != chords[:, 1]]
    e = np.concatenate([ring, chords])
    i, j = np.minimum(e[:, 0], e[:, 1]), np.maximum(e[:, 0], e[:, 1])
    a = sp.coo_matrix((np.ones(len(e)), (i, j)), shape=(N, N)).tocsr()
    a.data[:] = 1
    return a + a.T


def block_time(label, run, iters=50):
    run(10)  # warm/compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        run(iters)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:55s} {best/iters*1e3:8.3f} ms/iter", flush=True)


def main():
    import graphem_rapids_tpu as gr

    adj = build_adj()
    deg = np.asarray(adj.sum(axis=1)).ravel()
    print(f"deg mean={deg.mean():.1f} max={int(deg.max())}", flush=True)

    kw = dict(n_components=D, seed=0, verbose=False, L_min=10.0,
              k_attr=0.5, k_inter=0.1, n_neighbors=15, sample_size=512,
              init="random")

    emb = gr.GraphEmbedderTPU(adj, **kw)
    plan = emb._nb.get("overflow_plan")
    ov = emb._nb["overflow"]
    print(f"E={emb.n_edges} overflow={len(ov)} "
          f"plan={'None' if plan is None else (plan['pairs'].shape, plan['block'], len(plan['hub_ids']))}",
          flush=True)

    assert plan is not None, "skewed graph should produce a plan"
    block_time("full step, overflow plan (block-fold)",
               lambda n, e=emb: e.run_layout(n, block_size=10))

    # legacy path: rebuild the step with the plan stripped
    emb2 = gr.GraphEmbedderTPU(adj, **kw)
    emb2._nb["overflow_plan"] = None
    emb2._nb_overflow = jnp.asarray(emb2._nb["overflow"])
    emb2._step = emb2._build_step()
    assert "nb_overflow" in emb2._step_ops and "ov_plan" not in emb2._step_ops
    block_time("full step, legacy overflow segment_sum",
               lambda n, e=emb2: e.run_layout(n, block_size=10))

    # sanity: trajectories agree
    e1 = gr.GraphEmbedderTPU(adj, **kw)
    e2 = gr.GraphEmbedderTPU(adj, **kw)
    e2._nb["overflow_plan"] = None
    e2._nb_overflow = jnp.asarray(e2._nb["overflow"])
    e2._step = e2._build_step()
    for e in (e1, e2):
        e.run_layout(5, block_size=5)
    err = np.abs(e1.positions - e2.positions).max()
    print(f"5-iter trajectory max|diff| plan vs legacy: {err:.2e}", flush=True)


if __name__ == "__main__":
    import os

    os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
    main()
