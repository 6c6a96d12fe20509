"""Phase attribution at the 30M tier (round-4 roofline follow-up).

scripts/roofline_tiers.py put the 30M tier at 46% of the gather floor
(measured 3.79 s/iter vs floor 1.74 s) — the largest sub-floor gap of
any tier. This probes where the other 2 s go, by ADDITIVE phases (each
includes the previous; deltas attribute):

  A. per-slot gather only          (the floor term)
  B. + spring fold                  (VPU + overflow plan)
  C. + fused refs assembly          (slotwise ref build)
  D. + sampling + segmented binfold (12 segments at ~139M refs)
  E. full step                      (+ intersection + normalize)

Timing discipline (docs/ROADMAP.md): phases chained LOOP times inside
one jit with data-dependent carries, inputs varied per dispatch, 2-row
host fetch as the sync.

Usage: python experiments/probe_30m_phases.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import jax
import jax.numpy as jnp
import numpy as np

LOOP = 3
CACHE = os.path.join(os.path.dirname(__file__), "data", "graph_30m.npz")


def timed(label, fn):
    fn(0)  # compile + warm
    best = float("inf")
    for s in (1, 2):
        t0 = time.perf_counter()
        fn(s)
        best = min(best, (time.perf_counter() - t0) / LOOP)
    print(f"{label:52s} {best * 1e3:10.1f} ms/iter", flush=True)
    return best


def main():
    import scipy.sparse as sp

    import graphem_rapids_tpu as gr

    t0 = time.perf_counter()
    adj = sp.load_npz(CACHE)
    print(f"graph load {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random",
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512,
    )
    print(f"init {time.perf_counter()-t0:.1f}s "
          f"n={emb.n} E={emb.n_edges} "
          f"strategy={emb._resolved_strategy()} "
          f"fused={emb._fused_refs_active} ref_order={emb.ref_order} "
          f"binned={'buckets' in emb._nb}", flush=True)

    nb = emb._nb
    ops = emb._step_ops
    k_attr, L_min = emb.k_attr, emb.L_min
    E, S = emb.n_edges, emb.sample_size
    k_eff = min(emb.n_neighbors + 1, E)
    strategy = emb._resolved_strategy()
    ov_plan = nb.get("overflow_plan")
    assert nb.get("ref_order") == "slot", "30M tier should be slot-major"

    from graphem_rapids_tpu.ops.forces import (
        spring_refs_binned_slotwise,
    )
    from graphem_rapids_tpu.ops.knn import knn
    from graphem_rapids_tpu.ops.sampling import sample_indices

    def make_plan_rt(t_ops):
        if "ov_plan" not in t_ops:
            return None
        return {**t_ops["ov_plan"], "block": ov_plan["block"]}

    # ---- E. full step (single-step dispatches: the 50-step fori OOMs
    # at this scale, and run_layout's return would fetch the full 360 MB
    # positions per call — bench_30m.py methodology) ---- #
    def full(seed):
        for _ in range(LOOP):
            emb._positions, emb._key = emb._step(
                emb._positions, emb._key, emb._step_ops
            )
        return np.asarray(emb._positions[:2])

    timed("E. full step", full)
    # _step DONATES positions; grab the live buffer after the phase for
    # the (undonated) phase loops below
    pos0 = emb._positions

    # ---- A. per-slot gathers only ---- #
    @jax.jit
    def gather_loop(pos, tables, seed):
        def body(i, p):
            bump = jnp.float32(0)
            for t in tables:  # (cap, count) per bucket
                for srow in range(t.shape[0]):
                    bump = bump + p[t[srow]][0, 0]
            return p + bump * 1e-30

        return jax.lax.fori_loop(0, LOOP, body, pos + seed * 1e-30)

    def gather_only(seed):
        return np.asarray(
            gather_loop(pos0, ops["tables"], jnp.float32(seed))[:2]
        )

    timed("A. per-slot gathers only", gather_only)

    # ---- B. + spring fold (want_refs=False) ---- #
    @jax.jit
    def spring_loop(pos, t_ops, seed):
        def body(i, p):
            spring, _ = spring_refs_binned_slotwise(
                p, t_ops["tables"], nb, k_attr, L_min,
                ref_valid=t_ops["nb"]["ref_valid"],
                overflow_lt=t_ops.get("overflow_lt"),
                overflow_edges=t_ops.get("nb_overflow"),
                overflow_plan=make_plan_rt(t_ops), want_refs=False,
            )
            return p + spring * 1e-30

        return jax.lax.fori_loop(0, LOOP, body, pos + seed * 1e-30)

    def spring_only(seed):
        return np.asarray(spring_loop(pos0, ops, jnp.float32(seed))[:2])

    timed("B. + spring fold", spring_only)

    # ---- C. + refs assembly (want_refs=True) ---- #
    @jax.jit
    def refs_loop(pos, t_ops, seed):
        def body(i, p):
            spring, refs = spring_refs_binned_slotwise(
                p, t_ops["tables"], nb, k_attr, L_min,
                ref_valid=t_ops["nb"]["ref_valid"],
                overflow_lt=t_ops.get("overflow_lt"),
                overflow_edges=t_ops.get("nb_overflow"),
                overflow_plan=make_plan_rt(t_ops), want_refs=True,
            )
            return p + (spring * 1e-30) + refs[0, 0] * 1e-30

        return jax.lax.fori_loop(0, LOOP, body, pos + seed * 1e-30)

    def refs_only(seed):
        return np.asarray(refs_loop(pos0, ops, jnp.float32(seed))[:2])

    timed("C. + fused refs assembly", refs_only)

    # ---- D. + sampling + segmented binfold ---- #
    @jax.jit
    def knn_loop(pos, t_ops, key):
        def body(i, carry):
            p, key = carry
            key, sub = jax.random.split(key)
            si = sample_indices(sub, E, S)
            spring, refs = spring_refs_binned_slotwise(
                p, t_ops["tables"], nb, k_attr, L_min,
                ref_valid=t_ops["nb"]["ref_valid"],
                overflow_lt=t_ops.get("overflow_lt"),
                overflow_edges=t_ops.get("nb_overflow"),
                overflow_plan=make_plan_rt(t_ops), want_refs=True,
            )
            queries = refs[t_ops["nb"]["edge_ref"][si]]
            slot_idx, _ = knn(queries, refs, k_eff, strategy=strategy)
            return p + spring * 1e-30 + slot_idx[0, 0] * 1e-30, key

        return jax.lax.fori_loop(0, LOOP, body, (pos, key))

    def knn_only(seed):
        return np.asarray(
            knn_loop(pos0, ops, jax.random.PRNGKey(seed))[0][:2]
        )

    timed("D. + sampling + segmented binfold", knn_only)


if __name__ == "__main__":
    main()
