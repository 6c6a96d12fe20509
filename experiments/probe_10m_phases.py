"""Phase attribution for the ~20 s/iter warm step at the 10M tier.

Timing discipline (timing_sanity.py): over the axon tunnel, scalar
outputs ack in ~0.2 ms regardless of work — a repeat call with identical
args is NOT a valid measurement. Every phase here (a) varies its input
via a per-call seed argument, (b) loops the op inside one jit with a
data-dependent chain, and (c) fetches the result bytes with np.asarray
before stopping the clock.

Phases at real 10M-tier shapes (n=10M, E=35M, cached graph):
  full step (reference), gather-only, spring-only, refs+binfold-only,
  sampling-only, intersection+normalize-only.
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


def timed(label, build_fn):
    """build_fn(seed:int) -> host-fetched result; called twice."""
    build_fn(0)  # compile + warm
    t0 = time.perf_counter()
    build_fn(1)
    dt = time.perf_counter() - t0
    print(f"{label:50s} {dt/LOOP*1e3:10.1f} ms/iter", flush=True)


def main():
    from experiments.probe_10m import build_adj

    import graphem_rapids_tpu as gr

    adj = build_adj()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random",
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512,
    )
    print(f"n={emb.n} E={emb.n_edges} strategy={emb._resolved_strategy()} "
          f"fused={emb._fused_refs_active} "
          f"binned={'buckets' in emb._nb}", flush=True)
    nb = emb._nb
    ops = emb._step_ops
    if "buckets" in nb:
        caps = [(g["cap"], g["table"].shape) for g in nb["buckets"]]
        print("buckets:", caps, flush=True)
        print("ref_edge slots:", nb["ref_edge"].shape[0],
              "overflow_lt:", len(nb["overflow_lt"]), flush=True)

    # ---- full step (ground truth) ---- #
    def full(seed):
        emb.run_layout(num_iterations=LOOP, block_size=LOOP)
        return np.asarray(emb._positions[:2])

    timed("full step", full)

    # shared operands
    pos0 = emb._positions

    from graphem_rapids_tpu.ops.forces import (
        midpoint_refs_binned,
        spring_forces_binned,
    )
    from graphem_rapids_tpu.ops.knn import knn
    from graphem_rapids_tpu.ops.sampling import sample_indices

    k_attr, L_min = emb.k_attr, emb.L_min
    E, S = emb.n_edges, emb.sample_size
    k_eff = min(emb.n_neighbors + 1, E)
    strategy = emb._resolved_strategy()

    ov_plan = nb.get("overflow_plan")

    def make_plan_rt(t_ops):
        # plan arrays from the jit ARGUMENT, static block from closure
        # (the cheb_bisect closure-constant lesson, docs/ROADMAP.md)
        if "ov_plan" not in t_ops:
            return None
        return {**t_ops["ov_plan"], "block": ov_plan["block"]}

    # ---- gather only: per-bucket tables -> pn_list, chained ---- #
    @jax.jit
    def gather_loop(pos, tables, seed):
        def body(i, p):
            pn_list = [p[t] for t in tables]
            bump = sum(x[0, 0, 0] for x in pn_list)
            return p + bump * 1e-30

        return jax.lax.fori_loop(0, LOOP, body, pos + seed * 1e-30)

    def gather_only(seed):
        return np.asarray(
            gather_loop(pos0, ops["tables"], jnp.float32(seed))[:2]
        )

    timed("gather only (per-bucket tables)", gather_only)

    # ---- spring (gather + VPU + overflow plan) ---- #
    @jax.jit
    def spring_loop(pos, t_ops, seed):
        def body(i, p):
            pn_list = [p[t] for t in t_ops["tables"]]
            s = spring_forces_binned(
                p, pn_list, nb, k_attr, L_min,
                t_ops.get("nb_overflow"), make_plan_rt(t_ops),
            )
            return p + s * 1e-30

        return jax.lax.fori_loop(0, LOOP, body, pos + seed * 1e-30)

    def spring_only(seed):
        return np.asarray(spring_loop(pos0, ops, jnp.float32(seed))[:2])

    timed("gather + spring + overflow", spring_only)

    # ---- refs + binfold kNN (incl. its own gather of pn_list) ---- #
    @jax.jit
    def knn_loop(pos, t_ops, key):
        def body(i, carry):
            p, key = carry
            key, sub = jax.random.split(key)
            si = sample_indices(sub, E, S)
            pn_list = [p[t] for t in t_ops["tables"]]
            refs = midpoint_refs_binned(
                p, pn_list,
                {**nb, "ref_valid": t_ops["nb"]["ref_valid"]},
                t_ops.get("overflow_lt"),
            )
            queries = refs[t_ops["nb"]["edge_ref"][si]]
            slot_idx, _ = knn(queries, refs, k_eff, strategy=strategy)
            return p + slot_idx[0, 0] * 1e-30, key

        return jax.lax.fori_loop(0, LOOP, body, (pos, key))

    def knn_only(seed):
        return np.asarray(
            knn_loop(pos0, ops, jax.random.PRNGKey(seed))[0][:2]
        )

    timed("sample + gather + refs + binfold", knn_only)

    # ---- sampling alone ---- #
    @jax.jit
    def sample_loop(pos, key):
        def body(i, carry):
            p, key = carry
            key, sub = jax.random.split(key)
            si = sample_indices(sub, E, S)
            return p + si[0] * 1e-30, key

        return jax.lax.fori_loop(0, LOOP, body, (pos, key))

    def sampling_only(seed):
        return np.asarray(
            sample_loop(pos0, jax.random.PRNGKey(seed))[0][:2]
        )

    timed("sampling only", sampling_only)

    # ---- normalize alone (mean/std over 10M rows) ---- #
    @jax.jit
    def norm_loop(pos, seed):
        def body(i, p):
            p = p - jnp.mean(p, axis=0, keepdims=True)
            return p / (jnp.std(p, axis=0, keepdims=True, ddof=1) + 1e-6)

        return jax.lax.fori_loop(0, LOOP, body, pos + seed * 1e-30)

    def norm_only(seed):
        return np.asarray(norm_loop(pos0, jnp.float32(seed))[:2])

    timed("normalize only", norm_only)


if __name__ == "__main__":
    main()
