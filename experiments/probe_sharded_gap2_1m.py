"""Second 1M gap probe: chained 50-iter loops, split at the kNN merge.

probe_sharded_gap_1m.py's per-dispatch split was inconclusive at the
5 ms resolution (each dispatch carries ~270 ms of tunnel+upload that
min-of-30 can't fully cancel). This one times fused 50-iteration
fori_loops — the same harness that measured the 73.02 vs 78.25 ms/iter
gap — of three programs:

  A. single-chip multi_step          (expect ~73 ms/iter)
  B. sharded multi_step              (expect ~78 ms/iter)
  C. sharded DEBUG loop: the _debug_knn body (spring + refs + local
     top-k + merge, no intersection/update/normalize), chained by
     folding a hash of the merged ids back into the positions carry so
     every iteration stays data-dependent.
  D. sharded SPRING-only loop (_debug_spring: gathers + fold +
     all_gathers + overflow + normalize).
  E. single-chip SPRING-only loop (same math minus the shard_map
     machinery, built directly from the engine's tables).

B - C = the sharded tail; D - E = the spring-section gap.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np

ITERS = 50
FORCE = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
             sample_size=512)


def time_block(name, fn, pos0, key0):
    import jax
    import jax.numpy as jnp

    # the engines DONATE the position/key buffers — give each program
    # its own copies so timing A doesn't delete B's inputs
    pos, key = fn(jnp.array(pos0, copy=True), jnp.array(key0, copy=True))
    jax.block_until_ready(pos)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pos, key = fn(pos, key)
        np.asarray(pos[:2])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best/ITERS*1e3:8.2f} ms/iter", flush=True)
    return best / ITERS


def main():
    import jax
    import jax.numpy as jnp

    import graphem_rapids_tpu as gr
    from graphem_rapids_tpu.parallel import make_mesh
    from graphem_rapids_tpu.parallel.sharded_step import (
        build_sharded_step,
        pad_edges,
    )

    from experiments.bench_1m import build_adj

    adj = build_adj()
    mesh = make_mesh(1)

    single = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random", **FORCE,
    )
    E = single.n_edges
    pos0 = jnp.asarray(np.asarray(single.positions), jnp.float32)
    if single._perm is not None:
        pos0 = pos0[jnp.asarray(np.asarray(single._perm))]
    key0 = jax.random.PRNGKey(7)

    # A: single-chip fused loop
    ops_single = single._step_ops
    ms = single._multi_step

    def run_single(pos, key):
        return ms(pos, key, ops_single, num_steps=ITERS)

    time_block("A single multi_step", run_single, pos0, key0)
    nb = single._nb
    del single

    common = dict(
        n_components=3, k_attr=FORCE["k_attr"], L_min=FORCE["L_min"],
        k_inter=FORCE["k_inter"], n_neighbors=FORCE["n_neighbors"],
        sample_size=FORCE["sample_size"], nb=nb,
        fused_refs=True, use_binfold_local=True,
    )
    edges_int = np.asarray(nb["edges_int"])
    edges_p, valid = pad_edges(edges_int, 1)
    edges_p, valid = jnp.asarray(edges_p), jnp.asarray(valid)

    # B: sharded fused loop
    _, multi, ops_sh = build_sharded_step(mesh, nb["n"], E, **common)

    def run_sharded(pos, key):
        return multi(pos, edges_p, valid, key, ops_sh, num_steps=ITERS)

    time_block("B sharded multi_step", run_sharded, pos0, key0)

    # C: sharded debug loop (body minus intersection/update/normalize),
    # chained via a cheap data-dependent fold of the merged ids
    built = build_sharded_step(
        mesh, nb["n"], E, _debug_knn=True, return_raw=True, **common
    )
    raw_dbg = built[3]
    ops_dbg = built[2]
    from graphem_rapids_tpu.ops.sampling import sample_indices

    @jax.jit
    def run_debug(pos, key):
        def body(_, carry):
            pos, key = carry
            key, sub = jax.random.split(key)
            s = sample_indices(sub, E, FORCE["sample_size"])
            knn_idx, _ = raw_dbg(pos, edges_p, valid, s, ops_dbg)
            # fold the ids into the carry (keeps the chain data-
            # dependent; adds one scalar-broadcast multiply)
            h = 1.0 + 1e-20 * knn_idx.sum().astype(jnp.float32)
            return pos * h, key

        return jax.lax.fori_loop(0, ITERS, body, (pos, key))

    time_block("C sharded debug loop (no tail)", run_debug, pos0, key0)

    # D: sharded spring-only loop
    _, multi_sp, ops_sp = build_sharded_step(
        mesh, nb["n"], E, _debug_spring=True, **common
    )

    def run_sharded_spring(pos, key):
        return multi_sp(pos, edges_p, valid, key, ops_sp,
                        num_steps=ITERS)

    time_block("D sharded spring-only loop", run_sharded_spring,
               pos0, key0)

    # E: single-chip spring-only loop, built from the engine's tables
    from graphem_rapids_tpu.ops.forces import spring_forces_binned

    ov_block = (
        nb["overflow_plan"]["block"] if nb.get("overflow_plan") else None
    )

    @jax.jit
    def run_single_spring(pos, key):
        def body(_, carry):
            pos, key = carry
            pn_list = [pos[t] for t in ops_single["tables"]]
            plan_rt = (
                {**ops_single["ov_plan"], "block": ov_block}
                if "ov_plan" in ops_single else None
            )
            s = spring_forces_binned(
                pos, pn_list, nb, FORCE["k_attr"], FORCE["L_min"],
                ops_single.get("nb_overflow"), plan_rt,
            )
            s0 = s - jnp.mean(s, axis=0, keepdims=True)
            s0 = s0 / (jnp.std(s0, axis=0, keepdims=True, ddof=1) + 1e-6)
            return s0, key

        return jax.lax.fori_loop(0, ITERS, body, (pos, key))

    time_block("E single spring-only loop", run_single_spring, pos0, key0)


if __name__ == "__main__":
    main()
