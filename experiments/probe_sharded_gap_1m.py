"""Attribute the sharded-vs-single 1-device gap at 1M (VERDICT r3).

The r3 A/B measured the production sharded program 1.072x the
single-chip step at 1M vertices (78.25 vs 73.02 ms/iter). This splits
both programs at the kNN-merge boundary:

- sharded FULL vs sharded _debug_knn (stops after the merged neighbor
  set): the difference is the intersection+update+normalize tail;
- single-chip _raw_step vs the same tail from the r2 phase attribution.

Per-dispatch timings vary an input per call (CLAUDE.md discipline); the
~26 ms tunnel round-trip cancels in the differences.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np

ITERS = 30
FORCE = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
             sample_size=512)


def time_dispatch(name, fn, pos_host, *args):
    import jax.numpy as jnp

    out = fn(jnp.asarray(pos_host), *args)
    import jax

    jax.block_until_ready(out)
    best = float("inf")
    for t in range(ITERS):
        p = jnp.asarray(pos_host + np.float32(1e-6 * (t + 1)))
        t0 = time.perf_counter()
        o = fn(p, *args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf[:2])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:8.2f} ms/dispatch", flush=True)
    return best


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
    E = adj.nnz // 2
    n = adj.shape[0]
    mesh = make_mesh(1)

    single = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random", **FORCE,
    )
    pos_host = np.asarray(single.positions).astype(np.float32)
    key = jax.random.PRNGKey(7)
    sampled = jnp.asarray(
        np.sort(np.random.default_rng(0).choice(
            single.n_edges, FORCE["sample_size"], replace=False
        )).astype(np.int32)
    )
    if single._edge_map is not None:
        sampled_single = jnp.asarray(
            np.asarray(single._edge_map)[np.asarray(sampled)], jnp.int32
        )
    else:
        sampled_single = sampled
    if single._perm is not None:
        pos_single = pos_host[np.asarray(single._perm)]
    else:
        pos_single = pos_host

    t_single_full = time_dispatch(
        "single-chip raw_step (full)", single._raw_step, pos_single,
        sampled_single, single._step_ops,
    )
    nb = single._nb
    edge_map = single._edge_map
    del single

    common = dict(
        n_components=3, k_attr=FORCE["k_attr"], L_min=FORCE["L_min"],
        k_inter=FORCE["k_inter"], n_neighbors=FORCE["n_neighbors"],
        sample_size=FORCE["sample_size"], nb=nb,
        fused_refs=True, use_binfold_local=True,
    )
    edges_int = np.asarray(nb["edges_int"]) if nb is not None and \
        "buckets" in nb else None
    edges_p, valid = pad_edges(edges_int, 1)
    edges_p, valid = jnp.asarray(edges_p), jnp.asarray(valid)
    sampled_int = (
        jnp.asarray(np.asarray(edge_map)[np.asarray(sampled)], jnp.int32)
        if edge_map is not None else sampled
    )

    for dbg, label in ((True, "sharded debug (spring+refs+kNN+merge)"),
                       (False, "sharded full (raw)")):
        built = build_sharded_step(
            mesh, n, E, _debug_knn=dbg, return_raw=True, **common
        )
        raw = built[3]

        def call(p, raw=raw):
            return raw(p, edges_p, valid, sampled_int, built[2])

        time_dispatch(label, call, pos_single)


if __name__ == "__main__":
    main()
