"""Per-component warm timings of the layout step at the 100K bench tier.

Times each piece of the iteration in isolation (jitted, block_until_ready,
median of reps) to attribute the step budget. Run on the real TPU.
"""

import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import jax
import jax.numpy as jnp
import numpy as np

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.ops.forces import (
    build_neighbor_table,
    intersection_forces,
    midpoint_refs_from_gathered,
    spring_forces_from_gathered,
)
from graphem_rapids_tpu.ops.knn import _oneshot_approx

N, DEG, D, S, K = 100_000, 8, 3, 512, 16


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:45s} {np.median(ts)*1e3:8.3f} ms")
    return out


def main():
    import networkx as nx
    import scipy.sparse as sp

    G = nx.random_regular_graph(DEG, N, seed=0)
    adj = sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges_np = np.column_stack([rows[mask], cols[mask]]).astype(np.int64)
    E = len(edges_np)
    print(f"n={N} E={E} d={D} S={S} k={K}")

    nb = build_neighbor_table(edges_np, N)
    edges = jnp.asarray(edges_np, jnp.int32)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    sampled = jnp.asarray(rng.permutation(E)[:S].astype(np.int32))

    # -- gathers
    gather_pn = jax.jit(lambda p: p[nb["table"]])
    pn = timeit("gather pn = p[table]  (n*deg rows)", gather_pn, p)

    gather_mid = jax.jit(
        lambda p: (p[edges[:, 0]] + p[edges[:, 1]]) * 0.5
    )
    mid = timeit("midpoints direct (2 edge gathers)", gather_mid, p)

    # -- spring
    spring = jax.jit(
        lambda p: spring_forces_from_gathered(
            p, p[nb["table"]], nb, 0.5, 10.0, None
        )
    )
    timeit("spring (gather + row-sum)", spring, p)

    # -- refs construction from pn (excl. the pn gather itself)
    refs_fn = jax.jit(
        lambda p, pn: midpoint_refs_from_gathered(p, pn, nb, None)
    )
    refs = timeit("fused refs from pn (VPU only)", refs_fn, p, pn)

    # -- sampling
    perm = jax.jit(
        lambda k: jax.random.permutation(k, E)[:S].astype(jnp.int32)
    )
    timeit("sampling: permutation", perm, key)

    def fast_sample(k):
        u = jax.random.uniform(k, (E,))
        _, idx = jax.lax.approx_max_k(u, S)
        return idx.astype(jnp.int32)

    timeit("sampling: uniforms + approx_max_k", jax.jit(fast_sample), key)

    # -- kNN one-shot approx
    q_direct = mid[sampled]
    timeit("knn one-shot approx 512 x 400K (direct)",
           lambda q, r: _oneshot_approx(q, r, K + 1), q_direct, mid)

    q_fused = refs[nb["edge_ref"][sampled]]
    timeit("knn one-shot approx 512 x 800K (fused)",
           lambda q, r: _oneshot_approx(q, r, K + 1), q_fused, refs)


    # -- kNN binfold kernel (fused distance + bin-min, phase-2 top-k)
    from graphem_rapids_tpu.ops.knn_binfold import knn_binfold

    timeit("knn binfold 512 x 400K (direct)",
           lambda q, r: knn_binfold(q, r, K + 1), q_direct, mid)
    timeit("knn binfold 512 x 800K (fused refs)",
           lambda q, r: knn_binfold(q, r, K + 1), q_fused, refs)

    # -- intersection forces
    slot_idx, _ = _oneshot_approx(q_fused, refs, K + 1)
    knn_idx = nb["ref_edge"][slot_idx[:, 1:]]
    inter = jax.jit(
        lambda p, ki: intersection_forces(p, edges, ki, sampled, 0.1)
    )
    timeit("intersection forces (S*k pairs)", inter, p, knn_idx)

    # -- full steps via the embedder (fused toggles internally on strategy)
    emb = gr.GraphEmbedderTPU(
        adj, n_components=D, seed=0, verbose=False, L_min=10.0, k_attr=0.5,
        k_inter=0.1, n_neighbors=15, sample_size=512,
    )
    emb.run_layout(num_iterations=10, block_size=10)  # warm the block

    t0 = time.perf_counter()
    emb.run_layout(num_iterations=50, block_size=10)
    dt = time.perf_counter() - t0
    print(f"{'full step (50-iter fused blocks, amortized)':45s} "
          f"{dt/50*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
