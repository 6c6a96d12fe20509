"""A/B full-step variants at the 100K tier, amortized over fused blocks.

Isolated dispatches carry ~26 ms of tunnel round-trip overhead
(experiments/profile_step_100k.py), so every variant here is timed as a
50-iteration run in 10-step fused blocks — the bench configuration.
Also probes one-shot kNN cost vs reference count and dtype.
"""

import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import jax
import jax.numpy as jnp
import numpy as np

N, DEG, D, S, K = 100_000, 8, 3, 512, 16


def block_time(label, run, iters=50):
    run(10)  # warm/compile
    t0 = time.perf_counter()
    run(iters)
    dt = time.perf_counter() - t0
    print(f"{label:50s} {dt/iters*1e3:8.3f} ms/iter")


def main():
    import networkx as nx
    import scipy.sparse as sp

    import graphem_rapids_tpu as gr

    G = nx.random_regular_graph(DEG, N, seed=0)
    adj = sp.csr_matrix(nx.adjacency_matrix(G, dtype=int))

    kw = dict(n_components=D, seed=0, verbose=False, L_min=10.0,
              k_attr=0.5, k_inter=0.1, n_neighbors=15, sample_size=512)

    for fused in (True, False):
        emb = gr.GraphEmbedderTPU(adj, fused_midpoints=fused, **kw)
        block_time(f"full step fused_midpoints={fused}",
                   lambda n, e=emb: e.run_layout(n, block_size=10))

    # --- one-shot kNN cost vs ref count and dtype, measured inside one
    # dispatch (loop the op 20x per dispatch to swamp the tunnel latency)
    rng = np.random.default_rng(0)

    def knn_loop_cost(label, E_refs, dtype):
        refs = jnp.asarray(
            rng.standard_normal((E_refs, D)).astype(np.float32)
        ).astype(dtype)
        qs = refs[:S]

        @jax.jit
        def many(qs, refs):
            def body(i, acc):
                d2q = qs + acc * 1e-20  # perturb to defeat CSE
                diff = d2q[:, None, :] - refs[None, :, :]
                d2 = jnp.sum(diff * diff, axis=-1)
                _, idx = jax.lax.approx_min_k(d2.astype(jnp.float32), K + 1)
                return acc + idx[0, 0].astype(qs.dtype) * 1e-20
            return jax.lax.fori_loop(0, 20, body, jnp.zeros((), qs.dtype))

        jax.block_until_ready(many(qs, refs))
        t0 = time.perf_counter()
        jax.block_until_ready(many(qs, refs))
        dt = time.perf_counter() - t0
        print(f"{label:50s} {dt/20*1e3:8.3f} ms/op")

    for E_refs in (400_000, 800_000):
        for dtype in (jnp.float32, jnp.bfloat16):
            knn_loop_cost(
                f"one-shot knn {S}x{E_refs//1000}K {dtype.__name__}",
                E_refs, dtype,
            )


if __name__ == "__main__":
    main()
