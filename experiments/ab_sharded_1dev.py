"""A/B the sharded step on a 1-device TPU mesh.

First hardware run of the sharded program measured 239 ms/iter at the
100K bench workload vs 7.7 ms for the single-chip step — ~30x, far more
than the missing fused-midpoints path explains. Variants isolate the
local-top-k flavor and the spring formulation to find the toll.
"""

import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import jax
import jax.numpy as jnp
import numpy as np

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.ops.forces import build_neighbor_table
from graphem_rapids_tpu.parallel import make_mesh
from graphem_rapids_tpu.parallel.sharded_step import (
    build_sharded_step,
    pad_edges,
)

N, DEG, D, S, K = 100_000, 8, 3, 512, 15


def run_variant(name, mesh, n, edges_np, nb, **kw):
    E = len(edges_np)
    step, multi, ops = build_sharded_step(
        mesh, n, E, n_components=D, k_attr=0.5, L_min=10.0, k_inter=0.1,
        n_neighbors=K, sample_size=S, nb=nb, **kw,
    )
    edges_p, valid = pad_edges(edges_np, 1)
    edges_p, valid = jnp.asarray(edges_p), jnp.asarray(valid)
    pos = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, D)), jnp.float32
    )
    key = jax.random.PRNGKey(0)
    out = multi(pos, edges_p, valid, key, ops, num_steps=50)
    # block_until_ready measured as a no-op through the axon runtime for
    # these outputs — sync via a real host transfer instead
    float(np.asarray(out[0])[0, 0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = multi(pos, edges_p, valid, key, ops, num_steps=50)
        float(np.asarray(out[0])[0, 0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best/50*1e3:8.1f} ms/iter "
          f"({E*50/best/1e6:.1f}M edges/s)", flush=True)


def main():
    adj = gr.generate_random_regular(n=N, d=DEG, seed=0)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges_np = np.column_stack([rows[mask], cols[mask]]).astype(np.int64)
    nb = build_neighbor_table(edges_np, N)
    mesh = make_mesh(1)

    run_variant("approx local top-k (auto)", mesh, N, edges_np, nb)
    run_variant("exact local top-k", mesh, N, edges_np, nb,
                use_approx_local=False)
    run_variant("no nbtable (segment-sum spring)", mesh, N, edges_np, None)


if __name__ == "__main__":
    import os

    os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
    main()
