import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import graphem_rapids_tpu as gr
from graphem_rapids_tpu.parallel import build_sharded_step, make_mesh
from graphem_rapids_tpu.parallel.sharded_step import pad_edges
from graphem_rapids_tpu.ops.forces import build_neighbor_table

n, k, S = 600, 8, 128
adj = gr.generate_random_regular(n=n, d=8, seed=3)
rows, cols = adj.nonzero()
mask = rows < cols
edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int64)
E = len(edges)
mesh = make_mesh(4)
nb = build_neighbor_table(edges, n)
pos = np.random.default_rng(1).standard_normal((n, 3)).astype(np.float32)
edges_p, valid = pad_edges(edges, 4)
key = jax.random.PRNGKey(0)

def exact_gt(pos, sampled):
    mids = (pos[edges[:, 0]] + pos[edges[:, 1]]) / 2.0
    q = mids[sampled]
    d2 = ((q[:, None, :] - mids[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d2, axis=1)[:, :k + 2]
    return [ [j for j in r if j != s][:k] for r, s in zip(order, sampled) ]

for name, kw in [
    ("unfused approx bf16", dict(use_approx_local=True, knn_dtype=jnp.bfloat16)),
    ("fused approx bf16", dict(use_approx_local=True, knn_dtype=jnp.bfloat16, fused_refs=True, nb=nb)),
    ("fused binfold bf16", dict(use_approx_local=True, use_binfold_local=True, knn_dtype=jnp.bfloat16, fused_refs=True, nb=nb)),
    ("ring approx bf16", dict(use_approx_local=True, knn_dtype=jnp.bfloat16, knn_comm="ring")),
]:
    step, _, ops = build_sharded_step(
        mesh, n, E, n_components=3, k_attr=0.2, L_min=1.0, k_inter=0.5,
        n_neighbors=k, sample_size=S, _debug_knn=True, **kw)
    (knn_idx, sampled), _ = step(jnp.asarray(pos), jnp.asarray(edges_p),
                                 jnp.asarray(valid), key, ops)
    knn_idx, sampled = np.asarray(knn_idx), np.asarray(sampled)
    gt = exact_gt(pos, sampled)
    recalls = [len(set(sel) & set(g)) / k for sel, g in zip(knn_idx, gt)]
    print(f"{name:24s} mean={np.mean(recalls):.4f} min={np.min(recalls):.4f}")
