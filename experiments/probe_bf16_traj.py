import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from scipy.stats import spearmanr
import graphem_rapids_tpu as gr
from graphem_rapids_tpu.parallel import build_sharded_step, make_mesh
from graphem_rapids_tpu.parallel.sharded_step import pad_edges
from graphem_rapids_tpu.ops.forces import build_neighbor_table

n, k, S = 600, 8, 128
adj = gr.erdos_renyi_graph(n=n, p=0.02, seed=5)
rows, cols = adj.nonzero()
mask = rows < cols
edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int64)
E = len(edges)
deg = np.asarray(adj.sum(axis=1)).ravel()
mesh = make_mesh(4)
nb = build_neighbor_table(edges, n)
pos0 = np.random.default_rng(1).standard_normal((n, 3)).astype(np.float32)
edges_p, valid = pad_edges(edges, 4)

def run(kw, steps=30):
    step, multi, ops = build_sharded_step(
        mesh, n, E, n_components=3, k_attr=0.5, L_min=10.0, k_inter=0.1,
        n_neighbors=k, sample_size=S, **kw)
    pos, _ = multi(jnp.asarray(pos0), jnp.asarray(edges_p),
                   jnp.asarray(valid), jax.random.PRNGKey(0), ops,
                   num_steps=steps)
    pos = np.asarray(pos)
    radius = np.linalg.norm(pos - pos.mean(0), axis=1)
    return pos, spearmanr(radius, deg).statistic

p_exact, rho_exact = run(dict(use_approx_local=False, knn_dtype=None))
p_forced, rho_forced = run(dict(use_approx_local=True, knn_dtype=jnp.bfloat16,
                                fused_refs=True, nb=nb))
rel = np.linalg.norm(p_forced - p_exact) / np.linalg.norm(p_exact)
print(f"rho exact={rho_exact:.4f} forced={rho_forced:.4f} "
      f"drift={abs(rho_exact-rho_forced):.4f} relpos={rel:.4f}")
