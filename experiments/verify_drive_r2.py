import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
import numpy as np
from scipy.stats import spearmanr
import graphem_rapids_tpu as gr

adj = gr.erdos_renyi_graph(n=500, p=0.02, seed=3)
emb = gr.create_graphem(adj, n_components=3, seed=42, verbose=False)
pos = emb.run_layout(num_iterations=30)
assert pos.shape == (500, 3) and np.isfinite(pos).all()
deg = np.asarray(adj.sum(axis=1)).ravel()
radius = np.linalg.norm(pos - pos.mean(0), axis=1)
rho = spearmanr(radius, deg).statistic
assert rho > 0.5, rho
seeds = gr.graphem_seed_selection(emb, k=10, num_iterations=5)
spread = gr.estimated_influence(adj, seeds, p=0.1, num_sims=32)
rng = np.random.default_rng(0)
rand = gr.estimated_influence(adj, rng.choice(500, 10, replace=False).tolist(), p=0.1, num_sims=32)
assert spread > rand, (spread, rand)
print(f"quickstart OK: rho={rho:.3f} spread={spread:.1f} > random {rand:.1f}")

# bad inputs
for fn, kw in [
    (lambda: gr.create_graphem(np.zeros((3, 4)), n_components=2), {}),
    (lambda: gr.create_graphem(adj, n_components=0), {}),
    (lambda: gr.create_graphem(adj, backend="bogus"), {}),
]:
    try:
        fn(); raise SystemExit("expected ValueError")
    except (ValueError, TypeError):
        pass
print("bad-input probes OK")

# sharded embedder w/ chebyshev init + binfold local top-k on the real chip
from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh
emb_s = ShardedGraphEmbedder(adj, n_components=3, mesh=make_mesh(1), seed=0,
                             verbose=False, init="chebyshev",
                             sample_size=128, n_neighbors=8,
                             fused_midpoints=True, use_binfold_local=True)
emb_s.run_layout(num_iterations=10)
assert np.isfinite(np.asarray(emb_s.positions)).all()
print("sharded chebyshev+binfold drive OK")
