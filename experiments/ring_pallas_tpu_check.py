"""1-device real-TPU compile+run check of the ring_pallas kNN merge."""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import os

os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.parallel import ShardedGraphEmbedder, make_mesh

adj = gr.generate_random_regular(n=2000, d=8, seed=0)
emb = ShardedGraphEmbedder(
    adj, n_components=3, mesh=make_mesh(1), seed=0, verbose=False,
    sample_size=128, n_neighbors=8, knn_comm="ring_pallas",
    fused_midpoints=True,
)
emb.run_layout(num_iterations=10)
pos = np.asarray(emb.positions)
assert np.isfinite(pos).all()

# same graph through the all_gather merge: trajectories should be close
# (ring_pallas is approximate; same init + same sample keys)
emb2 = ShardedGraphEmbedder(
    adj, n_components=3, mesh=make_mesh(1), seed=0, verbose=False,
    sample_size=128, n_neighbors=8, fused_midpoints=True,
)
emb2.run_layout(num_iterations=10)
rel = np.linalg.norm(pos - np.asarray(emb2.positions)) / np.linalg.norm(
    np.asarray(emb2.positions))
print(f"ring_pallas TPU OK: rel drift vs all_gather merge = {rel:.4f}")
assert rel < 0.2, rel
