"""Full 10M constructor with the C edge extractor (VERDICT r1 #5 target <150s)."""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

from experiments.probe_10m import build_adj

t0 = time.perf_counter()
adj = build_adj()
print(f"graph load: {time.perf_counter()-t0:.1f}s", flush=True)

from graphem_rapids_tpu.models.embedder import GraphEmbedderTPU

t0 = time.perf_counter()
emb = GraphEmbedderTPU(adj, n_components=3, seed=0, verbose=False,
                       init="random", L_min=10.0, k_attr=0.5, k_inter=0.1,
                       n_neighbors=15, sample_size=512)
print(f"FULL constructor (C extract): {time.perf_counter()-t0:.1f}s",
      flush=True)
print(f"edges dtype: {emb._edges_np.dtype}  E={emb.n_edges}", flush=True)
