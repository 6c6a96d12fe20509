"""Real-TPU phase attribution of the 10M init (VERDICT r1 #5 / BASELINE 247.6s)."""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import logging
import time

import numpy as np

from experiments.probe_10m import build_adj

t0 = time.perf_counter()
adj = build_adj()
print(f"graph load: {time.perf_counter()-t0:.1f}s", flush=True)

import jax

from graphem_rapids_tpu.models.embedder import GraphEmbedderTPU
from graphem_rapids_tpu.ops import forces as F

dev = jax.devices()[0]
print("device:", dev, flush=True)

s = object.__new__(GraphEmbedderTPU)
s.verbose = False
s.logger = logging.getLogger("x")

t0 = time.perf_counter()
edges = GraphEmbedderTPU._extract_edges_from_adjacency(s, adj)
print(f"extract_edges: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
nbb = F.build_neighbor_table_binned(edges, adj.shape[0], overhead_rows=4096)
print(f"binned build (host): {time.perf_counter()-t0:.1f}s", flush=True)

import jax.numpy as jnp

t0 = time.perf_counter()
put = {}
for k in ("ref_edge", "ref_valid", "edge_ref", "edges_int"):
    put[k] = jnp.asarray(nbb[k]) if k in nbb else None
tabs = [jnp.asarray(np.asarray(g["table"])) for g in nbb["buckets"]]
for v in put.values():
    if v is not None:
        v.block_until_ready()
for t_ in tabs:
    t_.block_until_ready()
nbytes = sum(int(np.asarray(g["table"]).nbytes) for g in nbb["buckets"]) + sum(
    v.nbytes for v in put.values() if v is not None)
print(f"device upload: {time.perf_counter()-t0:.1f}s ({nbytes/1e6:.0f} MB)",
      flush=True)

t0 = time.perf_counter()
emb = GraphEmbedderTPU(adj, n_components=3, seed=0, verbose=False,
                       init="random", L_min=10.0, k_attr=0.5, k_inter=0.1,
                       n_neighbors=15, sample_size=512)
print(f"FULL constructor: {time.perf_counter()-t0:.1f}s", flush=True)
