import sys; sys.path.insert(0, "/root/repo")
import cProfile, pstats, io, time
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from experiments.probe_10m import build_adj
from graphem_rapids_tpu.models.embedder import GraphEmbedderTPU
from graphem_rapids_tpu.ops import forces as F
import logging

adj = build_adj()
s = object.__new__(GraphEmbedderTPU); s.verbose=False; s.logger=logging.getLogger("x")
t0=time.perf_counter(); edges = GraphEmbedderTPU._extract_edges_from_adjacency(s, adj); print("extract", time.perf_counter()-t0)
pr = cProfile.Profile(); pr.enable()
nbb = F.build_neighbor_table_binned(edges, adj.shape[0], overhead_rows=4096)
pr.disable()
st = pstats.Stats(pr); st.sort_stats("cumulative"); st.print_stats(25)
