"""Phase-attribute the 10M-vertex init (BASELINE 247.6 s, VERDICT r1 #5).

Host-only (CPU platform): every phase below is numpy/scipy work; the
device placement of the finished tables is not the bottleneck.
"""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from experiments.probe_10m import build_adj


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:42s} {time.perf_counter()-t0:8.1f}s", flush=True)
    return out


adj = t("graph build/load (npz cache)", build_adj)

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.models.embedder import GraphEmbedderTPU
from graphem_rapids_tpu.ops import forces as F

emb_cls = GraphEmbedderTPU
self_like = object.__new__(emb_cls)
self_like.verbose = False
import logging
self_like.logger = logging.getLogger("x")
adj_v = t("validate_adjacency", lambda: emb_cls._validate_adjacency(self_like, adj))
edges_np = t("extract_edges", lambda: emb_cls._extract_edges_from_adjacency(self_like, adj_v))
print(f"  E = {len(edges_np)}")
nbb = t("build_neighbor_table_binned", lambda: F.build_neighbor_table_binned(edges_np, adj_v.shape[0], overhead_rows=4096))
nb = t("build_neighbor_table (flat)", lambda: F.build_neighbor_table(edges_np, adj_v.shape[0]))
rng = np.random.default_rng(0)
t("random init", lambda: rng.standard_normal((adj_v.shape[0], 3)).astype(np.float32))
