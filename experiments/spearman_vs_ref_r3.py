"""Measure Spearman(radius_ref, radius_tpu) directly (VERDICT r2 #5).

BASELINE.json's ">= 0.98 Spearman vs reference behavior" target had only
been argued from step-level allclose parity; this runs the reference
PyTorch-CPU engine (/root/reference) and the TPU engine side by side at
the BASELINE configs and reports the actual radius-vs-radius rank
correlation.

Controls (SURVEY §7.2 M0 parity discipline):
- identical adjacency (our generators feed both ctors),
- identical initial positions (the reference's spectral init is copied
  into the TPU engine via the positions setter),
- identical per-iteration midpoint samples: a host RNG draws the sample
  indices and injects them into BOTH engines — the TPU engine's
  update_positions(sample_indices=...) hook, and a transcription of the
  reference's _locate_knn_midpoints with the torch.randperm draw
  replaced by the injected indices (reference embedder_pytorch.py:
  404-421; the kNN itself still runs the reference's own
  _compute_knn_chunked).

So the only divergence left is accumulated fp32 arithmetic differences
(XLA fused ops vs torch kernels) — exactly what the target bounds.

Usage: python experiments/spearman_vs_ref_r3.py [--quick]
"""

import os
import sys
import time
import types

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np
from scipy.stats import spearmanr


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_reference():
    """Import the reference engine with its display/scoring deps stubbed
    (same pattern as bench.py --calibrate)."""
    plotly = _stub("plotly")
    plotly.graph_objects = _stub(
        "plotly.graph_objects", Scatter=object, Scatter3d=object,
        Figure=object,
    )
    plotly.express = _stub("plotly.express", scatter=lambda *a, **k: None)
    _stub("ndlib")
    _stub("ndlib.models")
    _stub("ndlib.models.ModelConfig", Configuration=object)
    _stub("ndlib.models.epidemics", IndependentCascadesModel=object)

    class _Logger:
        def __getattr__(self, k):
            return lambda *a, **kw: None

    _stub("loguru", logger=_Logger())
    sys.path.insert(0, "/root/reference")
    from graphem_rapids.backends.embedder_pytorch import (
        GraphEmbedderPyTorch,
    )

    return GraphEmbedderPyTorch


def inject_reference_samples(ref_emb, sample_iter):
    """Replace the reference's internal torch.randperm draw with injected
    indices (transcribes embedder_pytorch.py:404-421 minus the draw)."""
    import torch

    def _locate(midpoints, k):
        idx = torch.as_tensor(
            next(sample_iter), dtype=torch.long, device=ref_emb.device
        )
        sampled_midpoints = midpoints[idx]
        knn = ref_emb._compute_knn_chunked(sampled_midpoints, midpoints,
                                           k + 1)
        return knn[:, 1:], idx

    ref_emb._locate_knn_midpoints = _locate


def run_config(name, adj, iters, force, RefCls, gr):
    E = adj.nnz // 2
    S = min(force["sample_size"], E)
    print(f"\n[{name}] n={adj.shape[0]} E={E} iters={iters}", flush=True)

    t0 = time.perf_counter()
    ref = RefCls(adj, n_components=3, device="cpu", verbose=False, seed=0,
                 **force)
    pos0 = np.array(ref.positions, dtype=np.float32)
    tpu = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, **force,
    )
    tpu.positions = pos0  # identical init (kills eigsh sign/order noise)
    print(f"  init {time.perf_counter()-t0:.1f}s "
          f"(tpu strategy={tpu._resolved_strategy()})", flush=True)

    rng = np.random.default_rng(123)
    samples = [
        np.sort(rng.choice(E, size=S, replace=False)) for _ in range(iters)
    ]
    inject_reference_samples(ref, iter(samples))

    t0 = time.perf_counter()
    for s in samples:
        tpu.update_positions(sample_indices=s)
    pos_tpu = tpu.positions
    t_tpu = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        ref.update_positions()
    pos_ref = np.array(ref.positions)
    t_ref = time.perf_counter() - t0

    r_ref = np.linalg.norm(pos_ref, axis=1)
    r_tpu = np.linalg.norm(pos_tpu, axis=1)
    rho = spearmanr(r_ref, r_tpu).statistic
    drift = (np.linalg.norm(pos_tpu - pos_ref)
             / max(np.linalg.norm(pos_ref), 1e-12))
    print(f"  ref {t_ref:.1f}s, tpu {t_tpu:.1f}s", flush=True)
    print(f"  Spearman(radius_ref, radius_tpu) = {rho:.4f}  "
          f"relative position drift = {drift:.2e}", flush=True)
    return rho


def main():
    quick = "--quick" in sys.argv
    RefCls = load_reference()
    import graphem_rapids_tpu as gr

    force = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
                 sample_size=512)
    rows = []

    adj = gr.erdos_renyi_graph(n=1000, p=0.01, seed=7)
    rows.append(("config1 ER n=1000 p=0.01, 50 iters",
                 run_config("config 1: ER n=1000", adj, 50, force,
                            RefCls, gr)))

    f2 = dict(force, n_neighbors=10)
    adj = gr.generate_random_regular(n=10_000, d=8, seed=7)
    rows.append(("config2 random-regular n=10K deg=8, 30 iters",
                 run_config("config 2: RR n=10K", adj, 30, f2,
                            RefCls, gr)))

    if not quick:
        adj = gr.generate_sbm(
            n_per_block=25_000, num_blocks=4, p_in=0.0004, p_out=0.00002,
            seed=7,
        )
        rows.append(("config3 SBM n=100K, 20 iters",
                     run_config("config 3: SBM n=100K", adj, 20, force,
                                RefCls, gr)))

    print("\n| config | Spearman(radius_ref, radius_tpu) |", flush=True)
    print("|---|---|", flush=True)
    for name, rho in rows:
        print(f"| {name} | {rho:.4f} |", flush=True)


if __name__ == "__main__":
    main()
