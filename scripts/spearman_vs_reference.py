"""Spearman-vs-reference regression gate (BASELINE.json >= 0.98 target).

Runs the reference PyTorch-CPU engine (/root/reference) and the TPU
engine side by side and reports Spearman(radius_ref, radius_tpu) — the
rank correlation of the two engines' radial-centrality outputs, which is
what every downstream consumer ranks on (reference influence.py:10-37
seed selection, benchmark.py:166-243 correlation suite).

Promoted from experiments/spearman_vs_ref_r3.py (round-3 one-off) to a
committed, one-command regression: any step-math change that drifts the
trajectory shows up here before it ships. Exits nonzero if any config
lands under the 0.98 bar.

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
(XLA fused ops vs torch kernels) plus approximate-kNN recall on the
production strategies — exactly what the target bounds.

Configs (>= 5, per VERDICT r3 #3; 7-9 added per VERDICT r4 #5):
  1. ER n=1000, d=3, 50 iters      — exact-strategy tier
  2. RR n=10K deg 8, d=3, 30 iters — binfold tier (TPU production path)
  3. ER n=1000, d=2, 50 iters      — native-2D intersection geometry
  4. BA n=5000 m=5, d=3, 30 iters  — skewed/hub degree distribution
                                     (table-cap overflow machinery)
  5. ER n=2000, d=3, 120 iters     — long-horizon drift accumulation
  6. SBM n=100K, d=3, 20 iters     — large tier (skipped with --quick)
  7. ER n=1500, d=4, 50 iters      — top of the paper's 2-4D regime
  8. ER n=1000, d=3, 30 iters, ShardedGraphEmbedder on an 8-device
     virtual CPU mesh (exact local path) — the multi-chip step math
  9. same graph, sharded with the forced TPU-mesh shape (fused midpoint
     refs + binfold local top-k, interpret mode on CPU)
  10. SBM n=300K, d=3, 12 iters    — INSIDE the r5 lane-packed auto
      window, gating the packed default path (skipped with --quick)
Configs 8-9 run in a CPU-forced subprocess (the virtual mesh needs
xla_force_host_platform_device_count before jax initializes; the parent
process owns the real TPU for the others).

Usage: python scripts/spearman_vs_reference.py [--quick|--config10-only]
"""

import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E501
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import numpy as np
from scipy.stats import spearmanr

BAR = 0.98


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


def run_config(name, adj, iters, force, RefCls, gr, n_components=3,
               make_engine=None):
    E = adj.nnz // 2
    S = min(force["sample_size"], E)
    print(f"\n[{name}] n={adj.shape[0]} E={E} d={n_components} "
          f"iters={iters}", flush=True)

    t0 = time.perf_counter()
    ref = RefCls(adj, n_components=n_components, device="cpu",
                 verbose=False, seed=0, **force)
    pos0 = np.array(ref.positions, dtype=np.float32)
    if make_engine is None:
        def make_engine(adj, n_components, force):
            return gr.GraphEmbedderTPU(
                adj, n_components=n_components, seed=0, verbose=False,
                **force,
            )
    tpu = make_engine(adj, n_components, force)
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
    return rho, drift


def sharded_child(variant):
    """Configs 8-9: run in a fresh CPU process with an 8-device virtual
    mesh (conftest pattern). Prints one machine-readable RESULT line."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    RefCls = load_reference()
    import graphem_rapids_tpu as gr
    from graphem_rapids_tpu.parallel.mesh import make_mesh

    force = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
                 sample_size=512)
    mesh = make_mesh(8)
    assert len(list(mesh.devices.flat)) == 8, mesh

    if variant == "exact":
        adj = gr.erdos_renyi_graph(n=1000, p=0.01, seed=7)
        iters, kw = 30, {}
    else:  # forced TPU-mesh shape: fused refs + binfold local (interpret)
        adj = gr.erdos_renyi_graph(n=500, p=0.02, seed=7)
        iters, kw = 12, dict(fused_midpoints=True, use_binfold_local=True)

    def make_engine(adj, n_components, force):
        emb = gr.ShardedGraphEmbedder(
            adj, n_components=n_components, mesh=mesh, seed=0,
            verbose=False, **kw, **force,
        )
        if kw.get("fused_midpoints"):
            assert emb._fused_refs_active, "fused refs did not engage"
        return emb

    rho, drift = run_config(
        f"config sharded-{variant} (8-dev virtual mesh)", adj, iters,
        force, RefCls, gr, make_engine=make_engine,
    )
    print(f"RESULT {rho:.6f} {drift:.6e}", flush=True)


def run_sharded_subprocess(variant):
    import re
    import subprocess

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--_sharded-child", variant],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"sharded child {variant} rc={proc.returncode}")
    m = re.search(r"^RESULT ([\d.+-eE]+) ([\d.+-eE]+)", proc.stdout,
                  re.MULTILINE)
    if not m:
        raise RuntimeError(f"no RESULT line from sharded child {variant}")
    return float(m.group(1)), float(m.group(2))


def _append_config10(rows, force, RefCls, gr):
    """config10: a graph INSIDE the lane-packed auto window [250K, 2.5M)
    so the r5 packed default path is itself reference-gated (the packed
    select is value-identical by construction; this pins the whole
    composed step)."""
    adj = gr.generate_sbm(
        n_per_block=75_000, num_blocks=4, p_in=0.0001,
        p_out=0.00001, seed=17,
    )

    def make_packed_engine(adj, n_components, force):
        emb = gr.GraphEmbedderTPU(
            adj, n_components=n_components, seed=0, verbose=False,
            **force,
        )
        if emb._ref_order_platform() == "tpu":
            assert emb._packed_gather_active, (
                "config10 expects the packed window engaged"
            )
        return emb

    rows.append((
        "config10 SBM n=300K, d=3, 12 iters (PACKED window)",
        *run_config("config 10: SBM n=300K packed", adj, 12, force,
                    RefCls, gr, make_engine=make_packed_engine),
    ))


def _report(rows):
    print("\n| config | Spearman(radius_ref, radius_tpu) | rel. drift |",
          flush=True)
    print("|---|---|---|", flush=True)
    ok = True
    for name, rho, drift in rows:
        flag = "" if rho >= BAR else "  **UNDER BAR**"
        ok &= rho >= BAR
        print(f"| {name} | {rho:.4f}{flag} | {drift:.2e} |", flush=True)
    if not ok:
        print(f"\nFAIL: at least one config under the {BAR} bar",
              flush=True)
        sys.exit(1)
    print(f"\nPASS: all {len(rows)} configs >= {BAR}", flush=True)


def main():
    if "--_sharded-child" in sys.argv:
        sharded_child(sys.argv[sys.argv.index("--_sharded-child") + 1])
        return
    quick = "--quick" in sys.argv
    # --config10-only: run just the packed-window config (a fast way to
    # gate a packed-path change without the full 25-minute matrix)
    only10 = "--config10-only" in sys.argv
    RefCls = load_reference()
    import graphem_rapids_tpu as gr

    force = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
                 sample_size=512)
    rows = []

    if only10:
        _append_config10(rows, force, RefCls, gr)
        _report(rows)
        return

    adj = gr.erdos_renyi_graph(n=1000, p=0.01, seed=7)
    rows.append(("config1 ER n=1000 p=0.01, d=3, 50 iters",
                 *run_config("config 1: ER n=1000", adj, 50, force,
                             RefCls, gr)))

    f2 = dict(force, n_neighbors=10)
    adj = gr.generate_random_regular(n=10_000, d=8, seed=7)
    rows.append(("config2 random-regular n=10K deg=8, d=3, 30 iters",
                 *run_config("config 2: RR n=10K", adj, 30, f2,
                             RefCls, gr)))

    adj = gr.erdos_renyi_graph(n=1000, p=0.01, seed=9)
    rows.append(("config3 ER n=1000 p=0.01, d=2, 50 iters",
                 *run_config("config 3: ER n=1000 d=2", adj, 50, force,
                             RefCls, gr, n_components=2)))

    adj = gr.generate_ba(n=5000, m=5, seed=7)
    rows.append(("config4 BA n=5000 m=5 (hub degrees), d=3, 30 iters",
                 *run_config("config 4: BA n=5000 hubs", adj, 30, force,
                             RefCls, gr)))

    adj = gr.erdos_renyi_graph(n=2000, p=0.01, seed=11)
    rows.append(("config5 ER n=2000 p=0.01, d=3, 120 iters",
                 *run_config("config 5: ER n=2000 long", adj, 120, force,
                             RefCls, gr)))

    if not quick:
        adj = gr.generate_sbm(
            n_per_block=25_000, num_blocks=4, p_in=0.0004, p_out=0.00002,
            seed=7,
        )
        rows.append(("config6 SBM n=100K, d=3, 20 iters",
                     *run_config("config 6: SBM n=100K", adj, 20, force,
                                 RefCls, gr)))

    adj = gr.erdos_renyi_graph(n=1500, p=0.008, seed=13)
    rows.append(("config7 ER n=1500 p=0.008, d=4, 50 iters",
                 *run_config("config 7: ER n=1500 d=4", adj, 50, force,
                             RefCls, gr, n_components=4)))

    if not quick:
        _append_config10(rows, force, RefCls, gr)

    print("\n[configs 8-9: sharded engine, 8-device virtual CPU mesh "
          "(subprocess)]", flush=True)
    rows.append(("config8 ER n=1000, d=3, 30 iters, SHARDED 8-dev mesh "
                 "(exact local)", *run_sharded_subprocess("exact")))
    rows.append(("config9 ER n=500, d=3, 12 iters, SHARDED 8-dev mesh "
                 "(fused refs + binfold local, TPU-mesh shape)",
                 *run_sharded_subprocess("tpu_shape")))

    _report(rows)


if __name__ == "__main__":
    main()
