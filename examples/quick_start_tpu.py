#!/usr/bin/env python
"""Quick start (reference examples/quick_start_rapids.py analog).

Backend info -> ER graph -> create_graphem -> layout -> seed selection ->
influence estimate -> size sweep. Doubles as the CI smoke test
(run with --smoke for a fast subset).
"""

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import graphem_rapids_tpu as gr


def main(smoke=False):
    print("=== Backend info ===")
    for k, v in gr.get_backend_info().items():
        print(f"  {k}: {v}")

    n = 200 if smoke else 1000
    iters = 5 if smoke else 30

    print(f"\n=== Embedding an ER graph (n={n}) ===")
    adjacency = gr.erdos_renyi_graph(n=n, p=0.02, seed=42)
    embedder = gr.create_graphem(adjacency, n_components=3, seed=42,
                                 verbose=False)
    t0 = time.time()
    positions = embedder.run_layout(num_iterations=iters)
    print(f"  layout: {time.time() - t0:.2f}s, "
          f"positions {positions.shape}, finite={np.isfinite(positions).all()}")

    print("\n=== Seed selection + influence ===")
    seeds = gr.graphem_seed_selection(embedder, k=10, num_iterations=2)
    spread = gr.estimated_influence(adjacency, seeds, p=0.1, num_sims=32)
    rand = gr.estimated_influence(
        adjacency, np.random.default_rng(0).choice(n, 10, replace=False),
        p=0.1, num_sims=32,
    )
    print(f"  GraphEm seeds spread: {spread:.1f} | random seeds: {rand:.1f}")

    if not smoke:
        print("\n=== Size sweep ===")
        for size in (500, 1000, 2000):
            adj = gr.erdos_renyi_graph(n=size, p=10.0 / size, seed=0)
            emb = gr.create_graphem(adj, n_components=3, seed=0,
                                    verbose=False)
            t0 = time.time()
            emb.run_layout(num_iterations=10)
            print(f"  n={size:5d}: {time.time() - t0:.2f}s")

    print("\nDone.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--platform", default=None,
                        choices=("cpu", "tpu"),
                        help="force a JAX platform; smoke mode "
                             "defaults to cpu (remote TPU compiles "
                             "are slow for one-off shapes)")
    args = parser.parse_args()
    platform = args.platform or ("cpu" if args.smoke else None)
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    main(smoke=args.smoke)
