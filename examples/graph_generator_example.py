#!/usr/bin/env python
"""All 13 graph generators embedded end-to-end
(reference examples/graph_generator_example.py analog)."""

import argparse
import os
import sys
from pathlib import Path

os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import graphem_rapids_tpu as gr

GENERATORS = [
    ("erdos_renyi", gr.erdos_renyi_graph, {"n": 150, "p": 0.05, "seed": 0}),
    ("sbm", gr.generate_sbm, {"n_per_block": 40, "num_blocks": 4, "seed": 0}),
    ("barabasi_albert", gr.generate_ba, {"n": 150, "m": 3, "seed": 0}),
    ("watts_strogatz", gr.generate_ws, {"n": 150, "k": 6, "p": 0.3,
                                        "seed": 0}),
    ("power_cluster", gr.generate_power_cluster,
     {"n": 150, "m": 3, "p": 0.5, "seed": 0}),
    ("road_network", gr.generate_road_network, {"width": 12, "height": 12}),
    ("bipartite", gr.generate_bipartite_graph, {"n_top": 40, "n_bottom": 80}),
    ("balanced_tree", gr.generate_balanced_tree, {"r": 2, "h": 7}),
    ("random_regular", gr.generate_random_regular,
     {"n": 150, "d": 4, "seed": 0}),
    ("scale_free", gr.generate_scale_free, {"n": 150, "seed": 0}),
    ("geometric", gr.generate_geometric, {"n": 150, "radius": 0.15,
                                          "seed": 0}),
    ("caveman", gr.generate_caveman, {"l": 10, "k": 12}),
    ("relaxed_caveman", gr.generate_relaxed_caveman,
     {"l": 10, "k": 12, "p": 0.1, "seed": 0}),
]


def main(smoke=False):
    configs = GENERATORS[:3] if smoke else GENERATORS
    iters = 3 if smoke else 15
    for name, gen, params in configs:
        adj = gen(**params)
        emb = gr.create_graphem(adj, n_components=2, seed=0, verbose=False)
        pos = emb.run_layout(num_iterations=iters)
        print(f"{name:18s} n={adj.shape[0]:4d} m={adj.nnz // 2:5d} "
              f"finite={np.isfinite(pos).all()}")


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
