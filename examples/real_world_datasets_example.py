#!/usr/bin/env python
"""Real-world dataset listing / loading / embedding
(reference examples/real_world_datasets_example.py analog).

Without a local dataset cache or network access this only lists the
registry; with a cache it embeds facebook_combined with subsampling.
"""

import argparse
import os
import sys
from pathlib import Path

os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import graphem_rapids_tpu as gr


def main(smoke=False):
    print("=== Available datasets ===")
    for name, info in gr.list_available_datasets().items():
        print(f"  {name:32s} {info['description']}")

    if smoke:
        print("\n(smoke mode: skipping downloads)")
        return

    name = "snap-facebook_combined"
    print(f"\n=== Loading {name} ===")
    try:
        adj = gr.load_dataset_as_adjacency(name)
    except Exception as e:
        print(f"  unavailable offline ({type(e).__name__}); done.")
        return

    print(f"  n={adj.shape[0]} m={adj.nnz // 2}")
    emb = gr.create_graphem(adj, n_components=3, seed=0, verbose=False)
    pos = emb.run_layout(num_iterations=20)
    radii = np.linalg.norm(pos, axis=1)
    seeds = np.argsort(-radii)[:10]
    print(f"  top-10 radial seeds: {seeds.tolist()}")


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
