#!/usr/bin/env python
"""Multi-host sharded layout (new capability vs the reference — SURVEY §2.4).

Launch ONE copy of this script per host (standard JAX SPMD contract:
every process runs the same program on the same graph):

  # TPU pod slice — everything inferred from the environment:
  python examples/multihost_example.py

  # CPU/GPU cluster (or a local 2-process demo):
  python examples/multihost_example.py --coordinator host0:9876 \
      --num-processes 2 --process-id 0   # on host 0
  python examples/multihost_example.py --coordinator host0:9876 \
      --num-processes 2 --process-id 1   # on host 1

Run with --demo to launch the full 2-process demo locally (two CPU
subprocesses, 2 virtual devices each). Doubles as the CI smoke test
(--smoke implies --demo with a tiny graph).
"""

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def worker(args):
    if args.demo_worker:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    import numpy as np

    import graphem_rapids_tpu as gr
    from graphem_rapids_tpu.parallel import (
        ShardedGraphEmbedder,
        distributed_init,
        make_mesh,
    )

    if args.coordinator or args.demo_worker:
        distributed_init(
            args.coordinator, num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        distributed_init()  # TPU pod: inferred from the environment

    pid = jax.process_index()
    n = 300 if args.smoke else 20_000
    iters = 3 if args.smoke else 30
    if pid == 0:
        print(f"processes={jax.process_count()} "
              f"global devices={jax.device_count()}")

    adjacency = gr.generate_random_regular(n=n, d=8, seed=0)
    emb = ShardedGraphEmbedder(
        adjacency, n_components=3, mesh=make_mesh(), seed=42, verbose=False,
    )
    t0 = time.time()
    emb.run_layout(num_iterations=iters)
    dt = time.time() - t0
    # SPMD pitfall: EVERY process must run collective work (seed
    # selection calls run_layout -> psum/all_gather); gate only prints.
    seeds = gr.graphem_seed_selection(emb, k=10, num_iterations=2)
    spread = gr.estimated_influence(adjacency, seeds, p=0.1, num_sims=32)
    assert np.isfinite(emb.positions).all()
    if pid == 0:
        print(f"layout {iters} iters on {jax.device_count()} devices: "
              f"{dt:.2f}s")
        print(f"top-10 radial seeds -> IC spread {spread:.1f}")
        print("multihost example OK")


def demo(args):
    """Spawn the 2-process demo locally."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    base = [sys.executable, "-u", os.path.abspath(__file__),
            "--demo-worker", "--coordinator", f"localhost:{port}",
            "--num-processes", "2"]
    if args.smoke:
        base.append("--smoke")
    procs = [
        subprocess.Popen(base + ["--process-id", str(pid)], env=env)
        for pid in range(2)
    ]
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        raise SystemExit(f"demo workers failed: {codes}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--demo", action="store_true",
                    help="run the local 2-process CPU demo")
    ap.add_argument("--demo-worker", action="store_true",
                    help=argparse.SUPPRESS)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke and not (args.demo or args.demo_worker):
        args.demo = True
    if args.demo:
        demo(args)
    else:
        worker(args)


if __name__ == "__main__":
    main()
