"""Probe: does splitting one big HBM gather into per-bucket gathers keep
the ~8 ns/row floor? Decides the degree-binned neighbor table design
(docs/ROADMAP.md): total rows would drop from n*cap to ~2E + pad.

Each variant runs REPS chained iterations inside one jitted fori_loop
(single dispatch — per-dispatch tunnel latency ~26 ms would otherwise
swamp the measurement), with the gather output feeding the next
iteration's positions so nothing can be elided or overlapped away.
"""

import sys

sys.path.insert(0, "/root/repo")

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
D = 3
REPS = 20


@partial(jax.jit, static_argnames=("reps",))
def run_one(pos, tbl, reps):
    def body(_, p):
        s = p[tbl].sum(axis=1)
        return p + 1e-6 * s

    return jax.lax.fori_loop(0, reps, body, pos)


@partial(jax.jit, static_argnames=("reps",))
def run_binned(pos, t1, t2, t3, reps):
    def body(_, p):
        s = jnp.concatenate(
            [p[t1].sum(axis=1), p[t2].sum(axis=1), p[t3].sum(axis=1)]
        )
        return p + 1e-6 * s

    return jax.lax.fori_loop(0, reps, body, pos)


def timeit(label, fn, *args):
    # block_until_ready does NOT synchronize through the axon tunnel;
    # fetching a value to host does (same sync run_layout relies on).
    float(fn(*args, reps=REPS).sum())  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, reps=REPS).sum())
        dt = (time.perf_counter() - t0) / REPS
        best = dt if best is None else min(best, dt)
    print(f"{label:52s} {best*1e3:8.2f} ms/iter", flush=True)


def main():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))

    tbl = jnp.asarray(rng.integers(0, N, (N, 14), dtype=np.int32))
    timeit("A: one (1M,14) table gather (14M rows)", run_one, pos, tbl)

    t1 = jnp.asarray(rng.integers(0, N, (125_000, 4), dtype=np.int32))
    t2 = jnp.asarray(rng.integers(0, N, (125_000, 12), dtype=np.int32))
    t3 = jnp.asarray(rng.integers(0, N, (750_000, 16), dtype=np.int32))
    timeit("B: binned 0.5M+1.5M+12M rows (14M rows, 3 ops)",
           run_binned, pos, t1, t2, t3)

    t1 = jnp.asarray(rng.integers(0, N, (600_000, 6), dtype=np.int32))
    t2 = jnp.asarray(rng.integers(0, N, (330_000, 12), dtype=np.int32))
    t3 = jnp.asarray(rng.integers(0, N, (70_000, 24), dtype=np.int32))
    timeit("C: binned 3.6M+4M+1.7M rows (9.2M rows, 3 ops)",
           run_binned, pos, t1, t2, t3)

    tbl9 = jnp.asarray(rng.integers(0, N, (N, 9), dtype=np.int32))
    timeit("D: one (1M,9) table gather (9M rows)", run_one, pos, tbl9)


if __name__ == "__main__":
    main()
