"""Sanity-check device timing over the axon tunnel.

gather_scaling_probe.py returned ~0.05 ms for a 600 MB-read gather
(impossible). Check: (a) a known-cost matmul with the same
double-call + block_until_ready harness, (b) the gather with its result
actually fetched, (c) whether the scalar-reduce variant really runs.
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np


def t(label, fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    r = jax.block_until_ready(fn(*args))
    print(f"{label:45s} {(time.perf_counter()-t0)*1e3:9.2f} ms", flush=True)
    return r


def main():
    rng = np.random.default_rng(0)

    # known cost: 4096^3 matmul = 137 GFLOP -> ~0.7 ms at 200 TFLOP/s bf16
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)

    @jax.jit
    def mm(a):
        return (a @ a).sum()

    t("matmul 4096^3 bf16 + sum", mm, a)

    @jax.jit
    def mm20(a):
        def body(i, acc):
            return acc + ((a + acc.astype(a.dtype)) @ a).sum().astype(
                jnp.float32
            )

        return jax.lax.fori_loop(0, 20, body, jnp.zeros((), jnp.float32))

    t("matmul 4096^3 bf16 x20 fori", mm20, a)

    n, rows = 10_000_000, 50_000_000
    tbl = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, rows).astype(np.int32))

    @jax.jit
    def gather_sum(tbl, idx):
        return tbl[idx].sum()

    r = t("gather 50M rows + sum (scalar out)", gather_sum, tbl, idx)
    print("  value:", float(r), flush=True)

    @jax.jit
    def gather_full(tbl, idx):
        return tbl[idx]

    jax.block_until_ready(gather_full(tbl, idx))
    t0 = time.perf_counter()
    out = jax.block_until_ready(gather_full(tbl, idx))
    print(f"{'gather 50M rows (full out, on device)':45s} "
          f"{(time.perf_counter()-t0)*1e3:9.2f} ms", flush=True)
    del out


if __name__ == "__main__":
    import os

    os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
    main()
