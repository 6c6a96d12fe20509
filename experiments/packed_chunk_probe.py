"""Differentiate WHY the lane-packed gather loses above ~1M rows.

packed_gather_probe.py r5: composed packed gather wins 1.78x at n=1M
(3.3 vs 5.9 ns/row) but loses ~2.7-5x at n=10M (18.2 @ G=8, 35.9 @
G=16 — cost linear in G, i.e. XLA reads the packed rows per-ELEMENT in
that regime). Two variables changed together: the packed SOURCE row
count (125K -> 1.25M) and the gather OUTPUT rows (1M -> 10M). This
pins which one flips the codegen:

  A. R=1M indices from the 10M-vertex packed source (src 1.25M x 24):
     fast => OUTPUT size is the trigger -> chunk the slot gather into
     ~1M-row pieces inside the step (static slices, same program);
     slow => the packed-source config itself is the trigger -> gate
     packing to the ~1M window.
  B. R=1M from the plain 10M source (control: does shrinking R alone
     change the plain rate?).
  C. chunked composed form at R=10M: 10 sequential 1M-row packed
     gathers concatenated — the rescue candidate itself, measured
     directly.

Usage: python experiments/packed_chunk_probe.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

from experiments.packed_gather_probe import (  # noqa: E402
    make_packed_gather,
    plain_gather,
)

D = 3
N = 10_000_000
G = 8


def make_chunked_packed(G, chunk):
    inner = make_packed_gather(G)

    def f(packed, idx):
        R = idx.shape[0]
        outs = [
            inner(packed, jax.lax.slice_in_dim(idx, c, c + chunk))
            for c in range(0, R, chunk)
        ]
        return jnp.concatenate(outs, axis=0)

    return f


def timeit(label, fn, src, idx, reps):
    rows = idx.shape[0]

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(src, idx, reps):
        def body(r, carry):
            s, acc = carry
            out = fn(s, idx + r)
            return s, acc + jnp.sum(out, dtype=jnp.float32)

        _, acc = jax.lax.fori_loop(
            0, reps, body, (src, jnp.float32(0.0))
        )
        return acc

    np.asarray(chained(src, idx, reps=reps))
    best = float("inf")
    for t in range(3):
        i2 = jnp.maximum(idx - 3 * t, 0)
        t0 = time.perf_counter()
        np.asarray(chained(src, i2, reps=reps))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"  {label:44s} {best*1e3:9.2f} ms/rep {best/rows*1e9:7.2f} "
          f"ns/row", flush=True)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    pos = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    packed = jnp.asarray(
        rng.standard_normal((N // G, G * D), dtype=np.float32)
    )
    idx_1m = jnp.asarray(rng.integers(0, N - 200, 1_000_000).astype(np.int32))
    idx_10m = jnp.asarray(rng.integers(0, N - 200, N).astype(np.int32))

    timeit("A: packed G=8, R=1M, src 10M verts", make_packed_gather(G),
           packed, idx_1m, reps=30)
    timeit("B: plain, R=1M, src 10M verts", plain_gather, pos, idx_1m,
           reps=30)
    timeit("C: chunked packed G=8, R=10M (1M chunks)",
           make_chunked_packed(G, 1_000_000), packed, idx_10m, reps=8)
    timeit("   control: plain R=10M", plain_gather, pos, idx_10m, reps=8)


if __name__ == "__main__":
    main()
