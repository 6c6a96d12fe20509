"""Does the HBM gather floor (~8 ns/row at n=1M) hold at n=10M?

The 10M-vertex probe measured ~20 s/iter warm where linear scaling from
the 1M tier (78.7 ms/iter) predicts <1 s. Suspect: random-row gather
cost per row may cliff once the source table outgrows some cache/VMEM
tier. Measures positions[idx] at fixed gathered-row count over growing
source tables, then the other step phases at 10M shapes (sampling,
segmented binfold, scatter) to attribute the remainder.
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

ROWS = 50_000_000  # gathered rows per measurement (~10M-tier slot count)
D = 3
LOOP = 3


def timed(label, fn, *args, per=1):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{label:55s} {dt/LOOP*1e3:10.1f} ms/op "
          f"({dt/LOOP/per*1e9:7.2f} ns/row)", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def gather_many(tbl, idx):
        n = tbl.shape[0]

        def body(i, acc):
            rows = tbl[(idx + i) % n]
            return acc + rows.sum()

        return jax.lax.fori_loop(0, LOOP, body, jnp.zeros((), tbl.dtype))

    print(f"gather {ROWS/1e6:.0f}M rows of ({D},) f32 vs table size:",
          flush=True)
    for n in (1_000_000, 2_500_000, 5_000_000, 10_000_000):
        tbl = jnp.asarray(
            rng.standard_normal((n, D)).astype(np.float32)
        )
        idx = jnp.asarray(
            rng.integers(0, n, ROWS, dtype=np.int64).astype(np.int32)
        )
        timed(f"  table n={n/1e6:4.1f}M ({n*D*4/2**20:5.0f} MiB)",
              gather_many, tbl, idx, per=ROWS)
        del tbl, idx

    # ---- sampling at E=35M (top-S of iid uniforms, PartialReduce) ---- #
    from graphem_rapids_tpu.ops.sampling import sample_indices

    E, S = 35_000_000, 512

    @jax.jit
    def sample_many(key):
        def body(i, acc):
            k = jax.random.fold_in(key, i)
            return acc + sample_indices(k, E, S)[0]

        return jax.lax.fori_loop(0, LOOP, body, jnp.zeros((), jnp.int32))

    timed("sampling top-512 of 35M uniforms", sample_many,
          jax.random.PRNGKey(0))

    # ---- segmented binfold at 10M-tier ref count ---------------------- #
    from graphem_rapids_tpu.ops.knn_binfold import knn_binfold

    refs = jnp.asarray(
        rng.standard_normal((ROWS, D)).astype(np.float32)
    )
    qs = refs[:S]

    def binfold_once(qs, refs):
        return knn_binfold(qs, refs, 16)[0]

    out = jax.block_until_ready(binfold_once(qs, refs))
    t0 = time.perf_counter()
    out = jax.block_until_ready(binfold_once(qs, refs))
    print(f"{'segmented binfold 512 x 50M refs k=16':55s} "
          f"{(time.perf_counter()-t0)*1e3:10.1f} ms/op", flush=True)
    del refs, qs, out

    # ---- scatter-add of S*k rows into a (10M, 3) buffer --------------- #
    n = 10_000_000
    big = jnp.zeros((n, D), jnp.float32)
    sidx = jnp.asarray(rng.integers(0, n, S * 16 * 4, dtype=np.int64)
                       .astype(np.int32))
    vals = jnp.asarray(
        rng.standard_normal((S * 16 * 4, D)).astype(np.float32)
    )

    @jax.jit
    def scatter_many(big, sidx, vals):
        def body(i, b):
            return b.at[(sidx + i) % n].add(vals)

        return jax.lax.fori_loop(0, LOOP, body, big)

    timed("scatter-add 32K rows into (10M,3)", scatter_many, big, sidx,
          vals)


if __name__ == "__main__":
    import os

    os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
    main()
