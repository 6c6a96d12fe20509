"""Does index LOCALITY move the XLA gather floor? (VERDICT r4 #1)

Every tier >= 1M is ~90%+ of a floor that uses ~7% of HBM bandwidth:
each gathered 12 B position row costs a full 512 B transaction slot
(BASELINE.md "% HBM BW"). The rejected probes (per-row DMA kernels,
tpu.dynamic_gather, RCM-vs-ns/row) attacked per-row COST; this probe
attacks the other axis — whether the per-row cost responds to index
*structure*, which bounds what any build-time layout/renumbering scheme
(lane-packing, neighbor-contiguity, locality ordering) can ever win.

All patterns share one (n, R) shape, so ONE compile per source size
serves every pattern — the chained fori harness (fresh args per
dispatch, 2-row sync) then times values-only variants:

  random    iid uniform rows              — the engine's chord regime
  sorted    same multiset, ascending      — pure index-order effect
  local32k  idx[i] = i + U(+-32K)         — +-384 KB sliding window
  local2k   idx[i] = i + U(+-2K)          — +-24 KB sliding window
  ident     idx[i] = i + 1                — perfect streaming bound
  dup128    idx[i] = 128*(i//128)         — all 128 lanes hit ONE row:
            the absolute upper bound for any transaction-sharing scheme
            (if even this doesn't beat random, the wall is issue rate,
            not transactions, and lane-packing CANNOT pay)
  tile8     8-aligned runs of 8 rows      — emulates gathering (8, d)
            position tiles for build-time neighbor-contiguous layouts

Also: wide-row sources (n/G, G*d) at the same ROW count (G in {8, 32})
— the reference-count-independent per-row cost claim (BASELINE.md
rowgather probe: 4.60-5.85 ns/row from d_pad 3 to 128), re-measured in
the packed shape a lane-sharing design would use.

Usage: python experiments/gather_locality_probe.py [--sizes 1m,10m]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

D = 3  # engine position width


def patterns(n, rng):
    i = np.arange(n, dtype=np.int64)
    out = {
        "random": rng.integers(0, n, n),
        "sorted": np.sort(rng.integers(0, n, n)),
        "local32k": np.clip(i + rng.integers(-32768, 32769, n), 0, n - 1),
        "local2k": np.clip(i + rng.integers(-2048, 2049, n), 0, n - 1),
        "ident": (i + 1) % n,
        "dup128": 128 * (i // 128) % n,
        "tile8": (rng.integers(0, n // 8, n // 8 * 8)[::8].repeat(8) * 8
                  + np.tile(np.arange(8), n // 8)),
    }
    return {k: v.astype(np.int32) for k, v in out.items()}


def make_chained(width):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(pos, idx, reps):
        def body(r, carry):
            p, acc = carry
            # vary the index VALUES per rep without breaking the
            # pattern's structure: a small constant shift (wrap only at
            # the very top rows)
            out = p[jnp.minimum(idx + r, p.shape[0] - 1)]
            return p, acc + out[:2, :2].astype(jnp.float32)

        _, acc = jax.lax.fori_loop(
            0, reps, body, (pos, jnp.zeros((2, 2), jnp.float32))
        )
        return acc

    return chained


def run_size(n, reps, rng):
    pos = jnp.asarray(rng.standard_normal((n, D), dtype=np.float32))
    chained = make_chained(D)
    res = {}
    pats = patterns(n, rng)
    # compile once on the first pattern's shape
    first = jnp.asarray(pats["random"])
    np.asarray(chained(pos, first, reps=reps))
    for name, idx_np in pats.items():
        idx = jnp.asarray(idx_np)
        best = float("inf")
        for t in range(3):
            i2 = idx + (7 * t)
            t0 = time.perf_counter()
            np.asarray(chained(pos, i2, reps=reps))
            best = min(best, (time.perf_counter() - t0) / reps)
        res[name] = best / n * 1e9
        print(f"  n={n:>11,}  {name:9s} {best*1e3:9.2f} ms/rep "
              f"{res[name]:7.2f} ns/row", flush=True)

    # wide-row packed sources at the SAME row count n (rows are G
    # vertices wide); random rows of the packed array
    for G in (8, 32):
        m = n // G
        posw = jnp.asarray(
            rng.standard_normal((m, G * D), dtype=np.float32)
        )
        chw = make_chained(G * D)
        idx = jnp.asarray(rng.integers(0, m, n).astype(np.int32))
        np.asarray(chw(posw, idx, reps=reps))
        best = float("inf")
        for t in range(3):
            i2 = idx + (7 * t)
            t0 = time.perf_counter()
            np.asarray(chw(posw, i2, reps=reps))
            best = min(best, (time.perf_counter() - t0) / reps)
        res[f"wide{G}"] = best / n * 1e9
        print(f"  n={n:>11,}  wide{G:<5d} {best*1e3:9.2f} ms/rep "
              f"{res[f'wide{G}']:7.2f} ns/row  "
              f"(src {m:,} x {G*D} f32)", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1m,10m")
    ap.add_argument("--reps", type=int, default=0, help="0 = auto")
    args = ap.parse_args()
    sizes = {"100k": 100_000, "1m": 1_000_000, "10m": 10_000_000,
             "30m": 30_000_000}
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    all_res = {}
    for s in args.sizes.split(","):
        n = sizes[s]
        reps = args.reps or max(4, min(40, 300_000_000 // n))
        print(f"[{s}] n={n:,} reps={reps}", flush=True)
        all_res[s] = run_size(n, reps, rng)
    print("\nsummary (ns/row):")
    names = list(next(iter(all_res.values())).keys())
    print("size      " + "".join(f"{p:>9s}" for p in names))
    for s, r in all_res.items():
        print(f"{s:9s} " + "".join(f"{r[p]:9.2f}" for p in names))


if __name__ == "__main__":
    main()
