"""Composed lane-packed position gather: the transaction-wall attack.

gather_locality_probe.py established (r5, experiments/data/
gather_locality_r5.log):
  - index STRUCTURE has zero effect at 1M (random = sorted = dup128 =
    5.9 ns/row — even 128 lanes hitting the SAME source row don't share
    a transaction), so locality renumbering / build-time index shaping
    is a dead end;
  - but the per-row cost falls steeply with source ROW COUNT at equal
    total bytes: (125K x 24) and (31K x 96) sources gather at 2.0
    ns/row vs 5.9 for (1M x 3); at 10M, (312K x 96) runs 4.08 vs 6.8.

So the attack is to shrink the SOURCE: store positions lane-PACKED as
(n/G, G*d) — G vertices per row — gather row u//G, and select vertex
u%G's d floats on-chip with a one-hot reduce that XLA fuses into the
gather consumer (no (R, G*d) HBM round trip). This probe times the
COMPOSED op at the engine's real geometries vs the plain (n, d) gather:

  plain      out[r] = pos[idx[r]]                       (the status quo)
  packedG    rows = pos_packed[idx[r] // G]             (G in 8..128)
             out[r] = sum_g onehot(idx[r] % G)[g] * rows[g*d:(g+1)*d]
  repackG    pos -> (n/G, G*d) relayout cost, paid ONCE per iteration
             and amortized over the ~cap slot-column gathers

Usage: python experiments/packed_gather_probe.py [--sizes 1m,10m]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

D = 3


def plain_gather(pos, idx):
    return pos[idx]


def make_packed_gather(G):
    def f(pos_packed, idx):
        R = idx.shape[0]
        rows = pos_packed[idx // G]                  # (R, G*D)
        sel = idx % G
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (R, G), 1)
            == sel[:, None]
        )
        return (
            rows.reshape(R, G, D) * oh[..., None].astype(rows.dtype)
        ).sum(axis=1)

    return f


def make_packed_from_flat(G):
    """End-to-end engine form: (n, 3) positions in, reshape INSIDE the
    timed program — XLA pays whatever relayout the packing really costs
    (a reshape only changes metadata when the physical linear layouts
    already agree)."""
    packed = make_packed_gather(G)

    def f(pos, idx):
        n = pos.shape[0]
        return packed(pos.reshape(n // G, G * D), idx)

    return f


def make_packed_tala(G):
    """Select via take_along_axis over the G axis instead of the one-hot
    reduce (whether XLA's in-register gather beats the strided FMA)."""
    def f(pos_packed, idx):
        R = idx.shape[0]
        rows = pos_packed[idx // G].reshape(R, G, D)
        sel = (idx % G)[:, None, None]
        return jnp.take_along_axis(
            rows, jnp.broadcast_to(sel, (R, 1, D)), axis=1
        )[:, 0, :]

    return f


def make_packed_d4(G):
    """d padded 3->4 inside the packed row so the one-hot reduce walks a
    power-of-2 stride (the stride-3 middle-axis reduce is suspected as
    the select-overhead culprit); output slices back to (R, 3)."""
    def f(pos, idx):
        n = pos.shape[0]
        pos4 = jnp.concatenate(
            [pos, jnp.zeros((n, 1), pos.dtype)], axis=1
        )
        packed = pos4.reshape(n // G, G * 4)
        R = idx.shape[0]
        rows = packed[idx // G].reshape(R, G, 4)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (R, G), 1)
            == (idx % G)[:, None]
        )
        return (rows * oh[..., None].astype(rows.dtype)).sum(axis=1)[:, :3]

    return f


def make_packed_transposed(G):
    """Transposed source (D, n/G, G): the one-hot reduce runs over the
    CONTIGUOUS minor (lane) axis instead of a stride-D walk. Output is
    (D, R) — the layout a (d, n)-major engine consumer would take."""
    def f(pos_t, idx):
        rows = pos_t[:, idx // G, :]                 # (D, R, G)
        sel = idx % G
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], G), 1)
            == sel[:, None]
        )
        return (rows * oh[None].astype(rows.dtype)).sum(axis=-1)

    return f


def timeit(label, fn, src, idx, reps, rows=None):
    rows = rows if rows is not None else idx.shape[0]

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(src, idx, reps):
        def body(r, carry):
            s, acc = carry
            # idx is drawn < n - 200 and r <= 40, so idx + r stays valid.
            # The accumulator consumes EVERY output row: a [:2,:2] slice
            # lets XLA DCE the gather down to 2 rows on some backends.
            out = fn(s, idx + r)
            return s, acc + jnp.sum(out, dtype=jnp.float32)

        _, acc = jax.lax.fori_loop(
            0, reps, body, (src, jnp.float32(0.0))
        )
        return acc

    np.asarray(chained(src, idx, reps=reps))
    best = float("inf")
    for t in range(3):
        i2 = idx - (3 * t)
        i2 = jnp.maximum(i2, 0)
        t0 = time.perf_counter()
        np.asarray(chained(src, i2, reps=reps))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"  {label:34s} {best*1e3:9.2f} ms/rep {best/rows*1e9:7.2f} "
          f"ns/row", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1m,10m")
    ap.add_argument("--gs", default="8,32,128")
    ap.add_argument("--alt-selects", action="store_true")
    args = ap.parse_args()
    sizes = {"1m": 1_000_000, "2m": 2_000_000, "4m": 4_000_000,
             "10m": 10_000_000, "30m": 30_000_000}
    gs = [int(g) for g in args.gs.split(",")]
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    for s in args.sizes.split(","):
        n = sizes[s]
        reps = max(4, min(40, 300_000_000 // n))
        idx_np = rng.integers(0, n - 200, n).astype(np.int32)
        idx = jnp.asarray(idx_np)
        pos = jnp.asarray(rng.standard_normal((n, D), dtype=np.float32))
        print(f"[{s}] n={n:,} reps={reps}", flush=True)
        timeit("plain (n,3) gather", plain_gather, pos, idx, reps)
        for G in gs:
            m = n // G
            idx_g = jnp.minimum(idx, m * G - 200)  # stay in packed range
            packed = jnp.asarray(
                rng.standard_normal((m, G * D), dtype=np.float32)
            )
            timeit(f"packed G={G} (pre-packed src)",
                   make_packed_gather(G), packed, idx_g, reps)
            timeit(f"packed G={G} (reshape in-program)",
                   make_packed_from_flat(G), pos[:m * G], idx_g, reps)
            timeit(f"packed G={G} d4-aligned",
                   make_packed_d4(G), pos[:m * G], idx_g, reps)
            if not args.alt_selects:
                continue
            # alternative selects — both measured far SLOWER at 1M
            # (take_along_axis 52-60 ns/row and OOMs at G=32; the
            # (D,m,G) transposed one-hot 9-12 ns/row); kept opt-in
            timeit(f"packed G={G} take_along_axis",
                   make_packed_tala(G), packed, idx_g, reps)
            packed_t = jnp.asarray(
                rng.standard_normal((D, m, G), dtype=np.float32)
            )
            timeit(f"packed G={G} transposed (D,m,G)",
                   make_packed_transposed(G), packed_t, idx_g, reps)


if __name__ == "__main__":
    main()
