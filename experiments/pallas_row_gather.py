"""Probe the HBM gather floor with a hand-rolled Pallas row-gather kernel.

VERDICT r3 #1: the layout step is ~2/3 HBM row-gather at every tier
>= 1M vertices (XLA gather ~8-9 ns/row; `tpu.dynamic_gather` measured
and rejected — docs/ROADMAP.md). This probes whether an
embedding-lookup-style kernel — per-block indices DMA'd into SMEM,
multiple outstanding async local row DMAs HBM->VMEM — can beat the XLA
gather floor, and if not, measures WHERE the DMA path saturates (issue
rate vs bytes) so the negative result is quantified.

Variants, all timed as chained fori_loop reps in one dispatch (fresh
args per call, tiny-slice sync — the BASELINE.md methodology):
  A. XLA gather baseline: positions[idx] at (n, d_pad) for d_pad in
     {3 (native step shape), 8, 128 (one full lane row)}.
  B. Pallas DMA row-gather, one row per DMA, n_buf outstanding
     (n_buf in {4, 16}).
  C. Pallas DMA with G consecutive rows per DMA (G in {8, 64}): if
     ns/DMA stays flat as G grows, the per-DMA issue path is the
     bottleneck, not bytes.

Usage:
  python experiments/pallas_row_gather.py --check      # CPU interpret
  python experiments/pallas_row_gather.py [--n N] [--rows R]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def row_gather_pallas(positions, idx, block=512, n_buf=8, rows_per_dma=1,
                      interpret=False):
    """out[r] = positions[idx[r]] via per-row async DMAs.

    positions: (n, d_pad) f32, stays in HBM. idx: (R,) int32 in HBM,
    R % block == 0; per grid block, the block's indices are DMA'd into
    SMEM scratch, then `block` row DMAs run with n_buf outstanding.
    With rows_per_dma=G each DMA copies G consecutive rows starting at
    idx[r] (caller guarantees idx <= n - G) into out[r*G:(r+1)*G].
    """
    R = idx.shape[0]
    assert R % block == 0
    d_pad = positions.shape[1]
    G = rows_per_dma

    def kernel(idx_hbm, pos_ref, out_ref, idx_smem, sem_i, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            idx_hbm.at[pl.ds(i * block, block)], idx_smem, sem_i
        )
        cp.start()
        cp.wait()

        def get_dma(slot, r):
            # 2D (rows, :) slice form required: 1D row slices crash this
            # toolchain's Mosaic even at 128 lanes (compile probe P2 vs
            # P7 in rowgather_compile_probes.py)
            return pltpu.make_async_copy(
                pos_ref.at[pl.ds(idx_smem[r], G), :],
                out_ref.at[pl.ds(r * G, G), :],
                sem.at[slot],
            )

        for k in range(n_buf):  # static warm-up ramp
            get_dma(k, k).start()

        def body(r, carry):
            get_dma(r % n_buf, r).wait()

            @pl.when(r + n_buf < block)
            def _():
                get_dma(r % n_buf, r + n_buf).start()

            return carry

        jax.lax.fori_loop(0, block, body, 0)

    interp = (
        pltpu.InterpretParams(dma_execution_mode="on_wait")
        if interpret else False
    )
    return pl.pallas_call(
        kernel,
        grid=(R // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # idx
            pl.BlockSpec(memory_space=pl.ANY),  # positions
        ],
        out_specs=pl.BlockSpec(
            (block * G, d_pad), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.SMEM((block,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        out_shape=jax.ShapeDtypeStruct((R * G, d_pad), positions.dtype),
        interpret=interp,
    )(idx, positions)


def timeit(label, fn, pos, idx, reps=10, per_rows=1):
    """Chained reps in one dispatch; vary input per call; 2-row sync."""

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(pos, idx, reps):
        def body(i, carry):
            p, acc = carry
            out = fn(p, (idx + i) % (pos.shape[0] - 64))
            return p, acc + out[:2, :2].astype(jnp.float32)

        _, acc = jax.lax.fori_loop(
            0, reps, body, (pos, jnp.zeros((2, 2), jnp.float32))
        )
        return acc

    np.asarray(chained(pos, idx, reps=reps))  # compile + warm
    best = float("inf")
    for t in range(3):
        i2 = idx + t  # fresh args per dispatch (tunnel repeat-ack)
        t0 = time.perf_counter()
        np.asarray(chained(pos, i2, reps=reps))
        best = min(best, (time.perf_counter() - t0) / reps)
    rows = idx.shape[0] * per_rows
    print(f"{label:58s} {best * 1e3:9.2f} ms  "
          f"{best / rows * 1e9:7.2f} ns/row", flush=True)
    return best


def check_interpret():
    """Correctness of the kernel in TPU-interpret mode on CPU."""
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    n, R = 4096, 2048
    pos = jnp.asarray(rng.standard_normal((n, 8), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n - 64, R, dtype=np.int32))
    for G in (1, 8):
        sub = idx[: R // G] if G > 1 else idx
        out = row_gather_pallas(pos, sub, block=256, n_buf=4,
                                rows_per_dma=G, interpret=True)
        if G == 1:
            want = np.asarray(pos)[np.asarray(sub)]
        else:
            want = np.concatenate(
                [np.asarray(pos)[s:s + G] for s in np.asarray(sub)]
            )
        np.testing.assert_array_equal(np.asarray(out), want)
        print(f"interpret check G={G}: OK", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--check", action="store_true",
                    help="interpret-mode correctness check on CPU")
    ap.add_argument("--skip-xla", action="store_true",
                    help="skip the XLA baseline variants")
    args = ap.parse_args()

    if args.check:
        check_interpret()
        return

    args.rows -= args.rows % (512 * 64)  # block x max G divisibility
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, args.n - 64, args.rows, dtype=np.int32)
    )

    print(f"n={args.n}  gathered rows={args.rows}  reps={args.reps}",
          flush=True)

    if not args.skip_xla:
        for d_pad in (3, 8, 128):
            pos = jnp.asarray(
                rng.standard_normal((args.n, d_pad), dtype=np.float32)
            )
            timeit(f"A. XLA gather pos[idx]            d_pad={d_pad}",
                   lambda p, i: p[i], pos, idx, reps=args.reps)

    # d_pad=128: Mosaic on this toolchain REQUIRES 128-lane rows for
    # ANY-space row DMAs — narrower rows (d_pad=8) crash the remote
    # compiler in every addressing mode, 128-lane rows compile in every
    # mode including data-dependent (experiments/rowgather_compile_probes
    # P7 matrix). 512 B/row also matches the XLA gather's effective
    # transaction size, so ns/row is apples-to-apples with variant A.
    pos128 = jnp.asarray(
        rng.standard_normal((args.n, 128), dtype=np.float32)
    )
    for n_buf in (4, 16):
        try:
            timeit(
                f"B. pallas 1-row DMAs  d_pad=128   n_buf={n_buf}",
                lambda p, i, nb=n_buf: row_gather_pallas(
                    p, i, block=512, n_buf=nb
                ),
                pos128, idx, reps=args.reps,
            )
        except Exception as e:
            print(f"B. n_buf={n_buf} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # fewer DMAs, same logical rows: issue-rate vs byte-rate attribution
    for G in (8, 64):
        sub = idx[: args.rows // G]
        try:
            timeit(
                f"C. pallas {G}-row DMAs d_pad=128  n_buf=16",
                lambda p, i, g=G: row_gather_pallas(
                    p, i, block=512, n_buf=16, rows_per_dma=g
                ),
                pos128, sub, reps=args.reps, per_rows=G,
            )
        except Exception as e:
            print(f"C. G={G} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
