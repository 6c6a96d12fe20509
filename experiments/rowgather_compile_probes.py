"""Mosaic compile probes for the row-gather DMA kernel features.

The full kernel (experiments/pallas_row_gather.py) compiles in interpret
mode but the remote Mosaic compiler 500s with no diagnostic. Each probe
here compiles ONE feature at tiny shapes so the failing construct is
identified:

  P1: HBM->SMEM DMA of a (block,) int32 index vector
  P2: P1 + one 1D row DMA pos.at[idx] -> out.at[0]
  P3: P1 + one 2D row DMA pos.at[pl.ds(idx,1), :] -> out.at[pl.ds(0,1), :]
  P4: P3 + fori_loop over rows with semaphore round-robin
  P5: scalar-prefetch indices instead of the SMEM DMA (small R)

Usage: python experiments/rowgather_compile_probes.py
"""

import functools
import os
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256
DP = 8
N = 4096


def run(label, fn):
    try:
        out = np.asarray(fn())
        print(f"{label:14s} OK   out[0,:2]={out[0,:2]}", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:180]
        print(f"{label:14s} FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def p1():
    def kernel(idx_hbm, pos_ref, out_ref, idx_smem, sem_i):
        cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(0, BLOCK)], idx_smem,
                                   sem_i)
        cp.start()
        cp.wait()
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = jnp.arange(BLOCK, dtype=jnp.int32)
    pos = jnp.ones((N, DP), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, DP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((BLOCK,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((BLOCK, DP), jnp.float32),
    )(idx, pos)


def p2():
    def kernel(idx_hbm, pos_ref, out_ref, idx_smem, sem_i, sem):
        cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(0, BLOCK)], idx_smem,
                                   sem_i)
        cp.start()
        cp.wait()
        out_ref[...] = jnp.zeros_like(out_ref)
        d = pltpu.make_async_copy(pos_ref.at[idx_smem[0]], out_ref.at[0],
                                  sem)
        d.start()
        d.wait()

    idx = jnp.full((BLOCK,), 7, jnp.int32)
    pos = jnp.ones((N, DP), jnp.float32) * 3
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, DP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((BLOCK,), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((BLOCK, DP), jnp.float32),
    )(idx, pos)


def p3():
    def kernel(idx_hbm, pos_ref, out_ref, idx_smem, sem_i, sem):
        cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(0, BLOCK)], idx_smem,
                                   sem_i)
        cp.start()
        cp.wait()
        out_ref[...] = jnp.zeros_like(out_ref)
        d = pltpu.make_async_copy(
            pos_ref.at[pl.ds(idx_smem[0], 1), :],
            out_ref.at[pl.ds(0, 1), :], sem,
        )
        d.start()
        d.wait()

    idx = jnp.full((BLOCK,), 7, jnp.int32)
    pos = jnp.ones((N, DP), jnp.float32) * 5
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, DP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((BLOCK,), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((BLOCK, DP), jnp.float32),
    )(idx, pos)


def p4():
    n_buf = 4

    def kernel(idx_hbm, pos_ref, out_ref, idx_smem, sem_i, sem):
        cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(0, BLOCK)], idx_smem,
                                   sem_i)
        cp.start()
        cp.wait()

        def get_dma(slot, r):
            return pltpu.make_async_copy(
                pos_ref.at[pl.ds(idx_smem[r], 1), :],
                out_ref.at[pl.ds(r, 1), :], sem.at[slot],
            )

        for k in range(n_buf):
            get_dma(k, k).start()

        def body(r, carry):
            get_dma(r % n_buf, r).wait()

            @pl.when(r + n_buf < BLOCK)
            def _():
                get_dma(r % n_buf, r + n_buf).start()

            return carry

        jax.lax.fori_loop(0, BLOCK, body, 0)

    idx = jnp.arange(BLOCK, dtype=jnp.int32) % N
    pos = (jnp.arange(N, dtype=jnp.float32)[:, None]
           * jnp.ones((1, DP), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, DP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((BLOCK,), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((n_buf,))],
        out_shape=jax.ShapeDtypeStruct((BLOCK, DP), jnp.float32),
    )(idx, pos)


def p5():
    def kernel(idx_ref, pos_ref, out_ref, sem):
        d = pltpu.make_async_copy(
            pos_ref.at[pl.ds(idx_ref[0, 0], 1), :],
            out_ref.at[pl.ds(0, 1), :], sem,
        )
        d.start()
        out_ref[...] = jnp.zeros_like(out_ref)
        d.wait()

    idx = jnp.full((1, BLOCK), 9, jnp.int32)
    pos = jnp.ones((N, DP), jnp.float32) * 11
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, DP), lambda i, idx_ref: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BLOCK, DP), jnp.float32),
    )(idx, pos)


def main():
    for label, fn in [("P1 smem-dma", p1), ("P2 1d-row-dma", p2),
                      ("P3 2d-row-dma", p3), ("P4 fori+sems", p4),
                      ("P5 prefetch", p5), ("P6 pid-addr", p6)]:
        run(label, fn)


if __name__ == "__main__":
    main()


def p6():
    """Dynamic DMA address DERIVED FROM program_id (no data load) —
    the addressing mode ring_binfold's HBM kernel already uses."""
    def kernel(idx_hbm, pos_ref, out_ref, sem):
        i = pl.program_id(0)
        out_ref[...] = jnp.zeros_like(out_ref)
        d = pltpu.make_async_copy(
            pos_ref.at[pl.ds(i * 3 + 1, 1), :],
            out_ref.at[pl.ds(0, 1), :], sem,
        )
        d.start()
        d.wait()

    idx = jnp.arange(BLOCK, dtype=jnp.int32)
    pos = jnp.ones((N, DP), jnp.float32) * 13
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, DP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((BLOCK, DP), jnp.float32),
    )(idx, pos)


def _row_copy_probe(dp, dyn):
    """One row DMA from an ANY input; dp = lane width of the row;
    dyn = 'static' | 'pid' | 'data' source-index mode."""
    def kernel(idx_hbm, pos_ref, out_ref, idx_smem, sem_i, sem):
        cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(0, BLOCK)], idx_smem,
                                   sem_i)
        cp.start()
        cp.wait()
        out_ref[...] = jnp.zeros_like(out_ref)
        if dyn == "static":
            src = pos_ref.at[pl.ds(5, 1), :]
        elif dyn == "pid":
            src = pos_ref.at[pl.ds(pl.program_id(0) * 3 + 5, 1), :]
        else:
            src = pos_ref.at[pl.ds(idx_smem[0], 1), :]
        d = pltpu.make_async_copy(src, out_ref.at[pl.ds(0, 1), :], sem)
        d.start()
        d.wait()

    idx = jnp.full((BLOCK,), 5, jnp.int32)
    pos = jnp.ones((N, dp), jnp.float32) * 17
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, dp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((BLOCK,), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((BLOCK, dp), jnp.float32),
    )(idx, pos)


def main_shapes():
    for dp in (8, 128):
        for dyn in ("static", "pid", "data"):
            run(f"P7 {dyn} dp={dp}", lambda d=dp, y=dyn: _row_copy_probe(d, y))


def _loop_probe(mode):
    """dp=128 row DMAs driven from a fori_loop: isolate which loop
    construct kills the compiler. Modes:
      static8   — python loop, static r, data-dependent idx_smem[r]
      fori1sem  — fori_loop, dynamic r, ONE semaphore, wait-in-body
      forisems  — fori_loop, dynamic r, sem.at[r % 4]
      foriwhen  — forisems + pl.when guarded start (the full pattern)
    """
    DPW = 128

    def kernel(idx_hbm, pos_ref, out_ref, idx_smem, sem_i, sem):
        cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(0, BLOCK)], idx_smem,
                                   sem_i)
        cp.start()
        cp.wait()
        out_ref[...] = jnp.zeros_like(out_ref)

        def dma(r, slot):
            return pltpu.make_async_copy(
                pos_ref.at[pl.ds(idx_smem[r], 1), :],
                out_ref.at[pl.ds(r, 1), :], sem.at[slot],
            )

        if mode == "static8":
            for r in range(8):
                d = dma(r, 0)
                d.start()
                d.wait()
        elif mode == "fori1sem":
            def body(r, c):
                d = dma(r, 0)
                d.start()
                d.wait()
                return c

            jax.lax.fori_loop(0, BLOCK, body, 0)
        elif mode == "forisems":
            def body(r, c):
                d = dma(r, r % 4)
                d.start()
                d.wait()
                return c

            jax.lax.fori_loop(0, BLOCK, body, 0)
        else:  # foriwhen
            for k in range(4):
                dma(k, k).start()

            def body(r, c):
                dma(r, r % 4).wait()

                @pl.when(r + 4 < BLOCK)
                def _():
                    dma(r + 4, r % 4).start()

                return c

            jax.lax.fori_loop(0, BLOCK, body, 0)

    idx = jnp.arange(BLOCK, dtype=jnp.int32)
    pos = jnp.ones((N, DPW), jnp.float32) * 19
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, DPW), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((BLOCK,), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((4,))],
        out_shape=jax.ShapeDtypeStruct((BLOCK, DPW), jnp.float32),
    )(idx, pos)


def main_loops():
    for mode in ("static8", "fori1sem", "forisems", "foriwhen"):
        run(f"P8 {mode}", lambda m=mode: _loop_probe(m))


def _grid_probe(ngrid, blk, zero_init):
    """P9: the P8 'foriwhen' pattern at grid=(ngrid,) with a blocked,
    pipelined out and a program_id-offset index DMA."""
    DPW = 128

    def kernel(idx_hbm, pos_ref, out_ref, idx_smem, sem_i, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            idx_hbm.at[pl.ds(i * blk, blk)], idx_smem, sem_i
        )
        cp.start()
        cp.wait()
        if zero_init:
            out_ref[...] = jnp.zeros_like(out_ref)

        def dma(r, slot):
            return pltpu.make_async_copy(
                pos_ref.at[pl.ds(idx_smem[r], 1), :],
                out_ref.at[pl.ds(r, 1), :], sem.at[slot],
            )

        for k in range(4):
            dma(k, k).start()

        def body(r, c):
            dma(r, r % 4).wait()

            @pl.when(r + 4 < blk)
            def _():
                dma(r + 4, r % 4).start()

            return c

        jax.lax.fori_loop(0, blk, body, 0)

    idx = jnp.arange(ngrid * blk, dtype=jnp.int32) % N
    pos = jnp.ones((N, DPW), jnp.float32) * 23
    return pl.pallas_call(
        kernel,
        grid=(ngrid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((blk, DPW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((blk,), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((4,))],
        out_shape=jax.ShapeDtypeStruct((ngrid * blk, DPW), jnp.float32),
    )(idx, pos)


def main_grid():
    run("P9 g1 b256 z1", lambda: _grid_probe(1, 256, True))
    run("P9 g4 b256 z1", lambda: _grid_probe(4, 256, True))
    run("P9 g4 b256 z0", lambda: _grid_probe(4, 256, False))
    run("P9 g4 b512 z1", lambda: _grid_probe(4, 512, True))
    run("P9 g16 b512 z1", lambda: _grid_probe(16, 512, True))


def _hbm_out_probe(ngrid, blk, inner_blocks=1):
    """P10: out lives in ANY/HBM — rows are DMA'd HBM->HBM directly, no
    pipelined VMEM out block (grid>1 with manual DMAs into a pipelined
    out hard-crashes the client, probe P9 g4). With inner_blocks>1 the
    grid stays 1 and the kernel loops blocks internally (SMEM reload
    per block)."""
    DPW = 128
    total = ngrid * blk * inner_blocks

    def kernel(idx_hbm, pos_ref, out_ref, idx_smem, sem_i, sem):
        gi = pl.program_id(0)

        def do_block(b, c):
            base = (gi * inner_blocks + b) * blk
            cp = pltpu.make_async_copy(
                idx_hbm.at[pl.ds(base, blk)], idx_smem, sem_i
            )
            cp.start()
            cp.wait()

            def dma(r, slot):
                return pltpu.make_async_copy(
                    pos_ref.at[pl.ds(idx_smem[r], 1), :],
                    out_ref.at[pl.ds(base + r, 1), :], sem.at[slot],
                )

            for k in range(8):
                dma(k, k).start()

            def body(r, c2):
                dma(r, r % 8).wait()

                @pl.when(r + 8 < blk)
                def _():
                    dma(r + 8, r % 8).start()

                return c2

            jax.lax.fori_loop(0, blk, body, 0)
            return c

        jax.lax.fori_loop(0, inner_blocks, do_block, 0)

    idx = jnp.arange(total, dtype=jnp.int32) % N
    pos = jnp.ones((N, DPW), jnp.float32) * 29
    return pl.pallas_call(
        kernel,
        grid=(ngrid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SMEM((blk,), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((8,))],
        out_shape=jax.ShapeDtypeStruct((total, DPW), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, pos)


def main_hbm():
    run("P10 g1 b256", lambda: _hbm_out_probe(1, 256))
    run("P10 g4 b512", lambda: _hbm_out_probe(4, 512))
    run("P10 g1 ib16", lambda: _hbm_out_probe(1, 512, inner_blocks=16))


def time_working_shape():
    """Chained-reps timing of the one compilable+runnable envelope
    (grid=1, single block, HBM->HBM row DMAs). Two block sizes separate
    per-launch overhead from per-row cost:
        ns/row = (t_b2 - t_b1) / (b2 - b1)
    """
    import functools
    import time as _t

    DPW = 128
    N_big = 1_000_000
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((N_big, DPW), dtype=np.float32))

    def one_call(blk):
        def kernel(idx_hbm, pos_ref, out_ref, idx_smem, sem_i, sem):
            cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(0, blk)],
                                       idx_smem, sem_i)
            cp.start()
            cp.wait()

            def dma(r, slot):
                return pltpu.make_async_copy(
                    pos_ref.at[pl.ds(idx_smem[r], 1), :],
                    out_ref.at[pl.ds(r, 1), :], sem.at[slot],
                )

            for k in range(8):
                dma(k, k).start()

            def body(r, c2):
                dma(r, r % 8).wait()

                @pl.when(r + 8 < blk)
                def _():
                    dma(r + 8, r % 8).start()

                return c2

            jax.lax.fori_loop(0, blk, body, 0)

        def f(idx, pos):
            return pl.pallas_call(
                kernel,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.SMEM((blk,), jnp.int32),
                                pltpu.SemaphoreType.DMA(()),
                                pltpu.SemaphoreType.DMA((8,))],
                out_shape=jax.ShapeDtypeStruct((blk, DPW), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(idx, pos)

        return f

    REPS = 256
    results = {}
    for blk in (128, 256, 512):
        f = one_call(blk)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(idx0, pos_a, reps, f=f, blk=blk):
            def body(i, carry):
                idx, acc = carry
                out = f(idx, pos_a)
                return (idx + 1) % (N_big - 2), acc + out[0, 0]

            return jax.lax.fori_loop(
                0, reps, body, (idx0, jnp.float32(0))
            )[1]

        idx0 = jnp.asarray(
            rng.integers(0, N_big - 2, blk, dtype=np.int32)
        )
        try:
            float(chained(idx0, pos, reps=REPS))  # compile+warm
        except Exception as e:
            print(f"blk={blk} FAILED: {type(e).__name__}", flush=True)
            continue
        best = float("inf")
        for t in range(3):
            t0 = _t.perf_counter()
            float(chained(idx0 + t, pos, reps=REPS))
            best = min(best, (_t.perf_counter() - t0) / REPS)
        results[blk] = best
        print(f"blk={blk}: {best*1e6:.1f} us/launch", flush=True)
    ks = sorted(results)
    if len(ks) >= 2:
        b1, b2 = ks[-2], ks[-1]
        ns_row = (results[b2] - results[b1]) / (b2 - b1) * 1e9
        print(f"marginal per-row DMA cost: {ns_row:.2f} ns/row "
              f"(launch overhead ~{results[b1]*1e6:.1f} us at blk={b1})",
              flush=True)
