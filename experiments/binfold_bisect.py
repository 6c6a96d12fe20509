"""Bisect the Mosaic 'Check failed: limits[i] <= dim(i)' crash in binfold.

Each variant morphs the known-working knn_pallas kernel one feature at a
time toward binfold. Compile failures appear in ~2s, so this is cheap.
"""

import functools
import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38
S, T, G, NSUP, DIM = 512, 1024, 4, 8, 3
E_PAD = T * G * NSUP


def make_inputs():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(S, DIM)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(DIM, E_PAD)).astype(np.float32))
    return q, r


def dist_tile(q_ref, r_ref, dtype=jnp.float32):
    d = jnp.zeros((S, T), dtype)
    for c in range(DIM):
        qc = q_ref[:, c : c + 1].astype(dtype)
        rc = r_ref[c : c + 1, :].astype(dtype)
        diff = qc - rc
        d = d + diff * diff
    return d.astype(jnp.float32)


def try_variant(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"{name:40s} OK", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:40s} FAIL {type(e).__name__}: {msg}", flush=True)


# ---- v_ctrl: the working original kernel, tiny size ----
def v_ctrl():
    from graphem_rapids_tpu.ops.knn_pallas import knn_pallas
    q, r = make_inputs()
    return knn_pallas(q[:, :DIM], r.T[:4096], 16)


# ---- v_grid2d: 2D grid + out blocks (S,128) at (0,g); carry in scratch;
#      per-step merge is just elementwise min of the FIRST 128 lanes (no
#      fold, no concat) — isolates the grid/blockspec change ----
def v_grid2d():
    def kernel(q_ref, r_ref, ov, oi, av, ai):
        g = pl.program_id(0)
        s = pl.program_id(1)
        d = dist_tile(q_ref, r_ref)
        vals = d[:, :128]
        col = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)

        @pl.when(s == 0)
        def _():
            av[:] = jnp.full((S, 128), _BIG, jnp.float32)
            ai[:] = jnp.zeros((S, 128), jnp.int32)

        take = vals < av[:]
        av[:] = jnp.where(take, vals, av[:])
        ai[:] = jnp.where(take, col, ai[:])

        @pl.when(s == NSUP - 1)
        def _():
            ov[:] = av[:]
            oi[:] = ai[:]

    q, r = make_inputs()
    return pl.pallas_call(
        kernel,
        grid=(G, NSUP),
        in_specs=[
            pl.BlockSpec((S, DIM), lambda g, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DIM, T), lambda g, s: (0, s * G + g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((S, 128), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, G * 128), jnp.float32),
            jax.ShapeDtypeStruct((S, G * 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, 128), jnp.float32),
            pltpu.VMEM((S, 128), jnp.int32),
        ],
    )(q, r)


# ---- v_fold: 1D grid, single group, the halving fold loop ----
def v_fold():
    def kernel(q_ref, r_ref, ov, oi, av, ai):
        i = pl.program_id(0)
        d = dist_tile(q_ref, r_ref)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1) + i * T
        vals, idx = d, col
        w = T
        while w > 128:
            h = w // 2
            a_v, b_v = vals[:, :h], vals[:, h:w]
            a_i, b_i = idx[:, :h], idx[:, h:w]
            take_a = a_v <= b_v
            vals = jnp.where(take_a, a_v, b_v)
            idx = jnp.where(take_a, a_i, b_i)
            w = h

        @pl.when(i == 0)
        def _():
            av[:] = jnp.full((S, 128), _BIG, jnp.float32)
            ai[:] = jnp.zeros((S, 128), jnp.int32)

        take = vals < av[:]
        av[:] = jnp.where(take, vals, av[:])
        ai[:] = jnp.where(take, idx, ai[:])

        @pl.when(i == G * NSUP - 1)
        def _():
            ov[:] = av[:]
            oi[:] = ai[:]

    q, r = make_inputs()
    return pl.pallas_call(
        kernel,
        grid=(G * NSUP,),
        in_specs=[
            pl.BlockSpec((S, DIM), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DIM, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((S, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, 128), jnp.float32),
            jax.ShapeDtypeStruct((S, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, 128), jnp.float32),
            pltpu.VMEM((S, 128), jnp.int32),
        ],
    )(q, r)




# ---- micro-variants inside the fold ----
def _mk1d(kernel, n_out_lanes=128):
    q, r = make_inputs()
    return pl.pallas_call(
        kernel,
        grid=(G * NSUP,),
        in_specs=[
            pl.BlockSpec((S, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DIM, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, n_out_lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, n_out_lanes), jnp.float32),
    )(q, r)


def v_fold1():
    """One fold step, values only, edge slices."""
    def kernel(q_ref, r_ref, ov):
        d = dist_tile(q_ref, r_ref)
        h = T // 2
        m = jnp.minimum(d[:, :h], d[:, h:])
        ov[:] = m[:, :128]
    return _mk1d(kernel)


def v_fold3min():
    """Full 3-step fold, values only (no idx)."""
    def kernel(q_ref, r_ref, ov):
        d = dist_tile(q_ref, r_ref)
        w = T
        while w > 128:
            h = w // 2
            d = jnp.minimum(d[:, :h], d[:, h:w])
            w = h
        ov[:] = d
    return _mk1d(kernel)


def v_fold3idx():
    """Full 3-step fold with idx tracking, iota (S, T)."""
    def kernel(q_ref, r_ref, ov):
        d = dist_tile(q_ref, r_ref)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
        vals, idx = d, col
        w = T
        while w > 128:
            h = w // 2
            a_v, b_v = vals[:, :h], vals[:, h:w]
            a_i, b_i = idx[:, :h], idx[:, h:w]
            take_a = a_v <= b_v
            vals = jnp.where(take_a, a_v, b_v)
            idx = jnp.where(take_a, a_i, b_i)
            w = h
        ov[:] = vals + idx.astype(jnp.float32) * 0.0
    return _mk1d(kernel)


def v_foldaccum():
    """fold3min + scratch accumulate + conditional emit (full v_fold minus idx)."""
    def kernel(q_ref, r_ref, ov, av):
        i = pl.program_id(0)
        d = dist_tile(q_ref, r_ref)
        w = T
        while w > 128:
            h = w // 2
            d = jnp.minimum(d[:, :h], d[:, h:w])
            w = h

        @pl.when(i == 0)
        def _():
            av[:] = jnp.full((S, 128), _BIG, jnp.float32)

        av[:] = jnp.minimum(av[:], d)

        @pl.when(i == G * NSUP - 1)
        def _():
            ov[:] = av[:]

    q, r = make_inputs()
    return pl.pallas_call(
        kernel,
        grid=(G * NSUP,),
        in_specs=[
            pl.BlockSpec((S, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DIM, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32)],
    )(q, r)




def v_fold3idxf():
    """Full 3-step fold with FLOAT32 idx tracking."""
    def kernel(q_ref, r_ref, ov):
        d = dist_tile(q_ref, r_ref)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1).astype(jnp.float32)
        vals, idx = d, col
        w = T
        while w > 128:
            h = w // 2
            a_v, b_v = vals[:, :h], vals[:, h:w]
            a_i, b_i = idx[:, :h], idx[:, h:w]
            take_a = a_v <= b_v
            vals = jnp.where(take_a, a_v, b_v)
            idx = jnp.where(take_a, a_i, b_i)
            w = h
        ov[:] = vals + idx * 0.0
    return _mk1d(kernel)




def v_fold3where():
    """Values-only fold but via where(cmp) instead of minimum."""
    def kernel(q_ref, r_ref, ov):
        d = dist_tile(q_ref, r_ref)
        w = T
        while w > 128:
            h = w // 2
            a_v, b_v = d[:, :h], d[:, h:w]
            take_a = a_v <= b_v
            d = jnp.where(take_a, a_v, b_v)
            w = h
        ov[:] = d
    return _mk1d(kernel)


def v_fold3minidx():
    """Dual chain but idx folded with minimum-select via arithmetic
    (no where): idx_new = idx_a * take + idx_b * (1-take), f32."""
    def kernel(q_ref, r_ref, ov):
        d = dist_tile(q_ref, r_ref)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1).astype(jnp.float32)
        vals, idx = d, col
        w = T
        while w > 128:
            h = w // 2
            a_v, b_v = vals[:, :h], vals[:, h:w]
            a_i, b_i = idx[:, :h], idx[:, h:w]
            take_a = (a_v <= b_v).astype(jnp.float32)
            vals = jnp.minimum(a_v, b_v)
            idx = a_i * take_a + b_i * (1.0 - take_a)
            w = h
        ov[:] = vals + idx * 0.0
    return _mk1d(kernel)




def time_variant(name, fn, iters=30):
    import time as _t
    out = jax.block_until_ready(fn())
    t0 = _t.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:40s} {(_t.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)


def v_floor():
    """Full-scale stripped kernel: dist + value fold + accum only."""
    global S, T, G, NSUP, E_PAD
    S, T, G, NSUP = 512, 2048, 24, 17
    E_PAD = T * G * NSUP  # 835584 ~ bench scale

    def kernel(q_ref, r_ref, ov, av):
        g = pl.program_id(0)
        s = pl.program_id(1)
        d = dist_tile(q_ref, r_ref)
        w = T
        while w > 128:
            h = w // 2
            d = jnp.minimum(d[:, :h], d[:, h:w])
            w = h

        @pl.when(s == 0)
        def _():
            av[:] = jnp.full((S, 128), _BIG, jnp.float32)

        av[:] = jnp.minimum(av[:], d)

        @pl.when(s == NSUP - 1)
        def _():
            ov[:] = av[:]

    q, r = make_inputs()

    @jax.jit
    def _go(q, r):
        return pl.pallas_call(
            kernel,
            grid=(G, NSUP),
            in_specs=[
                pl.BlockSpec((S, DIM), lambda g, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((DIM, T), lambda g, s: (0, s * G + g), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, 128), lambda g, s: (0, g), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, G * 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32)],
        )(q, r)

    def run():
        return _go(q, r)

    time_variant("floor(dist+fold+acc) T=2048", run)
    return run()




def v_chunked():
    """Full-scale: per-128-lane chunks sliced from refs, constant-width
    dual accumulator chain (grid2d pattern), no folds/concats."""
    global S, T, G, NSUP, E_PAD
    S, T, G, NSUP = 512, 4096, 24, 9
    E_PAD = T * G * NSUP  # 884736

    def kernel(q_ref, r_ref, ov, oi, av, ai):
        g = pl.program_id(0)
        s = pl.program_id(1)
        gt = s * G + g

        @pl.when(s == 0)
        def _():
            av[:] = jnp.full((S, 128), _BIG, jnp.float32)
            ai[:] = jnp.zeros((S, 128), jnp.float32)

        v = av[:]
        i = ai[:]
        base = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
        for c in range(T // 128):
            d = jnp.zeros((S, 128), jnp.float32)
            for coord in range(DIM):
                qc = q_ref[:, coord : coord + 1]
                rc = r_ref[coord : coord + 1, c * 128 : (c + 1) * 128]
                diff = qc - rc
                d = d + diff * diff
            col = (base + (gt * T + c * 128)).astype(jnp.float32)
            take = d < v
            v = jnp.where(take, d, v)
            i = jnp.where(take, col, i)
        av[:] = v
        ai[:] = i

        @pl.when(s == NSUP - 1)
        def _():
            ov[:] = av[:]
            oi[:] = ai[:]

    q, r = make_inputs()

    @jax.jit
    def _go(q, r):
        return pl.pallas_call(
            kernel,
            grid=(G, NSUP),
            in_specs=[
                pl.BlockSpec((S, DIM), lambda g, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((DIM, T), lambda g, s: (0, s * G + g), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((S, 128), lambda g, s: (0, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 128), lambda g, s: (0, g), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((S, G * 128), jnp.float32),
                jax.ShapeDtypeStruct((S, G * 128), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((S, 128), jnp.float32),
                pltpu.VMEM((S, 128), jnp.float32),
            ],
        )(q, r)

    def run():
        return _go(q, r)

    time_variant("chunked T=4096 G=24", run)
    # sanity: indices consistent with values
    ov, oi = run()
    ovn, oin = np.asarray(ov), np.asarray(oi).astype(np.int64)
    qn, rn = np.asarray(q), np.asarray(r)
    sample = np.random.default_rng(0).integers(0, S, 20)
    for s_ in sample:
        bins = np.argsort(ovn[s_])[:8]
        for b in bins:
            ii = oin[s_, b]
            d2 = ((qn[s_] - rn[:, ii]) ** 2).sum()
            assert abs(d2 - ovn[s_, b]) < 1e-2 * max(1.0, d2), (d2, ovn[s_, b])
    print("chunked idx/val consistency OK", flush=True)
    return ov


if __name__ == "__main__":
    which = sys.argv[1:] or ["ctrl", "grid2d", "fold"]
    for name in which:
        try_variant(name, globals()[f"v_{name}"])
