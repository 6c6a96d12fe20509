"""Fused distance + bin-min Pallas kNN ("binfold") — the fast TPU tier.

Replaces the one-shot ``approx`` tier's HBM round trip: `_oneshot_approx`
(ops/knn.py) materializes the (S, E) distance matrix in HBM (~1.6 GB fp32
at S=512, E=800K) before PartialReduce consumes it. This kernel computes
distance tiles in VMEM and folds each tile into per-bin running minima, so
only (S, G*128) candidates ever reach HBM; a final exact `lax.top_k` over
those ~G*128 candidates yields the neighbor set. In-process A/B at the
bench workload (S=512, E=800K, d=3, k=17 on v5e): 2.13 ms vs 3.19 ms for
the bf16 one-shot, at better recall (0.983 vs 0.963 against the f32
one-shot); the kernel alone measures ~0.15 ms.

This is the TPU-native replacement for the reference's ANN tier — RAPIDS
cuVS ivf_flat/ivf_pq indices (reference embedder_cuvs.py:255-313) and the
PyKeOps symbolic-kNN "never materialize S x E" property (reference
embedder_pytorch.py:485-541) — with no index build/rebuild cycle at all.

Recall model: each reference lands in one of ``G*128`` fixed bins
(reference r is assigned to bin r mod G*128 via the interleaved tile
order); a true neighbor is lost only when a nearer reference shares its
bin. Expected recall ~ prod_{i<k}(1 - i/bins); for 3072 bins, k=17:
~0.956 expected, ~0.98 measured on standardized layouts. ``params_for``
sizes G so the structural recall meets a requested target.

Mosaic notes (jax 0.9, v5e) — the kernel shape is load-bearing:
- The tile is processed as unrolled 128-lane chunks sliced from the
  r REF (ref mid-slices lower cleanly; VALUE mid-slices of progressively
  narrowing folds crash this Mosaic toolchain), with the (val, idx)
  running minima kept at constant (S, 128) width — the one dual-select
  pattern Mosaic compiles happily.
- Distances stay fp32 on the VPU: the in-kernel bf16 variant loses time
  to relayouts (measured 4.5 ms), and the MXU matmul expansion
  |q|^2 - 2qr + |r|^2 is both output-bound at d<=4 and catastrophically
  cancellative (62% recall — CLAUDE.md invariant).
- Bin-group axis g is OUTER in the grid so the (S, 128) carry scratch
  stays VMEM-resident across the inner ref-tile sweep; ref tiles are
  interleaved gt = s*G + g so each group's references are strided across
  the array (uniform bins even when the ref order is spatially
  correlated).
- Neighbor indices ride in fp32 lanes (exact for refs < 2^24; callers
  are gated by MAX_REFS below).
"""

import functools
import math

import jax
import jax.numpy as jnp

# Pad coordinate for out-of-range reference rows: squared distance ~1e30
# stays finite (an inf pad would produce inf - inf = NaN in the fold).
_PAD_COORD = 1.0e15
_BIG = 3.0e38

# fp32 index lanes are exact below 2^24 references (per kernel segment).
MAX_REFS = 1 << 24
# Beyond MAX_REFS the wrapper splits the reference set into equal
# segments (one kernel launch each, unrolled under one jit) and merges
# the per-segment top-k exactly; 16 segments bounds the unroll (raised
# from 8 for the 30M-vertex tier, whose fused ref-slot space is ~140M —
# falling off the fused path there compiles a pathologically padded
# unfused program, experiments/bench_30m.py round-2 notes).
MAX_SEGMENTS = 16
MAX_REFS_SEGMENTED = MAX_REFS * MAX_SEGMENTS
# Auto-selection gates (models/embedder.py _resolved_strategy): the
# unrolled per-coordinate loop wants small dims, and bin recall falls
# with k^2 — beyond these, the approx (PartialReduce) tier wins.
MAX_DIM = 8
MAX_K = 48
_MIN_G, _MAX_G = 24, 64


def params_for(k, recall_target=0.95, T=2048):
    """(T, G) sized so structural bin recall >= recall_target.

    Expected recall ~ exp(-k^2 / (2 * bins)) => bins >= k^2 / (2 * -ln r).
    G is clamped to [24, 64]: below 24 the kernel is grid-overhead-bound
    anyway, above 64 the (S, G*128) candidate buffers start to cost more
    than the PartialReduce path.
    """
    r = min(max(float(recall_target), 0.5), 0.999)
    bins_needed = (k * k) / (2.0 * -math.log(r))
    G = int(min(_MAX_G, max(_MIN_G, -(-bins_needed // 128))))
    return T, G


def _kernel(q_ref, r_ref, out_vals, out_idx, acc_vals, acc_idx,
            *, T, G, n_super, S):
    """One (g, s) grid cell: fold ref tile s*G+g into bin group g."""
    g = _pl.program_id(0)
    s = _pl.program_id(1)
    gt = s * G + g  # global ref-tile index (must match the r index_map)

    dim = q_ref.shape[1]

    @_pl.when(s == 0)
    def _init():
        acc_vals[:] = jnp.full((S, 128), _BIG, jnp.float32)
        acc_idx[:] = jnp.zeros((S, 128), jnp.float32)

    v = acc_vals[:]
    i = acc_idx[:]
    base = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    for c in range(T // 128):
        d = jnp.zeros((S, 128), jnp.float32)
        for coord in range(dim):
            qc = q_ref[:, coord : coord + 1]
            rc = r_ref[coord : coord + 1, c * 128 : (c + 1) * 128]
            diff = qc - rc
            d = d + diff * diff
        col = (base + (gt * T + c * 128)).astype(jnp.float32)
        take = d < v
        v = jnp.where(take, d, v)
        i = jnp.where(take, col, i)
    acc_vals[:] = v
    acc_idx[:] = i

    @_pl.when(s == n_super - 1)
    def _emit():
        out_vals[:] = acc_vals[:]
        out_idx[:] = acc_idx[:]


# pallas imports are deferred so CPU-only deployments that never select
# this strategy do not pay (or depend on) the Mosaic import.
_pl = None
_pltpu = None


def _ensure_pallas():
    global _pl, _pltpu
    if _pl is None:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        _pl, _pltpu = pl, pltpu


@functools.partial(
    jax.jit, static_argnames=("k", "T", "G", "S_out", "interpret")
)
def _binfold_padded(queries, refs, k, T, G, S_out, interpret):
    """Layout prep + kernel + exact top-k over the bin candidates.

    Everything lives under one jit: the pad + transpose fuse into cheap
    copies (eagerly each would pay a dispatch round trip — ~26 ms over
    the axon tunnel, docs/ROADMAP.md).
    """
    _ensure_pallas()
    pl, pltpu = _pl, _pltpu

    S_in, dim = queries.shape
    E = refs.shape[0]
    S = -(-max(S_in, 8) // 8) * 8
    n_tiles = -(-E // T)
    G = min(G, n_tiles)
    n_super = -(-n_tiles // G)
    E_pad = n_super * G * T
    queries = jnp.zeros((S, dim), jnp.float32).at[:S_in].set(
        queries.astype(jnp.float32)
    )
    refs_t = (
        jnp.full((E_pad, dim), _PAD_COORD, jnp.float32)
        .at[:E].set(refs.astype(jnp.float32)).T
    )
    kernel = functools.partial(
        _kernel, T=T, G=G, n_super=n_super, S=S
    )
    out_vals, out_idx = pl.pallas_call(
        kernel,
        grid=(G, n_super),
        in_specs=[
            pl.BlockSpec((S, dim), lambda g, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, T), lambda g, s: (0, s * G + g),
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
            jax.ShapeDtypeStruct((S, G * 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, 128), jnp.float32),
            pltpu.VMEM((S, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * S * E_pad * dim + 6 * S * E_pad,
            bytes_accessed=4 * (S * dim + dim * E_pad + 2 * G * S * 128),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, refs_t)
    # Phase 2: exact top-k over the G*128 bin minima.
    neg, pos = jax.lax.top_k(-out_vals, k)
    idx = jnp.take_along_axis(out_idx, pos, axis=1)
    return idx.astype(jnp.int32)[:S_out], -neg[:S_out]


@functools.partial(
    jax.jit, static_argnames=("k", "T", "G", "S_out", "seg", "n_seg",
                              "interpret")
)
def _binfold_segments(queries, refs, k, T, G, S_out, seg, n_seg, interpret):
    """Segmented kernel launches + exact top-k merge for E > MAX_REFS.

    Each segment stays below the fp32 index-lane bound; local indices are
    lifted to global int32 OUTSIDE the kernel, so exactness holds for any
    total reference count an int32 can index. The n_seg kernel launches
    share one compiled shape (equal segments, unrolled under this jit).
    """
    E, dim = refs.shape
    # No full-size pad here: each segment is a static slice of the raw
    # refs and _binfold_padded pads its own input to supertile multiples
    # (the short tail segment simply compiles a second kernel shape).
    # The earlier full (n_seg*seg, d) pad materialized a second copy of
    # the whole reference set, and at the 30M tier the added HBM
    # pressure tipped XLA into its compress/uncompress rematerialization
    # of the loop-invariant tables — whose "uncompressed" lane-padded
    # layouts were 16-42x the data (compile OOM at 35 GB,
    # experiments/bench_30m.py round-2 logs).
    refs = refs.astype(jnp.float32)
    # Pin the refs in their flat (slots, d) layout before the per-segment
    # transposes: without the barrier XLA propagates the (d, seg) layout
    # preference backwards into the (count, cap, d) slot-midpoint
    # producers and materializes per-bucket (d, count, cap) transposes
    # whose lane padding (cap -> 128) is ~16x — 5.3 GB per bucket at the
    # 30M tier (experiments/bench_30m.py round-2 OOM dumps).
    refs = jax.lax.optimization_barrier(refs)
    vals_all, idx_all = [], []
    for s in range(n_seg):
        hi = min((s + 1) * seg, E)
        r = jax.lax.slice_in_dim(refs, s * seg, hi)
        idx_s, vals_s = _binfold_padded(queries, r, k, T, G, S_out,
                                        interpret)
        idx_all.append(idx_s + jnp.int32(s * seg))
        vals_all.append(vals_s)
    vals = jnp.concatenate(vals_all, axis=1)
    idx = jnp.concatenate(idx_all, axis=1)
    neg, pos = jax.lax.top_k(-vals, k)
    return jnp.take_along_axis(idx, pos, axis=1), -neg


def knn_binfold(queries, refs, k, T=None, G=None, recall_target=0.95,
                interpret=None):
    """Approximate kNN via the fused Pallas bin-fold kernel.

    Returns (indices (S, k) int32, sq_distances (S, k) float32), matching
    the other strategies in ops/knn.py. Falls back to interpret mode off
    TPU (tests run the real kernel logic on CPU this way). Reference sets
    beyond MAX_REFS (fp32 index lanes per kernel) are split into equal
    segments and merged exactly, up to MAX_REFS_SEGMENTED.
    """
    E = int(refs.shape[0])
    if E > MAX_REFS_SEGMENTED:
        raise ValueError(
            f"binfold supports at most {MAX_REFS_SEGMENTED} references "
            f"({MAX_SEGMENTS} segments), got {E}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T_auto, G_auto = params_for(k, recall_target)
    T_use, G_use = int(T or T_auto), int(G or G_auto)
    if E > MAX_REFS:
        # segment length is a T-multiple AND <= MAX_REFS for ANY T: size
        # n_seg against the largest T-multiple under the bound, so the
        # round-up below can never push a segment's index lanes past 2^24
        seg_max = (MAX_REFS // T_use) * T_use
        n_seg = -(-E // seg_max)
        seg_raw = -(-E // n_seg)                  # ceil(E / n_seg)
        seg = -(-seg_raw // T_use) * T_use        # rounded up to T
        return _binfold_segments(
            queries, refs, int(k), T_use, G_use, queries.shape[0],
            int(seg), int(n_seg), bool(interpret)
        )
    # effective bin count after the small-E clamp inside _binfold_padded
    bins = min(G_use, -(-E // T_use)) * 128
    if k > bins:
        raise ValueError(
            f"binfold keeps one candidate per bin: k={k} exceeds the "
            f"{bins} bins at E={E}; use the 'approx' strategy"
        )
    return _binfold_padded(
        queries, refs, int(k), T_use, G_use,
        queries.shape[0], bool(interpret)
    )


_probe_cache = {}


def probe(dim, S, k, recall_target=0.95):
    """Compile-probe the kernel at the load-bearing shape parameters.

    The availability-probe pattern is the reference's PyKeOps probe
    (embedder_pytorch.py:247-258): attempt a tiny real call once, cache
    the verdict, and let callers tier down to the 'approx' strategy if
    Mosaic rejects the kernel on this toolchain. E only sets the inner
    grid trip count, so the probe uses a single supertile; S and dim set
    the block shapes and are taken at their real values.
    """
    T, G = params_for(k, recall_target)
    key = (int(dim), int(-(-max(S, 8) // 8) * 8), T, G)
    if key not in _probe_cache:
        try:
            # real S and dim (they set the block shapes), one full
            # supertile of refs (E only sets the grid trip count)
            q = jnp.zeros((S, dim), jnp.float32)
            r = jnp.zeros((T * G, dim), jnp.float32)
            out = knn_binfold(q, r, min(k, 8), T=T, G=G)
            jax.block_until_ready(out)
            _probe_cache[key] = True
        except Exception:  # Mosaic compile failure -> tier down
            _probe_cache[key] = False
    return _probe_cache[key]
