"""Pallas TPU tiled exact-kNN kernel.

Replaces the reference's native kNN engines (PyKeOps argKmin,
embedder_pytorch.py:485-541; cuVS brute/ivf indices, embedder_cuvs.py:255-430)
with a single hand-tiled TPU kernel:

- reference points stream through VMEM in (d, TILE) blocks along the grid,
  so the (S, E) distance matrix is never materialized in HBM — the property
  the reference gets from PyKeOps "symbolic" LazyTensors;
- squared distances for a tile are computed on the VPU with an unrolled
  per-coordinate broadcast (embedding dims are tiny: 2-4 typical);
- a running top-k (values, global indices) carry lives in VMEM scratch and
  is merged with each tile via k rounds of min-extraction with an
  index-tiebreak (no in-kernel sort needed) — the pattern from the TPU-KNN
  paper (arXiv:2206.14286).

The kernel is exact: results match lax.top_k over the full distance matrix
(modulo tie ordering, where we break ties by smallest index like torch.topk).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_INT_MAX = jnp.iinfo(jnp.int32).max
_BIG = 3.0e38  # plain float: jnp scalars would be captured consts in pallas


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _knn_kernel(q_ref, r_ref, out_vals_ref, out_idx_ref, best_vals, best_idx,
                *, k, tile, n_refs, dim):
    """One grid step: fold reference tile i into the running top-k carry."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    S = q_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        best_vals[:] = jnp.full((S, _LANES), _BIG, jnp.float32)
        best_idx[:] = jnp.zeros((S, _LANES), jnp.int32)

    # --- squared distances for this tile: (S, tile), unrolled over dim ---
    dist = jnp.zeros((S, tile), jnp.float32)
    for c in range(dim):
        qc = q_ref[:, c : c + 1]            # (S, 1)
        rc = r_ref[c : c + 1, :]            # (1, tile)
        diff = qc - rc
        dist = dist + diff * diff

    # Mask out-of-range reference columns (tail tile padding).
    col = jax.lax.broadcasted_iota(jnp.int32, (S, tile), 1)
    global_col = col + i * tile
    dist = jnp.where(global_col < n_refs, dist, _BIG)

    # --- merge tile with carry: k rounds of min-extract with index tiebreak ---
    cand_vals = jnp.concatenate([best_vals[:], dist], axis=1)
    cand_idx = jnp.concatenate([best_idx[:], global_col], axis=1)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
    new_vals = jnp.full((S, _LANES), _BIG, jnp.float32)
    new_idx = jnp.zeros((S, _LANES), jnp.int32)
    for j in range(k):
        m = jnp.min(cand_vals, axis=1, keepdims=True)                 # (S, 1)
        tie = jnp.where(cand_vals == m, cand_idx, _INT_MAX)
        sel = jnp.min(tie, axis=1, keepdims=True)                      # (S, 1)
        new_vals = jnp.where(out_lane == j, m, new_vals)
        new_idx = jnp.where(out_lane == j, sel, new_idx)
        cand_vals = jnp.where(cand_idx == sel, _BIG, cand_vals)

    best_vals[:] = new_vals
    best_idx[:] = new_idx

    @pl.when(i == n_tiles - 1)
    def _emit():
        out_vals_ref[:] = best_vals[:]
        out_idx_ref[:] = best_idx[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "n_refs", "interpret")
)
def _knn_pallas_padded(queries, refs_t, k, tile, n_refs, interpret=False):
    S, dim = queries.shape
    _, E_pad = refs_t.shape
    n_tiles = E_pad // tile

    kernel = functools.partial(
        _knn_kernel, k=k, tile=tile, n_refs=n_refs, dim=dim
    )
    out_vals, out_idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((S, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((S, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((S, _LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, _LANES), jnp.float32),
            pltpu.VMEM((S, _LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * S * E_pad * dim + 5 * k * S * (E_pad + n_tiles * _LANES),
            bytes_accessed=4 * (S * dim + dim * E_pad + 2 * S * _LANES),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, refs_t)
    return out_vals, out_idx


def knn_pallas(queries, refs, k, tile=1024, interpret=None):
    """Exact kNN with the Pallas tiled kernel.

    Parameters
    ----------
    queries : (S, d) float — query points (sampled edge midpoints)
    refs : (E, d) float — reference points (all edge midpoints)
    k : int — number of neighbors, k <= 128
    tile : int — reference-tile width (multiple of 128)

    Returns (indices (S, k) int32, sq_distances (S, k) float32).
    """
    if k > _LANES:
        raise ValueError(f"knn_pallas supports k <= {_LANES}, got {k}")
    if interpret is None:
        # Mosaic targets TPU; everywhere else run the interpreter (tests on
        # the forced-CPU mesh use this path).
        interpret = jax.default_backend() != "tpu"
    S, d = queries.shape
    E = refs.shape[0]
    tile = min(tile, _round_up(E, _LANES))

    S_pad = _round_up(max(S, 8), 8)
    E_pad = _round_up(E, tile)

    q = jnp.zeros((S_pad, d), jnp.float32).at[:S].set(
        queries.astype(jnp.float32)
    )
    refs_t = (
        jnp.full((E_pad, d), _BIG, jnp.float32)
        .at[:E]
        .set(refs.astype(jnp.float32))
        .T
    )
    out_vals, out_idx = _knn_pallas_padded(
        q, refs_t, int(k), int(tile), E, bool(interpret)
    )
    return out_idx[:S, :k], out_vals[:S, :k]
