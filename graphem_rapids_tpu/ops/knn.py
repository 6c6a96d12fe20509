"""k-nearest-neighbor search over edge midpoints, TPU-native.

This replaces all three native kNN engines of the reference with XLA / Pallas
strategies on one device model (SURVEY.md §2.3):

- reference torch.cdist + torch.topk chunks (embedder_pytorch.py:543-593)
- reference PyKeOps LazyTensor.argKmin     (embedder_pytorch.py:485-541)
- reference RAPIDS cuVS brute/ivf_flat/ivf_pq indices (embedder_cuvs.py:255-430)

Strategies:
- ``knn_exact``   : one (S, E) distance matrix + lax.top_k. Best for small E.
- ``knn_chunked`` : lax.scan over reference-point tiles with a running top-k
                    merge — the blockwise "never materialize S x E" property
                    the reference gets from PyKeOps, natively.
- ``knn_approx``  : chunked scan using jax.lax.approx_min_k, which lowers to
                    the TPU PartialReduce op from the TPU-KNN paper
                    (arXiv:2206.14286) — the cuVS ANN-index replacement.
- ``knn_pallas``  : hand-written Pallas tiled kernel (ops/knn_pallas.py).

All distances are squared Euclidean (monotone in the L2 distance used by
torch.cdist, so the neighbor sets match).
"""

from functools import partial

import jax
import jax.numpy as jnp

# Strategy auto-selection threshold: below this many reference points a single
# (S, E) distance matrix is cheap (<= 32Mi f32 at S=1024).
EXACT_MAX_REFS = 32768
DEFAULT_CHUNK = 8192
# Fraction of the device HBM budget the one-shot (S, E) distance buffer for
# the approx tier may use; beyond it the blockwise scan keeps HBM flat. On a
# 16 GiB v5e this yields 8 GiB — E ~= 4M at S=512, measured 2.0 ms one-shot
# with headroom for the engine's other buffers. Derived from the live device
# budget so a smaller-HBM device engages the scan before the buffer can OOM.
ONESHOT_HBM_FRACTION = 0.5
# Test hook: when set, oneshot_budget_bytes() returns this value verbatim.
ONESHOT_BUDGET_OVERRIDE = None


def oneshot_budget_bytes(device=None):
    """One-shot (S, E) distance-buffer budget from the device HBM budget."""
    if ONESHOT_BUDGET_OVERRIDE is not None:
        return ONESHOT_BUDGET_OVERRIDE
    from ..utils.memory_management import _platform_budget

    return int(_platform_budget(device) * ONESHOT_HBM_FRACTION)


def squared_distances(queries, refs):
    """(S, E) squared Euclidean distances.

    Always the difference formulation: XLA fuses the (S, E, d) reduce so
    nothing 3-D materializes, and for the tiny embedding dims used here
    (2-4 typical) it is both faster than the matmul expansion and immune
    to its fp32 cancellation (the ||q||^2 - 2 q.r + ||r||^2 form measured
    only ~62% exact-neighbor recall on v5e for standardized layouts —
    close distances cancel catastrophically).
    """
    diff = queries[:, None, :] - refs[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def knn_exact(queries, refs, k):
    """Exact kNN via one dense distance matrix + lax.top_k.

    Returns (indices (S, k) int32, sq_distances (S, k)).
    """
    d2 = squared_distances(queries, refs)
    neg_vals, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg_vals


def _merge_topk(vals_a, idx_a, vals_b, idx_b, k):
    """Merge two running top-k candidate sets (smallest-k by value)."""
    vals = jnp.concatenate([vals_a, vals_b], axis=1)
    idx = jnp.concatenate([idx_a, idx_b], axis=1)
    neg_vals, pos = jax.lax.top_k(-vals, k)
    return -neg_vals, jnp.take_along_axis(idx, pos, axis=1)


@partial(jax.jit, static_argnames=("k", "chunk_size", "approx"))
def _knn_scanned(queries, refs, k, chunk_size, approx):
    S = queries.shape[0]
    E, d = refs.shape
    n_chunks = -(-E // chunk_size)
    pad = n_chunks * chunk_size - E
    # Padded reference points sit at +LARGE so they can never be neighbors.
    refs_p = jnp.concatenate(
        [refs, jnp.full((pad, d), 1e30, refs.dtype)], axis=0
    ) if pad else refs
    refs_t = refs_p.reshape(n_chunks, chunk_size, d)
    offsets = (jnp.arange(n_chunks) * chunk_size).astype(jnp.int32)

    init_vals = jnp.full((S, k), jnp.inf, jnp.float32)
    init_idx = jnp.zeros((S, k), jnp.int32)

    def body(carry, chunk):
        vals, idx = carry
        ref_chunk, offset = chunk
        d2 = squared_distances(queries, ref_chunk).astype(jnp.float32)
        if approx:
            c_vals, c_idx = jax.lax.approx_min_k(d2, k)
        else:
            neg, c_idx = jax.lax.top_k(-d2, k)
            c_vals = -neg
        c_idx = c_idx.astype(jnp.int32) + offset
        return _merge_topk(vals, idx, c_vals, c_idx, k), None

    (vals, idx), _ = jax.lax.scan(body, (init_vals, init_idx), (refs_t, offsets))
    return idx, vals


def knn_chunked(queries, refs, k, chunk_size=DEFAULT_CHUNK):
    """Exact kNN with blockwise scan over reference tiles (running top-k)."""
    return _knn_scanned(queries, refs, k, min(chunk_size, refs.shape[0]), False)


@partial(jax.jit, static_argnames=("k", "compute_dtype", "recall_target"))
def _oneshot_approx(queries, refs, k, compute_dtype=None,
                    recall_target=0.95):
    """Jitted one-shot distance + PartialReduce.

    MUST run under jit: eagerly the (S, E, d) difference broadcast would
    materialize (24 GB at E=4M) — under jit XLA fuses it into the reduce
    and the MXU rewrite, leaving only the (S, E) distance buffer.

    Reference-point count is padded to a lane multiple: a ragged E
    (e.g. 3,999,991) measured ~25x slower than the aligned 4,000,000.

    compute_dtype (e.g. jnp.bfloat16) computes distances and runs the
    PartialReduce in that dtype — the (S, E) distance traffic is the
    dominant cost at large E, so bf16 measured ~37% faster at 800K refs
    on v5e for a small recall cost (this is an *approximate* tier).
    """
    E = refs.shape[0]
    E_pad = -(-E // 512) * 512
    if E_pad != E:
        refs = jnp.concatenate(
            [refs, jnp.full((E_pad - E, refs.shape[1]), 1e30, refs.dtype)]
        )
    if compute_dtype is not None:
        queries = queries.astype(compute_dtype)
        refs = refs.astype(compute_dtype)
    d2 = squared_distances(queries, refs)
    vals, idx = jax.lax.approx_min_k(d2, k, recall_target=recall_target)
    return idx.astype(jnp.int32), vals.astype(jnp.float32)


def knn_approx(queries, refs, k, chunk_size=DEFAULT_CHUNK,
               compute_dtype=None, recall_target=0.95):
    """Approximate kNN via the TPU PartialReduce op (jax.lax.approx_min_k).

    This is the TPU-native analog of the reference's cuVS ivf_flat/ivf_pq ANN
    tiers (embedder_cuvs.py:255-313): ~98% recall at a fraction of the sort
    cost (measured on v5e layouts). One-shot over the fused (S, E) distance
    while it fits the buffer budget — the fastest path measured (2.0ms for
    512x4M on v5e); blockwise scan with per-chunk PartialReduce beyond it.
    """
    S = queries.shape[0]
    E = refs.shape[0]
    if S * E * 4 <= oneshot_budget_bytes():
        return _oneshot_approx(queries, refs, int(k),
                               compute_dtype=compute_dtype,
                               recall_target=recall_target)
    return _knn_scanned(queries, refs, k, min(chunk_size, E), True)


def knn(queries, refs, k, strategy="auto", chunk_size=DEFAULT_CHUNK,
        compute_dtype=None, recall_target=0.95):
    """Strategy-dispatched kNN.

    strategy in {'auto', 'exact', 'chunked', 'approx', 'binfold',
    'pallas'}. 'auto' mirrors the reference's tiered engine selection
    (embedder_pytorch.py:449-483, embedder_cuvs.py:255-272) but selects a
    kernel strategy on one engine instead of a library.
    """
    E = refs.shape[0]
    if strategy == "auto":
        if E <= EXACT_MAX_REFS:
            strategy = "exact"
        elif jax.devices()[0].platform == "cpu":
            # Same tiering as the engine (models/embedder.py
            # _resolved_strategy): approx_min_k has no fast CPU lowering,
            # so CPU hosts take the exact blockwise scan rather than a
            # slower AND approximate path.
            strategy = "chunked"
        else:
            strategy = "approx"
    if strategy == "exact":
        return knn_exact(queries, refs, k)
    if strategy == "chunked":
        return knn_chunked(queries, refs, k, chunk_size)
    if strategy == "approx":
        return knn_approx(queries, refs, k, chunk_size,
                          compute_dtype=compute_dtype,
                          recall_target=recall_target)
    if strategy == "binfold":
        from .knn_binfold import knn_binfold  # lazy: pallas import cost

        # Fused Pallas distance + bin-min kernel: fastest approx tier on
        # TPU (no (S, E) HBM buffer at all). The engine auto-selects it
        # behind a compile probe (knn_binfold.probe); off-TPU it runs in
        # interpret mode (tests).
        return knn_binfold(queries, refs, k, recall_target=recall_target)
    if strategy == "pallas":
        from .knn_pallas import knn_pallas  # lazy: pallas import cost

        # NOTE: Mosaic compile failures surface at jit-compile time of the
        # caller, after tracing — a try/except here cannot tier down. The
        # 'pallas' strategy is opt-in; 'auto' never selects it:
        # hardware-measured as a fallback-only artifact (it ties the
        # blockwise scan at every size — 34.75 vs 33.66 ms at E=100K,
        # 101.4 vs 95.9 ms at E=1.6M incl. ~27 ms tunnel dispatch floor —
        # while binfold wins both by 5-70 ms;
        # experiments/ab_knn_exact_tiers.py). Kept as the exact-kNN
        # escape hatch for toolchains where lax.top_k or approx_min_k
        # regress.
        return knn_pallas(queries, refs, k)
    raise ValueError(f"Unknown kNN strategy: {strategy!r}")
