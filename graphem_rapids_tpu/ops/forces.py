"""Force computations for the layout iteration, TPU-native.

The reference accumulates per-edge forces onto vertices with CUDA
``index_add_`` atomics (graphem_rapids/backends/embedder_pytorch.py:595-636,
:638-736). On TPU the idiomatic (and deterministic) equivalent is
``jax.ops.segment_sum`` over the COO edge list. Because the edge list is
static for the lifetime of an embedder, we pre-sort the scatter indices once
at init time (``build_scatter_plan``) so every iteration runs a
sorted-segment-sum, which XLA lowers to a far cheaper kernel than a random
scatter.

The intersection-repulsion pass replaces the reference's data-dependent
boolean filtering (embedder_pytorch.py:671-719) with a static-shape
multiplicative 0/1 weight: mathematically identical accumulated forces, no
recompilation, no dynamic shapes (SURVEY.md §7.1.1).
"""


import jax
import jax.numpy as jnp
import numpy as np

from .intersect import segments_intersect_2d

EPS = 1e-6


def build_scatter_plan(edges_np, n):
    """Precompute a sorted scatter plan for spring-force accumulation.

    Parameters
    ----------
    edges_np : np.ndarray (E, 2) int
        COO edge list with i < j.
    n : int
        Number of vertices.

    Returns
    -------
    dict with 'perm' (2E,) int32 and 'sorted_ids' (2E,) int32 arrays such that
    ``segment_sum(values[perm], sorted_ids, indices_are_sorted=True)``
    accumulates edge forces (values = [f; -f] stacked) onto vertices.
    """
    idx = np.concatenate([edges_np[:, 0], edges_np[:, 1]]).astype(np.int32)
    perm = np.argsort(idx, kind="stable").astype(np.int32)
    return {
        "perm": jnp.asarray(perm),
        "sorted_ids": jnp.asarray(idx[perm]),
        "n": n,
    }


def _optimal_table_cap(deg, n, max_cap=1024):
    """Pick the neighbor-table width minimizing per-iteration gather work.

    The spring pass reads every table slot (real or self-padded) at the
    HBM gather row floor, plus the overflow rows, plus ~_SCATTER_ROW_COST
    per scattered overflow block (build_overflow_plan folds B=128-row
    blocks). For each candidate width C:

        cost(C) = n*C                    (table slots gathered)
                + O(C)                   (overflow rows gathered)
                + H(C) * 64              (block padding, ~B/2 per hub)
                + 14 * (O(C)/128 + H(C)) (block partial scatter rows)

    where O(C) = sum_v max(deg_v - C, 0) and H(C) = |{v : deg_v > C}|.
    The old heuristic (max(32, 4*mean)) over-padded skewed graphs ~5x:
    with a binomial or Zipf tail, most slots beyond the mean are
    self-pads that still cost a full gather row each iteration.
    """
    max_deg = int(deg.max()) if len(deg) else 1
    hi = int(min(max_deg, max_cap))
    # tail sums over the degree histogram: for each C, O(C) and H(C)
    hist = np.bincount(np.minimum(deg, hi), minlength=hi + 2)
    mass = hist * np.arange(hi + 2)                 # degree mass per bin
    # include the true (clipped) degrees' excess above hi
    extra = int((deg[deg > hi] - hi).sum()) if max_deg > hi else 0
    C = np.arange(1, hi + 1)
    n_tail = hist[::-1].cumsum()[::-1]              # |{deg >= c}| at index c
    m_tail = mass[::-1].cumsum()[::-1]              # sum of deg >= c
    H_clip = n_tail[C + 1]                          # |{deg > C}| on CLIPPED deg
    # True hub count: vertices with deg > hi are clipped INTO bin hi, so
    # they vanish from H_clip exactly at C == hi — add them back there so
    # the padding/scatter terms see the real hub count (ADVICE r1). For
    # C < hi the clipped and true counts coincide.
    n_over = int((deg > hi).sum()) if max_deg > hi else 0
    H = H_clip + np.where(C == hi, n_over, 0)
    # O uses the clipped tail sums (the above-hi surplus enters via
    # `extra`, constant in C), so it pairs with H_clip, not H.
    O = m_tail[C + 1] - C * H_clip + extra
    cost = n * C + O + 64 * H + _SCATTER_ROW_COST * (O // 128 + H)
    return int(C[int(np.argmin(cost))])


def build_neighbor_table(edges_np, n, cap=None, ref_order="row",
                         ref_budget=None, to_device=True):
    """Precompute a dense neighbor table for gather-based spring forces.

    TPU scatters are slow (and slow to compile); a dense (n, D) neighbor
    table turns force aggregation into a gather + row-sum, which measured
    ~4x faster than segment_sum on v5e. Rows are padded with the vertex's
    own index (self-pairs contribute exactly zero force). For skewed degree
    distributions the table is capped at ``cap`` columns and the surplus
    incident pairs go into a small COO overflow list handled by
    segment_sum — exact for every degree distribution.

    The table doubles as a midpoint factory for the kNN pass: the gathered
    ``positions[table]`` already holds every edge's far endpoint, so edge
    midpoints come free of any extra HBM gather (measured as the single
    biggest per-iteration cost at the 100K tier). The slot maps below let
    the layout step build the kNN reference set directly from table slots
    and translate kNN results back to edge ids:

    Returns dict with:
      'table'      : (n, D) int32 neighbor ids (self-padded)
      'overflow'   : (O, 2) int32 (vertex, neighbor) directed pairs
      'n'          : int
      'ref_edge'   : (n*D + O2,) int32 — edge id per kNN reference slot
                     (flattened i<j table slots, then i<j overflow pairs)
      'ref_valid'  : (n*D,) bool — which flattened table slots are real
                     i<j edges (pad slots and j>i duplicates are False)
      'overflow_lt': (O2, 2) int32 — i<j overflow pairs (appended refs)
      'edge_ref'   : (E,) int32 — reference-slot index of each edge
      'overflow_plan': dict or None — block-fold scatter plan for the
                     overflow pairs (build_overflow_plan)

    ``ref_order`` picks the flattened ref-space enumeration:
      'row'  (default): slot (v, s) -> v*ref_cap + s, table stored (n, D).
      'slot': slot (v, s) -> s*n + v, table stored TRANSPOSED (D, n) under
              'table_t'. The slot-major order lets the device step build
              the ref set from per-slot 2D (n, d) blocks whose natural
              XLA layouts are n-minor — at very large n the row-major
              order makes XLA materialize cap-minor temps whose (cap ->
              128) lane padding is a 16x HBM blowup (measured: the 30M
              tier failed to compile at 20.7G/15.75G from exactly those
              temps, experiments/data/bench_30m_binned4.log).
    """
    if len(edges_np) == 0:
        put = jnp.asarray if to_device else np.asarray
        out = {
            "table": put(np.zeros((n, 1), np.int32)),
            "overflow": np.zeros((0, 2), np.int32),
            "n": n,
            "ref_cap": 1,
            "ref_edge": put(np.zeros((n,), np.int32)),
            "ref_valid": put(np.zeros((n,), bool)),
            "overflow_lt": np.zeros((0, 2), np.int32),
            "edge_ref": put(np.zeros((0,), np.int32)),
            "overflow_plan": None,
            "ref_order": ref_order,
        }
        if ref_order == "slot":
            out["table_t"] = out.pop("table").T
        return out
    # Forward/reverse half decomposition (same cost discipline as
    # build_neighbor_table_binned): no 2E directed-entry arrays, no 2E
    # lexsort — two stable E-argsorts plus rank arithmetic, int32 ids.
    # Edge rows are normalized to (lo, hi); every in-repo caller already
    # passes i<j edges, for which this is the identity.
    E = len(edges_np)
    e0 = np.minimum(edges_np[:, 0], edges_np[:, 1]).astype(np.int32)
    e1 = np.maximum(edges_np[:, 0], edges_np[:, 1]).astype(np.int32)
    deg = np.bincount(e0, minlength=n) + np.bincount(e1, minlength=n)
    if cap is None:
        cap = _optimal_table_cap(deg, n)
    cap = max(cap, 1)

    # Within each vertex's row, i<j neighbors come FIRST: the kNN midpoint
    # reference set is built from a prefix of the table columns (ref_cap
    # below), so packing the i<j slots into that prefix minimizes padded
    # (never-a-reference) slots the approx kNN has to scan past.
    from ..native import radix_argsort_native, scatter_ranks_native

    deg_fwd = np.bincount(e0, minlength=n)
    deg_rev = np.bincount(e1, minlength=n)
    s = radix_argsort_native(e0)
    if s is None:
        s = np.argsort(e0, kind="stable").astype(np.int32)
    fwd_start = np.concatenate(
        [[0], np.cumsum(deg_fwd)[:-1]]
    ).astype(np.int32)
    col_fwd = scatter_ranks_native(s, e0, fwd_start)
    if col_fwd is None:
        col_fwd = np.empty(E, np.int32)
        col_fwd[s] = np.arange(E, dtype=np.int32) - fwd_start[e0[s]]
    r = radix_argsort_native(e1)
    rev_start = np.concatenate(
        [[0], np.cumsum(deg_rev)[:-1]]
    ).astype(np.int32)
    col_rev = (
        scatter_ranks_native(r, e1, rev_start) if r is not None else None
    )
    if col_rev is None:
        if r is None:
            r = np.argsort(e1, kind="stable")
        col_rev = np.empty(E, np.int32)
        col_rev[r] = np.arange(E, dtype=np.int32) - rev_start[e1[r]]
    col_rev += deg_fwd[e1].astype(np.int32)

    in_t_fwd = col_fwd < cap
    in_t_rev = col_rev < cap
    table = np.repeat(np.arange(n, dtype=np.int32)[:, None], cap, axis=1)
    table[e0[in_t_fwd], col_fwd[in_t_fwd]] = e1[in_t_fwd]
    table[e1[in_t_rev], col_rev[in_t_rev]] = e0[in_t_rev]
    # overflow pairs vertex-sorted, i<j entries first within a vertex
    ov_src = np.concatenate([e0[~in_t_fwd], e1[~in_t_rev]])
    ov_dst = np.concatenate([e1[~in_t_fwd], e0[~in_t_rev]])
    o = radix_argsort_native(ov_src)
    if o is None:
        o = np.argsort(ov_src, kind="stable")
    overflow = np.column_stack([ov_src[o], ov_dst[o]])
    overflow_plan = build_overflow_plan(overflow)

    # ref_cap: smallest column prefix whose total slot count (n*C) plus
    # the overflowed i<j edges (each costing roughly an order of magnitude
    # more than a scanned slot: two gathered endpoint rows vs one lane of
    # fused distance traffic) is cheapest for the kNN pass.
    lt_deg = deg_fwd.clip(max=cap)
    max_lt = int(lt_deg.max()) if n else 1
    best_cost, ref_cap = None, max(max_lt, 1)
    for C in range(1, max_lt + 1):
        over = int(np.maximum(lt_deg - C, 0).sum())
        cost = n * C + 13 * over
        if best_cost is None or cost < best_cost:
            best_cost, ref_cap = cost, C
    if ref_budget is not None:
        # same segmented-index-bound trim as the binned build: drop ref
        # columns (cheapest pads first) until slots + spills fit
        m = int(deg_fwd.max()) if n else 0
        h = np.bincount(deg_fwd, minlength=m + 1)
        gt = n - np.cumsum(h)  # gt[c] = #{v: fwd_deg_v > c}
        total = n * ref_cap + int(gt[ref_cap:].sum())
        while total > ref_budget and ref_cap > 1:
            c = ref_cap - 1
            gt_c = int(gt[c]) if c < len(gt) else 0
            if gt_c >= n:
                break  # the column is all real edges
            total -= n - gt_c
            ref_cap -= 1

    # ref maps follow the (vertex asc, column asc) enumeration of i<j
    # slots — ks restricts the e0-sort to that order so the overflow-ref
    # block keeps the layout the previous formulation produced
    ks = s.astype(np.int32)
    sel_s = col_fwd[ks] < ref_cap
    kt = ks[sel_s]
    ko = ks[~sel_s]
    slot_edge = np.zeros((n, ref_cap), np.int32)
    ref_valid = np.zeros((n, ref_cap), bool)
    slot_edge[e0[kt], col_fwd[kt]] = kt
    ref_valid[e0[kt], col_fwd[kt]] = True

    overflow_lt = np.column_stack([e0[ko], e1[ko]])
    edge_ref = np.full(E, -1, np.int32)
    if ref_order == "slot":
        edge_ref[kt] = col_fwd[kt] * n + e0[kt]
    else:
        edge_ref[kt] = e0[kt] * ref_cap + col_fwd[kt]
    edge_ref[ko] = n * ref_cap + np.arange(len(ko), dtype=np.int32)

    if ref_order == "slot":
        slot_edge = np.ascontiguousarray(slot_edge.T)
        ref_valid = np.ascontiguousarray(ref_valid.T)
    ref_edge = np.concatenate([slot_edge.reshape(-1), ko])
    # to_device=False keeps every array host-side: the sharded tier pads
    # and reshapes these before its own single device placement, and a
    # device round-trip here would cost a full fetch + re-upload of the
    # table bytes over the TPU tunnel (measured as most of the 70 s
    # sharded-vs-single init gap at 10M vertices, BASELINE.md round 3).
    put = jnp.asarray if to_device else np.asarray
    out = {
        "overflow": overflow,
        "n": n,
        "ref_cap": ref_cap,
        "ref_edge": put(ref_edge),
        "ref_valid": put(ref_valid.reshape(-1)),
        "overflow_lt": overflow_lt,
        "edge_ref": put(edge_ref),
        "overflow_plan": overflow_plan,
        "ref_order": ref_order,
    }
    if ref_order == "slot":
        out["table_t"] = put(np.ascontiguousarray(table.T))
    else:
        out["table"] = put(table)
    return out


# Scatter rows cost ~14x a gathered/computed row on v5e (111 vs 8 ns
# measured, BASELINE.md), so the overflow plan below trades padded rows
# (pure gather+VPU) for scatter rows at that exchange rate.
_SCATTER_ROW_COST = 14


def plan_degree_buckets(deg_clipped, max_buckets=8, overhead_rows=4096):
    """Partition vertices into degree buckets minimizing total table rows.

    The HBM gather cost of the spring pass is proportional to the TOTAL
    table slot count (measured flat at ~6 ns/row whether issued as one
    gather or several — experiments/gather_bucket_probe.py), so splitting
    the single (n, C) table into per-degree-range tables whose caps hug
    the local maximum degree removes most self-pad rows: for binomial or
    heavy-tailed degree distributions that is a 1.3-1.5x cut in the
    step's dominant term.

    Exact DP over the distinct clipped-degree values: a bucket covering
    distinct values (v_i..v_j] costs count * v_j + overhead_rows (the
    per-extra-gather-op allowance). Returns [(count, cap), ...] ascending
    by cap; a single-entry result means binning buys nothing.
    """
    vals, counts = np.unique(deg_clipped, return_counts=True)
    m = len(vals)
    pc = np.concatenate([[0], np.cumsum(counts)]).astype(np.float64)
    best = np.full(m + 1, np.inf)
    best[0] = 0.0
    choice = np.zeros(m + 1, np.int64)
    for j in range(1, m + 1):
        cand = best[:j] + (pc[j] - pc[:j]) * vals[j - 1] + overhead_rows
        i = int(np.argmin(cand))
        best[j], choice[j] = cand[i], i
    buckets = []
    j = m
    while j > 0:
        i = choice[j]
        buckets.append((int(pc[j] - pc[i]), int(vals[j - 1])))
        j = i
    buckets = buckets[::-1]
    while len(buckets) > max_buckets:
        extras = [
            buckets[g][0] * (buckets[g + 1][1] - buckets[g][1])
            - overhead_rows
            for g in range(len(buckets) - 1)
        ]
        g = int(np.argmin(extras))
        buckets[g:g + 2] = [
            (buckets[g][0] + buckets[g + 1][0], buckets[g + 1][1])
        ]
    return buckets


def build_neighbor_table_binned(edges_user, n, overhead_rows=4096,
                                ref_order="row", ref_budget=None,
                                to_device=True):
    """Degree-binned neighbor tables with an internal vertex renumbering.

    Vertices are stably sorted by (table-cap-clipped) directed degree and
    partitioned into plan_degree_buckets groups; each group gets its own
    (count_g, cap_g) self-padded table. Because the renumbering makes
    groups contiguous, the spring pass assembles per-bucket force blocks
    by concatenation — no scatter, no inverse-permutation gather on the
    hot path. Degrees beyond the global cost-model cap still spill to the
    block-fold overflow plan exactly as in build_neighbor_table.

    Returns None when the bucket plan degenerates to one bucket (the flat
    table is already optimal — e.g. regular graphs), else a dict:
      'perm'      : (n,) int — internal id -> user id
      'inv_perm'  : (n,) int32 — user id -> internal id
      'edges_int' : (E, 2) int32 — internal-id edge list, i<j, lexsorted
      'edge_map'  : (E,) int32 — user edge index -> internal edge index
      'buckets'   : list of dicts {'start', 'count', 'cap', 'ref_cap',
                    'ref_offset', 'table' (count, cap) int32 jnp}
      'overflow', 'overflow_plan', 'overflow_lt', 'edge_ref', 'ref_edge',
      'ref_valid', 'n' : as in build_neighbor_table (internal ids; the
                    flattened ref space is the concatenation of each
                    bucket's (count_g * ref_cap_g) slots, then overflow)

    ``ref_order`` (see build_neighbor_table): 'row' enumerates each
    bucket's ref slots (v, s) -> p*ref_cap_g + s (p = v - start_g) and
    stores 'table' (count, cap); 'slot' enumerates s*count_g + p and
    stores 'table_t' (cap, count) — the layout the slotwise device path
    (spring_refs_binned_slotwise) wants, which avoids the cap-minor
    lane-padding blowup at very large n.
    """
    E = len(edges_user)
    if E == 0:
        return None
    if max(2 * E, n) >= 2**31:
        raise ValueError(
            f"neighbor-table slot space needs int32 indices: "
            f"n={n}, E={E} exceeds 2^31 slots"
        )
    deg = (
        np.bincount(edges_user[:, 0].astype(np.int64), minlength=n)
        + np.bincount(edges_user[:, 1].astype(np.int64), minlength=n)
    )
    C_star = _optimal_table_cap(deg, n)
    clipped = np.minimum(deg, C_star)
    spec = plan_degree_buckets(clipped, overhead_rows=overhead_rows)
    if len(spec) == 1:
        return None

    # Host-build cost discipline (measured at n=10M / E=35M, see
    # BASELINE.md): everything below runs on FORWARD (i<j) and REVERSE
    # edge halves separately — the 2E directed-entry arrays, their 2E
    # lexsort, and the 2E rank arithmetic of the earlier formulation were
    # ~60% of a 95 s build. Ids ride int32 (n < 2^31 by the int32 device
    # contract) to halve sort/gather traffic. The remaining E-sized sorts
    # and permutation passes run on the threaded C helpers
    # (native/fastgraph.c: LSD radix argsort, relabel+minmax, pair
    # permute, rank scatter) when the extension is built — together they
    # took the 10M build from ~53 s to well under the 27 s round-3
    # target; every helper has the original numpy line as fallback.
    from ..native import (
        apply_perm_minmax_native,
        permute_pairs_native,
        radix_argsort_native,
        scatter_ranks_native,
    )

    perm = radix_argsort_native(clipped)
    if perm is None:
        perm = np.argsort(clipped, kind="stable")
    inv = np.empty(n, np.int32)
    inv[perm] = np.arange(n, dtype=np.int32)

    edges32 = (
        edges_user if edges_user.dtype == np.int32
        else edges_user.astype(np.int32)
    )
    lohi = apply_perm_minmax_native(edges32, inv)
    if lohi is not None:
        e_lo, e_hi = lohi
    else:
        a = inv[edges_user]
        e_lo = np.minimum(a[:, 0], a[:, 1])
        e_hi = np.maximum(a[:, 0], a[:, 1])
    # single pack-key argsort instead of a two-pass lexsort (keys unique;
    # lo << bits(n) | hi sorts identically to lo * n + hi)
    order = radix_argsort_native(
        (e_lo.astype(np.uint64) << int(n).bit_length())
        | e_hi.astype(np.uint64)
    )
    if order is None:
        order = np.argsort(e_lo.astype(np.int64) * n + e_hi)
    pp = permute_pairs_native(e_lo, e_hi, np.asarray(order, np.int32))
    if pp is not None:
        edges_int, edge_map = pp
        e0 = edges_int[:, 0].copy()
        e1 = edges_int[:, 1].copy()
    else:
        e0 = e_lo[order]
        e1 = e_hi[order]
        edges_int = np.column_stack([e0, e1])
        edge_map = np.empty(E, np.int32)
        edge_map[order] = np.arange(E, dtype=np.int32)
    # internal edge p corresponds to user edge order[p]; the step's pair
    # dedup compares USER ids to preserve reference semantics
    edge_user = order

    counts = np.array([c for c, _ in spec], np.int64)
    caps = np.array([cap for _, cap in spec], np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    vcap = np.repeat(caps, counts).astype(np.int32)   # per internal vertex

    # Vertex v's table row holds its i<j (forward) neighbors first, then
    # its reverse neighbors — the same slot layout the directed
    # (2E-entry, forward-first lexsort) formulation produced. Forward
    # ranks fall out of the edge sort (edges are e0-grouped); reverse
    # ranks need the one remaining stable sort, over E entries. All
    # E-sized rank/offset arrays stay int32 (slot counts < 2^31).
    deg_fwd = np.bincount(e0, minlength=n)            # == lt_deg
    deg_rev = np.bincount(e1, minlength=n)
    fwd_start = np.concatenate(
        [[0], np.cumsum(deg_fwd)[:-1]]
    ).astype(np.int32)
    col_fwd = np.arange(E, dtype=np.int32) - fwd_start[e0]
    r = radix_argsort_native(e1)
    rev_start = np.concatenate(
        [[0], np.cumsum(deg_rev)[:-1]]
    ).astype(np.int32)
    col_rev = (
        scatter_ranks_native(r, e1, rev_start) if r is not None else None
    )
    if col_rev is None:
        if r is None:
            r = np.argsort(e1, kind="stable")
        col_rev = np.empty(E, np.int32)
        col_rev[r] = np.arange(E, dtype=np.int32) - rev_start[e1[r]]
    col_rev += deg_fwd[e1].astype(np.int32)           # absolute row column

    # flat slot space: vertex i owns vcap[i] consecutive slots. The sum
    # can exceed 2E (bucket caps pad rows), so re-check the int32 bound
    # on the ACTUAL slot total before narrowing.
    slot_off64 = np.concatenate([[0], np.cumsum(vcap, dtype=np.int64)])
    if int(slot_off64[-1]) >= 2**31:
        raise ValueError(
            f"neighbor-table slot space needs int32 indices: "
            f"{int(slot_off64[-1])} slots exceeds 2^31"
        )
    slot_off = slot_off64.astype(np.int32)
    in_t_fwd = col_fwd < vcap[e0]
    in_t_rev = col_rev < vcap[e1]
    flat_table = np.repeat(
        np.arange(n, dtype=np.int32), vcap
    )                                                 # self-pad default
    flat_table[slot_off[e0[in_t_fwd]] + col_fwd[in_t_fwd]] = e1[in_t_fwd]
    flat_table[slot_off[e1[in_t_rev]] + col_rev[in_t_rev]] = e0[in_t_rev]

    # overflow pairs vertex-sorted, forward entries first within a vertex
    # (what build_overflow_plan's hub-contiguous runs expect)
    ov_src = np.concatenate([e0[~in_t_fwd], e1[~in_t_rev]])
    ov_dst = np.concatenate([e1[~in_t_fwd], e0[~in_t_rev]])
    o = radix_argsort_native(ov_src)
    if o is None:
        o = np.argsort(ov_src, kind="stable")
    overflow = np.column_stack([ov_src[o], ov_dst[o]]).astype(np.int32)
    overflow_plan = build_overflow_plan(overflow)

    # per-bucket kNN ref prefix (same cost model as the flat ref_cap);
    # ref slots are forward-only, whose edge ids are arange(E) by the
    # construction above
    lt_deg = deg_fwd
    ref_caps = np.zeros(len(spec), np.int64)
    for g, (cnt, cap) in enumerate(spec):
        ld = np.minimum(lt_deg[starts[g]:starts[g] + cnt], cap)
        hi = int(ld.max()) if cnt else 0
        if hi == 0:
            ref_caps[g] = 0  # no i<j slots in this bucket's tables
            continue
        best_cost, best_C = None, hi
        for C in range(1, hi + 1):
            over = int(np.maximum(ld - C, 0).sum())
            cost = cnt * C + 13 * over
            if best_cost is None or cost < best_cost:
                best_cost, best_C = cost, C
        ref_caps[g] = best_C
    if ref_budget is not None:
        # Bound the TOTAL ref space (slot prefixes + i<j spills) for the
        # kernel's segmented-index limit: greedily drop the ref column
        # holding the fewest real edges — each drop deletes count_g
        # slots and spills n_gt (< count_g) edges to overflow refs, a
        # strict shrink. At 30M/96M-edge scale the cost-model prefixes
        # carry ~43M pure pad slots that push the total 3% past
        # MAX_REFS_SEGMENTED, which would otherwise silently disable
        # fused refs (BASELINE.md round 3).
        n_gt = []
        spill0 = 0
        for g, (cnt, cap) in enumerate(spec):
            ld = lt_deg[starts[g]:starts[g] + cnt]
            m = int(ld.max()) if cnt else 0
            h = np.bincount(ld, minlength=m + 1)
            gt = cnt - np.cumsum(h)  # gt[c] = #{v: fwd_deg_v > c}
            n_gt.append(gt)
            spill0 += int(gt[ref_caps[g]:].sum())
        total = int((counts * ref_caps).sum()) + spill0
        while total > ref_budget:
            best_g, best_d = -1, 0
            for g, (cnt, _cap) in enumerate(spec):
                if ref_caps[g] == 0:
                    continue
                c = int(ref_caps[g]) - 1
                gt_c = int(n_gt[g][c]) if c < len(n_gt[g]) else 0
                d = cnt - gt_c  # pad slots deleted by dropping column c
                if d > best_d:
                    best_d, best_g = d, g
            if best_g < 0:
                break  # every remaining slot is a real edge
            ref_caps[best_g] -= 1
            total -= best_d
    vref = np.repeat(ref_caps, counts).astype(np.int32)
    ref_off = np.concatenate([[0], np.cumsum(counts * ref_caps)])
    R_slots = int(ref_off[-1])

    sel_t = col_fwd < vref[e0]
    if ref_order == "slot":
        # slot-major within each bucket: base_g + s*count_g + (v - start_g)
        base = np.repeat(ref_off[:-1], counts).astype(np.int32)
        cntv = np.repeat(counts, counts).astype(np.int32)
        posv = (np.arange(n, dtype=np.int32)
                - np.repeat(starts, counts).astype(np.int32))
        et = e0[sel_t]
        ref_slot = base[et] + col_fwd[sel_t] * cntv[et] + posv[et]
    else:
        ref_row_off = (
            np.repeat(ref_off[:-1], counts) + (
                np.arange(n) - np.repeat(starts, counts)
            ) * vref
        ).astype(np.int32)
        ref_slot = ref_row_off[e0[sel_t]] + col_fwd[sel_t]
    ref_valid = np.zeros(R_slots, bool)
    ref_valid[ref_slot] = True
    slot_ref_edge = np.zeros(R_slots, np.int32)
    eids_fwd = np.arange(E, dtype=np.int32)
    slot_ref_edge[ref_slot] = eids_fwd[sel_t]

    sel_o = ~sel_t
    overflow_lt = np.column_stack([e0[sel_o], e1[sel_o]])
    edge_ref = np.full(E, -1, np.int32)
    edge_ref[sel_t] = ref_slot
    edge_ref[sel_o] = R_slots + np.arange(
        int(sel_o.sum()), dtype=np.int32
    )
    ref_edge = np.concatenate([slot_ref_edge, eids_fwd[sel_o]])

    # see build_neighbor_table: to_device=False keeps arrays host-side
    # for callers (the sharded tier) that pad before device placement
    put = jnp.asarray if to_device else np.asarray
    buckets = []
    for g, (cnt, cap) in enumerate(spec):
        a, b = slot_off[starts[g]], slot_off[starts[g] + cnt]
        bucket = {
            "start": int(starts[g]),
            "count": int(cnt),
            "cap": int(cap),
            "ref_cap": int(ref_caps[g]),
            "ref_offset": int(ref_off[g]),
        }
        t = flat_table[a:b].reshape(cnt, cap)
        if ref_order == "slot":
            bucket["table_t"] = put(np.ascontiguousarray(t.T))
        else:
            bucket["table"] = put(t)
        buckets.append(bucket)

    return {
        "perm": perm,
        "inv_perm": inv,
        "edges_int": edges_int,
        "edge_map": edge_map,
        "edge_user": edge_user,
        "buckets": buckets,
        "overflow": overflow,
        "overflow_plan": overflow_plan,
        "overflow_lt": overflow_lt,
        "edge_ref": put(edge_ref),
        "ref_edge": put(ref_edge),
        "ref_valid": put(ref_valid),
        "ref_order": ref_order,
        "n": n,
    }


def spring_forces_binned(positions, pn_list, nbb, k_attr, L_min,
                         overflow_edges=None, overflow_plan=None):
    """Spring forces over the degree-binned tables (gather + row-sum).

    ``pn_list[g] = positions[buckets[g]['table']]``. Internal vertex ids
    are degree-contiguous, so the per-bucket force blocks concatenate
    into the (n, d) array directly — no scatter, no permutation gather.
    """
    blocks = []
    for g, pn in zip(nbb["buckets"], pn_list):
        pv = jax.lax.slice_in_dim(
            positions, g["start"], g["start"] + g["count"]
        )
        if g["cap"] == 0:
            blocks.append(jnp.zeros_like(pv))
            continue
        diff = pn - pv[:, None, :]
        dist = jnp.linalg.norm(diff, axis=-1, keepdims=True) + EPS
        f = (-k_attr * (dist - L_min)) * (diff / dist)
        blocks.append(f.sum(axis=1))
    forces = jnp.concatenate(blocks, axis=0)
    if overflow_plan is not None:
        forces = apply_overflow_plan(
            forces, positions, overflow_plan, k_attr, L_min
        )
    elif overflow_edges is not None and overflow_edges.shape[0] > 0:
        fo = _overflow_spring(positions, overflow_edges, k_attr, L_min)
        forces = forces + jax.ops.segment_sum(
            fo, overflow_edges[:, 0], num_segments=nbb["n"]
        )
    return forces


def midpoint_refs_binned(positions, pn_list, nbb, overflow_lt=None):
    """Edge-midpoint kNN reference set from the binned spring gathers.

    Binned counterpart of midpoint_refs_from_gathered: slot (v, s) of
    bucket g holds (pos[v] + pn_g[v - start, s]) / 2 over the first
    ref_cap_g columns; buckets concatenate into the flattened ref space
    nbb['ref_edge'] / nbb['ref_valid'] index, then overflow midpoints
    append.
    """
    d = positions.shape[1]
    parts = []
    off = 0  # running offset into the bucket-major flat ref space
    for g, pn in zip(nbb["buckets"], pn_list):
        rc = min(g["ref_cap"], g["cap"])
        if rc == 0:
            continue
        pv = jax.lax.slice_in_dim(
            positions, g["start"], g["start"] + g["count"]
        )
        valid = jax.lax.slice_in_dim(
            nbb["ref_valid"], off, off + g["count"] * rc
        )
        parts.append(masked_slot_midpoints(pv, pn, rc, valid))
        off += g["count"] * rc
    if not parts:
        refs = jnp.zeros((0, d), positions.dtype)
    else:
        refs = jnp.concatenate(parts, axis=0)
    if overflow_lt is not None and overflow_lt.shape[0] > 0:
        refs = jnp.concatenate(
            [refs, overflow_midpoints(positions, overflow_lt)], axis=0
        )
    return refs


def _apply_table_overflow(forces, positions, n, overflow_edges,
                          overflow_plan, k_attr, L_min):
    """Shared overflow accumulation for the table spring variants."""
    if overflow_plan is not None:
        return apply_overflow_plan(
            forces, positions, overflow_plan, k_attr, L_min
        )
    if overflow_edges is not None and overflow_edges.shape[0] > 0:
        fo = _overflow_spring(positions, overflow_edges, k_attr, L_min)
        return forces + jax.ops.segment_sum(
            fo, overflow_edges[:, 0], num_segments=n
        )
    return forces


def spring_refs_binned_slotwise(positions, tables_t, nbb, k_attr, L_min,
                                ref_valid=None, overflow_lt=None,
                                overflow_edges=None, overflow_plan=None,
                                want_refs=True, packed=None):
    """Spring forces + midpoint refs from slot-major binned tables.

    Device path for ``build_neighbor_table_binned(..., ref_order='slot')``:
    one (count_g,)-row gather per table COLUMN, accumulating the spring
    fold and (for the first ref_cap_g columns) emitting the (count_g, d)
    midpoint block for the slot-major flat ref space. Every intermediate
    is 2D with the long axis leading — there are no (count, cap) or
    (d, count, cap) temps for XLA to lane-pad, which is what blocked the
    30M-vertex compile on the row-major path (16x padding on cap -> 128,
    experiments/data/bench_30m_binned4.log; reference scale anchor:
    embedder_cuvs.py routes >1M vertices to ivf_pq).

    Returns ``(forces, refs)``; ``refs`` is None when ``want_refs`` is
    False. Semantics match spring_forces_binned + midpoint_refs_binned
    exactly (same per-slot math, reordered ref enumeration).

    ``packed``: optional pack_positions(positions) view — the per-slot
    gathers then run lane-packed (packed_take), value-identical but
    ~1.8x cheaper per row on TPU at >=1M-row sources (see the
    PACKED_GATHER_G note above).
    """
    d = positions.shape[1]
    blocks = []
    parts = []
    off = 0
    for g, tt in zip(nbb["buckets"], tables_t):
        cnt, cap = g["count"], g["cap"]
        rc = min(g["ref_cap"], cap)
        pv = jax.lax.slice_in_dim(positions, g["start"], g["start"] + cnt)
        if cap == 0:
            blocks.append(jnp.zeros_like(pv))
            continue
        acc = jnp.zeros_like(pv)
        for s in range(cap):
            pn_s = (
                packed_take(packed, tt[s], d) if packed is not None
                else positions[tt[s]]
            )
            diff = pn_s - pv
            dist = jnp.linalg.norm(diff, axis=-1, keepdims=True) + EPS
            acc = acc + (-k_attr * (dist - L_min)) * (diff / dist)
            if want_refs and s < rc:
                v = jax.lax.slice_in_dim(
                    ref_valid, off + s * cnt, off + (s + 1) * cnt
                )
                parts.append(jnp.where(
                    v[:, None], (pv + pn_s) * 0.5,
                    jnp.asarray(REF_PAD_VALUE, positions.dtype),
                ))
        blocks.append(acc)
        off += cnt * rc
    forces = jnp.concatenate(blocks, axis=0)
    forces = _apply_table_overflow(
        forces, positions, nbb["n"], overflow_edges, overflow_plan,
        k_attr, L_min,
    )
    refs = None
    if want_refs:
        d = positions.shape[1]
        refs = (
            jnp.concatenate(parts, axis=0) if parts
            else jnp.zeros((0, d), positions.dtype)
        )
        if overflow_lt is not None and overflow_lt.shape[0] > 0:
            refs = jnp.concatenate(
                [refs, overflow_midpoints(positions, overflow_lt)], axis=0
            )
    return forces, refs


def spring_refs_slotwise(positions, table_t, nb, k_attr, L_min,
                         ref_valid=None, overflow_lt=None,
                         overflow_edges=None, overflow_plan=None,
                         want_refs=True, packed=None):
    """Flat-table counterpart of spring_refs_binned_slotwise.

    Device path for ``build_neighbor_table(..., ref_order='slot')``:
    the (D, n) transposed table is walked one column-row at a time; ref
    slot (v, s) lands at flat index s*n + v. ``packed``: see
    spring_refs_binned_slotwise.
    """
    D = table_t.shape[0]
    n = positions.shape[0]
    d = positions.shape[1]
    rc = min(nb["ref_cap"], D)
    acc = jnp.zeros_like(positions)
    parts = []
    for s in range(D):
        pn_s = (
            packed_take(packed, table_t[s], d) if packed is not None
            else positions[table_t[s]]
        )
        diff = pn_s - positions
        dist = jnp.linalg.norm(diff, axis=-1, keepdims=True) + EPS
        acc = acc + (-k_attr * (dist - L_min)) * (diff / dist)
        if want_refs and s < rc:
            v = jax.lax.slice_in_dim(ref_valid, s * n, (s + 1) * n)
            parts.append(jnp.where(
                v[:, None], (positions + pn_s) * 0.5,
                jnp.asarray(REF_PAD_VALUE, positions.dtype),
            ))
    forces = _apply_table_overflow(
        acc, positions, nb["n"], overflow_edges, overflow_plan,
        k_attr, L_min,
    )
    refs = None
    if want_refs:
        d = positions.shape[1]
        refs = (
            jnp.concatenate(parts, axis=0) if parts
            else jnp.zeros((0, d), positions.dtype)
        )
        if overflow_lt is not None and overflow_lt.shape[0] > 0:
            refs = jnp.concatenate(
                [refs, overflow_midpoints(positions, overflow_lt)], axis=0
            )
    return forces, refs


def build_overflow_plan(overflow):
    """Block-fold plan for the neighbor-table overflow scatter.

    ``overflow`` holds the (vertex, neighbor) pairs of vertices whose
    degree exceeds the table cap — a handful of hub vertices owning long
    contiguous runs (build_neighbor_table emits them sorted by vertex).
    ``segment_sum`` over 1M segments lowers to a per-row scatter loop on
    TPU (~111 ns/row — it dominated the skewed-degree 1M tier at ~190 ms
    per iteration), yet almost every row lands on one of a few hubs.

    The plan pads each hub's run to a multiple of a block size B with
    (hub, hub) self-pairs (exactly zero spring force), so per-block
    partial sums come from a dense ``reshape(-1, B, d).sum(1)`` and only
    the O/B block partials are scattered — onto H hub rows. B is chosen
    per graph to balance padded-row work against scatter rows; when no
    block size beats the plain scatter (tiny or hubless overflow) the
    plan is None and callers keep the legacy segment_sum path.

    Returns None or a dict with:
      'pairs'     : (O', 2) int32 padded directed pairs, hub-contiguous
      'block_hub' : (O'/B,) int32 hub index of each block (sorted)
      'hub_ids'   : (H,) int32 hub vertex ids
      'pad_count' : (H,) float32 — number of (hub, hub) pad rows per hub,
                    for consumers whose pad rows are NOT zero (the spring
                    force of a self-pair is exactly zero, but a gather-sum
                    matvec must subtract pad_count * x_hub — see
                    ops/laplacian.py lap_mm)
      'block'     : int, the block size B
    """
    n_over = len(overflow)
    if n_over == 0:
        return None
    hub_ids, counts = np.unique(overflow[:, 0], return_counts=True)
    legacy_cost = _SCATTER_ROW_COST * n_over
    best = None
    for B in (8, 32, 128, 512):
        padded = (counts + B - 1) // B * B
        cost = int(padded.sum() - n_over) + _SCATTER_ROW_COST * int(
            padded.sum() // B
        )
        if cost < legacy_cost and (best is None or cost < best[0]):
            best = (cost, B, padded)
    if best is None:
        return None
    _, B, padded = best
    total = int(padded.sum())
    pairs = np.repeat(hub_ids, padded).astype(np.int32)
    pairs = np.stack([pairs, pairs], axis=1)
    starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
    row = starts[np.searchsorted(hub_ids, overflow[:, 0])]
    # offset within each hub's padded run preserves the original order
    off = np.arange(n_over) - np.concatenate(
        [[0], np.cumsum(counts)[:-1]]
    )[np.searchsorted(hub_ids, overflow[:, 0])]
    pairs[row + off, 1] = overflow[:, 1]
    block_hub = np.repeat(
        np.arange(len(hub_ids), dtype=np.int32), padded // B
    )
    return {
        "pairs": pairs,
        "block_hub": block_hub,
        "hub_ids": hub_ids.astype(np.int32),
        "pad_count": (padded - counts).astype(np.float32),
        "block": B,
    }


def _overflow_spring(positions, pairs, k_attr, L_min):
    pv = positions[pairs[:, 0]]
    pu = positions[pairs[:, 1]]
    d = pu - pv
    dd = jnp.linalg.norm(d, axis=1, keepdims=True) + EPS
    return (-k_attr * (dd - L_min)) * (d / dd)


def apply_overflow_plan(forces, positions, plan, k_attr, L_min):
    """Accumulate hub overflow spring forces via the block-fold plan.

    ``plan['pairs']``/``plan['block_hub']``/``plan['hub_ids']`` ride as
    jit arguments (graph-shaped); ``plan['block']`` is static.
    """
    fo = _overflow_spring(positions, plan["pairs"], k_attr, L_min)
    blk = fo.reshape(-1, plan["block"], fo.shape[-1]).sum(axis=1)
    hub = jax.ops.segment_sum(
        blk,
        plan["block_hub"],
        num_segments=plan["hub_ids"].shape[0],
        indices_are_sorted=True,
    )
    return forces.at[plan["hub_ids"]].add(hub)


def spring_forces_from_gathered(positions, pn, nb, k_attr, L_min,
                                overflow_edges=None, overflow_plan=None):
    """Spring forces from an already-gathered neighbor-position block.

    ``pn = positions[nb['table']]`` is the step's single large HBM gather;
    passing it in lets the caller reuse it for the kNN midpoint reference
    set (midpoint_refs_from_gathered) instead of paying a second gather.
    """
    diff = pn - positions[:, None, :]           # v -> u
    dist = jnp.linalg.norm(diff, axis=-1, keepdims=True) + EPS
    f = (-k_attr * (dist - L_min)) * (diff / dist)
    forces = f.sum(axis=1)

    if overflow_plan is not None:
        forces = apply_overflow_plan(
            forces, positions, overflow_plan, k_attr, L_min
        )
    elif overflow_edges is not None and overflow_edges.shape[0] > 0:
        fo = _overflow_spring(positions, overflow_edges, k_attr, L_min)
        forces = forces + jax.ops.segment_sum(
            fo, overflow_edges[:, 0], num_segments=nb["n"]
        )
    return forces


def spring_forces_nbtable(positions, nb, k_attr, L_min,
                          overflow_edges=None, overflow_plan=None):
    """Spring forces via the dense neighbor table (gather + row-sum).

    Numerically identical to the scatter formulation: for vertex v,
    F_v = sum_{u in N(v)} -k_attr * (||u - v|| - L_min) * unit(v -> u)
    (each undirected edge is visited once from each side). Overflow pairs
    (degrees beyond the table cap) are accumulated through the block-fold
    plan when one exists (build_overflow_plan), else with segment_sum.
    """
    pn = positions[nb["table"]]                 # (n, D, d)
    return spring_forces_from_gathered(
        positions, pn, nb, k_attr, L_min, overflow_edges, overflow_plan
    )


# Padded / non-edge reference slots are pushed to +BIG so squared distances
# overflow to +inf and the slot can never be selected as a neighbor — the
# same convention _oneshot_approx uses for lane padding (ops/knn.py).
REF_PAD_VALUE = 1e30


# ---- lane-packed position gather (round 5) --------------------------- #
# The per-row HBM gather cost is an ISSUE-RATE wall that ignores index
# structure entirely (random = sorted = all-128-lanes-same-row = 5.9
# ns/row at a 1M-row source; experiments/gather_locality_probe.py) but
# falls steeply with the source ROW COUNT: packing G=8 vertices per
# source row and selecting the wanted vertex on-chip with a one-hot
# reduce (which XLA fuses into the gather consumer) measured 3.3 vs 5.9
# ns/row at 1M and wins again at 10M (experiments/packed_gather_probe.py;
# take_along_axis and (d, m, G) transposed selects both measured far
# slower — the strided one-hot FMA is the right select on this
# toolchain). The reshape from the engine's (n, d) positions is free
# (same linear layout), so the packed view costs nothing to build
# inside the step. This attacks the transaction wall the per-row DMA /
# dynamic_gather / locality probes could not (BASELINE.md r4-r5);
# reference anchor: the scatter/gather hot path this whole table layer
# replaces, embedder_pytorch.py:595-636.
PACKED_GATHER_G = 8


def pack_positions(positions, G=PACKED_GATHER_G):
    """(ceil(n/G), G*d) packed view of positions, zero-padded to G rows.

    Built INSIDE the jitted step (XLA CSEs the identical subexpression
    across the unrolled slot columns, so the pad+reshape is paid once
    per iteration)."""
    n, d = positions.shape
    pad = (-n) % G
    if pad:
        positions = jnp.concatenate(
            [positions, jnp.zeros((pad, d), positions.dtype)], axis=0
        )
    return positions.reshape((n + pad) // G, G * d)


def packed_take(packed, idx, d):
    """out[r] = positions[idx[r]] via the lane-packed source.

    The packing factor is inferred from the packed row width (G * d),
    so callers thread only the array. Exact: the one-hot reduce adds
    1.0 * positions[idx] and 0.0 * the G-1 neighbors in the packed row,
    so values match the plain gather bit for bit (finite positions)."""
    G = packed.shape[1] // d
    R = idx.shape[0]
    rows = packed[idx // G]                        # (R, G*d)
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (R, G), 1)
        == (idx % G)[:, None]
    )
    return (
        rows.reshape(R, G, d) * oh[:, :, None].astype(rows.dtype)
    ).sum(axis=1)


def masked_slot_midpoints(pv, pn, rc, valid):
    """Core of the midpoint reference set, in one place.

    Slot (v, s) holds ``(pv[v] + pn[v, s]) / 2`` over the first ``rc``
    gather columns, flattened to ``(rows * rc, d)``; slots where
    ``valid`` is False (pads, j>i duplicates) push to REF_PAD_VALUE.
    Single definition consumed by midpoint_refs_from_gathered /
    midpoint_refs_binned below AND the sharded step's per-device tiles
    (parallel/sharded_step.py) — keeps the slot formula from drifting
    between the single-chip and sharded builders.
    """
    d = pn.shape[2]
    mid = (pv[:, None, :] + pn[:, :rc]) * 0.5
    return jnp.where(
        valid.reshape(-1)[:, None],
        mid.reshape(-1, d),
        jnp.asarray(REF_PAD_VALUE, pv.dtype),
    )


def overflow_midpoints(positions, overflow_lt, active=None):
    """(O2, d) midpoints of the overflow (i<j) edges.

    ``active``: optional traced bool — the sharded tier appends the
    overflow block once (device 0) and masks it to REF_PAD elsewhere so
    the merged top-k sees each overflow edge exactly once.
    """
    ov_mid = (
        positions[overflow_lt[:, 0]] + positions[overflow_lt[:, 1]]
    ) * 0.5
    if active is not None:
        ov_mid = jnp.where(
            active, ov_mid, jnp.asarray(REF_PAD_VALUE, positions.dtype)
        )
    return ov_mid


def midpoint_refs_from_gathered(positions, pn, nb, overflow_lt=None):
    """Edge-midpoint kNN reference set built from the spring gather.

    The reference engine recomputes midpoints with a second full-edge
    gather, ``(pos[e0]+pos[e1])/2`` (embedder_pytorch.py:785) — at the 100K
    tier that gather alone dominates the iteration (HBM random-row floor,
    BASELINE.md). Here every edge's two endpoint positions already sit in
    ``pn``, so midpoints are pure VPU math: slot (v, s) holds
    ``(pos[v] + pn[v, s]) / 2``, bitwise equal to the direct formula.

    Each edge contributes exactly one reference (its i<j slot, per
    nb['ref_valid']); pad slots and j>i duplicates are pushed to
    REF_PAD_VALUE. Only the first nb['ref_cap'] table columns are scanned
    — neighbor rows store i<j edges first, and build_neighbor_table picks
    the cheapest column prefix, spilling rare deep rows into the overflow
    refs. Overflow edges append their midpoints via a small gather. kNN
    results over these refs translate back to edge ids through
    nb['ref_edge']; queries for sampled edges are looked up through
    nb['edge_ref'].

    Returns (n*ref_cap + O2, d) float refs, aligned with nb['ref_edge'].
    """
    cap = min(nb["ref_cap"], pn.shape[1])
    refs = masked_slot_midpoints(positions, pn, cap, nb["ref_valid"])
    if overflow_lt is not None and overflow_lt.shape[0] > 0:
        refs = jnp.concatenate(
            [refs, overflow_midpoints(positions, overflow_lt)], axis=0
        )
    return refs


def spring_forces(positions, edges, k_attr, L_min, scatter_plan=None):
    """Hookean spring attraction along edges.

    Mirrors reference embedder_pytorch.py:595-636:
      F_edge = -k_attr * (||p2-p1|| - L_min) * unit(p2-p1)
      forces[e0] += F_edge ; forces[e1] -= F_edge

    Parameters
    ----------
    positions : (n, d) float array
    edges : (E, 2) int array
    k_attr, L_min : float spring constants
    scatter_plan : optional dict from build_scatter_plan for the sorted
        segment-sum fast path.
    """
    p1 = positions[edges[:, 0]]
    p2 = positions[edges[:, 1]]
    diff = p2 - p1
    dist = jnp.linalg.norm(diff, axis=1, keepdims=True) + EPS
    force_magnitude = -k_attr * (dist - L_min)
    edge_forces = force_magnitude * (diff / dist)

    values = jnp.concatenate([edge_forces, -edge_forces], axis=0)
    if scatter_plan is not None:
        values = values[scatter_plan["perm"]]
        return jax.ops.segment_sum(
            values,
            scatter_plan["sorted_ids"],
            num_segments=scatter_plan["n"],
            indices_are_sorted=True,
        )
    ids = jnp.concatenate([edges[:, 0], edges[:, 1]], axis=0)
    return jax.ops.segment_sum(values, ids, num_segments=positions.shape[0])


def _repulsion_terms(positions, edges_i, edges_j, weight, k_inter):
    p1 = positions[edges_i[:, 0]]
    p2 = positions[edges_i[:, 1]]
    q1 = positions[edges_j[:, 0]]
    q2 = positions[edges_j[:, 1]]
    inter_mid = (p1 + p2 + q1 + q2) / 4.0

    def repulse(v):
        d = v - inter_mid
        dist = jnp.linalg.norm(d, axis=1, keepdims=True) + EPS
        return weight * (k_inter * d / (dist**2))

    vals = jnp.concatenate([repulse(p1), repulse(p2), repulse(q1), repulse(q2)])
    return vals


def intersection_forces(
    positions, edges, knn_indices, sampled_indices, k_inter,
    pair_weight=None, edge_order=None,
):
    """Inverse-distance repulsion at geometrically intersecting edge pairs.

    Static-shape equivalent of reference embedder_pytorch.py:638-736. The
    reference filters candidate pairs in three data-dependent steps
    (i<j, no shared vertex, segments intersect); we instead fold all three
    predicates into one multiplicative 0/1 weight on the repulsion term, so
    the accumulated per-vertex forces are bitwise the same math on a fixed
    (sample_size * k) candidate set.

    Parameters
    ----------
    positions : (n, d) float
    edges : (E, 2) int
    knn_indices : (S, k) int — kNN edge indices for each sampled edge midpoint
    sampled_indices : (S,) int — indices of sampled edges
    k_inter : float repulsion constant
    pair_weight : optional (S*k,) float — extra multiplicative weight
        (used by the sharded path to mask padded candidates).
    edge_order : optional (E,) int — comparison key for the i<j pair
        dedup. The reference dedups on USER edge indices
        (embedder_pytorch.py:672); an engine whose edge list is
        internally renumbered (the degree-binned table) passes its
        internal->user edge-id map here so the same directed candidate
        survives the filter and trajectories stay oracle-exact.
    """
    n = positions.shape[0]
    S, k = knn_indices.shape
    candidate_i = jnp.repeat(sampled_indices, k)
    candidate_j = knn_indices.reshape(-1)

    if edge_order is not None:
        valid = edge_order[candidate_i] < edge_order[candidate_j]
    else:
        valid = candidate_i < candidate_j
    edges_i = edges[candidate_i]
    edges_j = edges[candidate_j]
    share = (
        (edges_i[:, 0] == edges_j[:, 0])
        | (edges_i[:, 0] == edges_j[:, 1])
        | (edges_i[:, 1] == edges_j[:, 0])
        | (edges_i[:, 1] == edges_j[:, 1])
    )
    p1 = positions[edges_i[:, 0]]
    p2 = positions[edges_i[:, 1]]
    q1 = positions[edges_j[:, 0]]
    q2 = positions[edges_j[:, 1]]
    intersects = segments_intersect_2d(p1, p2, q1, q2)

    weight = (valid & ~share & intersects).astype(positions.dtype)[:, None]
    if pair_weight is not None:
        weight = weight * pair_weight[:, None]

    vals = _repulsion_terms(positions, edges_i, edges_j, weight, float(k_inter))
    ids = jnp.concatenate(
        [edges_i[:, 0], edges_i[:, 1], edges_j[:, 0], edges_j[:, 1]]
    )
    return jax.ops.segment_sum(vals, ids, num_segments=n)
