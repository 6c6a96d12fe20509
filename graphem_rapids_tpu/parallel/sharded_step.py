"""Edge-partitioned layout step under shard_map.

Parallel decomposition (SURVEY.md §2.4 "new first-class components"):

- The COO edge list is padded to a multiple of the mesh size and each
  device owns one contiguous shard. Spring forces use the VERTEX-sharded
  dense neighbor-table gather when a table is provided (each device
  gathers its n/ndev rows — the HBM gather row count, the single-chip
  bottleneck, scales with the mesh — then one tiled all_gather assembles
  the force array); without a table they fall back to a LOCAL segment-sum
  over the edge shard plus one psum of the (n, d) accumulator.
- kNN reference tiles are the device-local edge midpoints; every device
  computes a local top-(k+1) against the (replicated, cheap) sampled query
  midpoints, then an all_gather + exact merge produces the global neighbor
  set. This shards the O(S * E * d) distance pass — the dominant cost —
  across the mesh.
- Intersection repulsion on the merged (S * k) candidate set is O(S * k)
  and computed redundantly on every device (cheaper than communicating
  it), keeping positions bitwise in sync across the mesh.

Vertex positions are replicated: at the 1M x 4 target that is ~16 MB —
far below per-chip HBM — while the sharded terms are the ones that scale
with E. One psum + one all_gather per iteration ride the ICI.
"""


from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.forces import (
    REF_PAD_VALUE,
    apply_overflow_plan,
    intersection_forces,
    masked_slot_midpoints,
    overflow_midpoints,
    pack_positions,
    packed_take,
)
from ..ops.knn import squared_distances
from .mesh import EDGE_AXIS

EPS = 1e-6
P = jax.sharding.PartitionSpec


def pad_edges(edges_np, n_devices):
    """Pad the edge list to a device-divisible length.

    Padded rows are (0, 0) with weight 0: their spring force is identically
    zero and their midpoint is pushed to +LARGE so they can never appear as
    kNN candidates.
    """
    E = len(edges_np)
    E_pad = ((E + n_devices - 1) // n_devices) * n_devices
    edges_p = np.zeros((E_pad, 2), np.int32)
    edges_p[:E] = edges_np
    valid = np.zeros(E_pad, np.float32)
    valid[:E] = 1.0
    return edges_p, valid


def build_sharded_step(mesh, n, E, *, n_components, k_attr, L_min, k_inter,
                       n_neighbors, sample_size, nb=None,
                       knn_recall_target=0.95, use_approx_local=None,
                       use_binfold_local=None, fused_refs=None,
                       knn_comm=None, knn_dtype="auto", packed_gather=None,
                       _debug_knn=False, _debug_spring=False,
                       return_raw=False, axis_name=EDGE_AXIS):
    """Build the jitted multi-chip update step.

    Returns (step, multi_step, step_ops) where
    step(positions, edges_padded, valid, key, step_ops)
    -> (positions, key); edges_padded/valid are REPLICATED host-prepared
    arrays (the int32 edge list is tiny relative to the sharded distance
    work), step_ops is the pytree of graph-shaped operands (padded
    neighbor table etc. — jit arguments, not closure constants), and the
    function internally slices the per-device shard by axis index.

    nb : optional neighbor-table dict — either the flat
        ops.forces.build_neighbor_table structure or the degree-binned
        build_neighbor_table_binned one (detected by its 'buckets' key).
        When given, spring forces use the VERTEX-sharded dense-table gather
        (each device gathers only its n/ndev table rows, then one tiled
        all_gather assembles the (n, d) force array) — the per-chip HBM
        gather row count, the single-chip bottleneck (docs/ROADMAP.md),
        scales down with the mesh, and the wire cost drops from a full
        (n, d) psum to an (n/ndev, d) all_gather. With the BINNED dict,
        each bucket's table is row-padded to a device-divisible count and
        every device owns 1/ndev of every bucket's rows (identical shapes
        per device — SPMD-uniform) so the per-device gather row count
        keeps the binning win; edge ids then live in the binned engine's
        internal numbering (pass its edges_int + edge_user ordering).
        Without nb, falls back to the edge-sharded segment-sum + psum
        formulation.
    fused_refs : None/bool. When active, the kNN reference set is the slot
        midpoints derived from the SAME vertex-sharded table gather the
        spring pass already paid for (the multi-chip analog of the
        single-chip fused path, ops/forces.py midpoint_refs_from_gathered)
        — removing the per-device 2*E/ndev edge-endpoint midpoint gather.
        Each device owns the ref slots of its n/ndev vertices; overflow
        (i<j beyond ref_cap) midpoints are appended on device 0 only and
        masked to REF_PAD elsewhere so every edge appears exactly once in
        the merged candidate pool. None = auto: on for TPU meshes while
        the padded slot count stays <= 4E (same bound as single-chip);
        CPU (test) meshes keep the unfused exact path so the 1-vs-N
        allclose gates stay tie-for-tie comparable.
    knn_comm : None | 'all_gather' | 'all_to_all' | 'ring' |
        'ring_pallas'. How per-device kNN candidates
        are merged into the global neighbor set. 'all_gather' (default)
        gathers every device's top-kk candidates and re-merges; 'ring'
        rotates query shards + running top-k carries around the mesh via
        lax.ppermute (ring-attention analog — SURVEY §2.4/§5.8) so only
        S*(d + 3k)/ndev elements ride the wire per hop instead of two
        (ndev, S, kk) gathers at the end. Results match all_gather exactly
        on tie-free distances (ties: lexicographic-by-ref-index instead of
        device order). 'all_to_all' transposes candidate blocks
        device<->query-shard so each device merges only its S/ndev
        queries — (ndev-1)/ndev * S*kk on the wire instead of
        (ndev-1) * S*kk received, bitwise-equal results.
        'ring_pallas' is the RDMA kernel variant
        (parallel/ring_binfold.py): per-bin minima carries rotated via
        pltpu.make_async_remote_copy with the transport fully overlapped
        behind each hop's distance fold — approximate with the binfold
        recall model over the global reference set (quality-gated in
        tests/test_sharded.py).
    """
    if knn_comm is None:
        knn_comm = "all_gather"
    if knn_comm not in ("all_gather", "all_to_all", "ring",
                        "ring_pallas"):
        raise ValueError(f"Unknown knn_comm: {knn_comm!r}")
    n_devices = int(np.prod(list(mesh.shape.values())))
    E_pad_total = ((E + n_devices - 1) // n_devices) * n_devices
    E_loc = E_pad_total // n_devices
    S = min(sample_size, E)
    k = n_neighbors
    # On TPU meshes the local distance tile runs in bf16, mirroring the
    # single-chip approx tier (the (S, E_loc) distance traffic dominates;
    # no measurable layout-quality change — BASELINE.md). CPU meshes (the
    # virtual test mesh) stay f32, keeping the 1-vs-N allclose gates
    # exact. knn_dtype='auto' applies that policy; pass a dtype (or None
    # for f32) to force a shape — the bf16 quality gates in
    # tests/test_sharded.py pin the TPU-mesh program on the CPU mesh.
    if knn_dtype == "auto":
        knn_dtype = (
            jnp.bfloat16
            if mesh.devices.flat[0].platform == "tpu" else None
        )
    # approx_min_k local top-k only pays off on real TPU tiles with a
    # meaningful reference count; CPU (test) meshes keep the exact path
    # so the 1-vs-N allclose gates stay exact. use_approx_local=None
    # auto-selects; pass a bool to override (perf A/Bs).
    if use_approx_local is None:
        use_approx_local = (
            knn_dtype is not None and (E // n_devices) >= 1024
        )
    recall_target = float(knn_recall_target)
    # binfold local top-k: the fused Pallas distance+bin-min kernel (the
    # single-chip fast tier, ops/knn_binfold.py) computes each device's
    # local candidates without materializing the (S, E_loc) distance
    # buffer — measured faster than the approx_min_k one-shot it
    # replaces. Auto: TPU meshes with a meaningful per-device tile,
    # gated by the same compile probe the single-chip engine uses.
    kk_probe = min(n_neighbors + 1, max(E // n_devices, 1))
    if use_binfold_local is None:
        use_binfold_local = False
        if use_approx_local and (E // n_devices) >= 4096:
            from ..ops import knn_binfold as _bf

            use_binfold_local = (
                kk_probe <= 128
                and _bf.probe(n_components, min(sample_size, E), kk_probe,
                              recall_target)
            )
    if use_binfold_local:
        use_approx_local = True  # same lane-padding + merge plumbing

    # Graph-shaped arrays ride as jit ARGUMENTS via the step_ops pytree,
    # not closure constants — closed-over tables embed tens of MB of
    # literals in the jaxpr and trace+lower then costs minutes per
    # process (measured single-chip, models/embedder.py _build_step).
    step_ops = {}
    binned = nb is not None and "buckets" in nb
    # slot-major ref layout (ops/forces.py ref_order='slot'): tables ride
    # TRANSPOSED ((cap, count) per bucket / (D, n) flat) and the body
    # walks them one slot row at a time — per-slot (loc,)-row gathers +
    # sequential fold, the layout the single-chip engine defaults to on
    # TPU since round 4 (1.26-1.41x per step, BASELINE.md round-4 A/B).
    # The local and global ref enumerations become slot-major (per
    # bucket: s*loc + p locally, roff + s*pad + dev*loc + p globally).
    slot_order = nb is not None and nb.get("ref_order") == "slot"
    # Lane-packed per-slot gathers, same window as the single-chip
    # engine (models/embedder.py PACKED_GATHER_MIN_N/MAX_N note): the
    # slot gathers read the REPLICATED positions on every device, so the
    # packed-source win carries over unchanged; without this the r5
    # single-chip 1.7x@1M would reopen the 1-device sharded gap the
    # round-4 slot port closed (BASELINE.md).
    from ..models.embedder import (
        PACKED_GATHER_MAX_N,
        PACKED_GATHER_MIN_N,
        _packed_gather_g,
    )

    if packed_gather is None:
        use_packed = (
            slot_order
            and mesh.devices.flat[0].platform == "tpu"
            and PACKED_GATHER_MIN_N <= n < PACKED_GATHER_MAX_N
        )
    else:
        use_packed = bool(packed_gather) and slot_order
    packed_g = _packed_gather_g(n)
    if binned:
        # ---- degree-binned tables, bucket-row-sharded (opt-in) ------- #
        # Each bucket's (count_g, cap_g) table is row-padded to a
        # device-divisible count and every device owns 1/ndev of EVERY
        # bucket's rows — identical shapes on all devices (SPMD-uniform),
        # while the per-device gather row count keeps the binning win
        # (sum count_g*cap_g / ndev instead of n*C_flat / ndev). The
        # internal vertex/edge numbering is the single-chip binned
        # engine's own, so 1-vs-N trajectories stay exactly comparable.
        geoms = []
        for b in nb["buckets"]:
            cnt, cap = int(b["count"]), int(b["cap"])
            rc = min(int(b["ref_cap"]), cap)
            loc = (cnt + n_devices - 1) // n_devices
            geoms.append({
                "start": int(b["start"]), "count": cnt, "cap": cap,
                "rc": rc, "loc": loc, "pad": loc * n_devices,
            })
        btables, bowns = [], []
        for gm, b in zip(geoms, nb["buckets"]):
            if slot_order:
                t = np.asarray(b["table_t"])  # (cap, count)
                if gm["pad"] != gm["count"]:
                    t = np.concatenate([
                        t, np.full((gm["cap"], gm["pad"] - gm["count"]),
                                   gm["start"], np.int32)
                    ], axis=1)
            else:
                t = np.asarray(b["table"])
                if gm["pad"] != gm["count"]:
                    t = np.concatenate([
                        t, np.full((gm["pad"] - gm["count"], gm["cap"]),
                                   gm["start"], np.int32)
                    ])
            btables.append(jnp.asarray(t))
            # pv rows are CONTIGUOUS (internal ids are degree-sorted, so
            # each device's bucket shard is a row range): the body uses
            # slices, which cost nothing vs the n gathered rows/iteration
            # the old positions[own] indirection paid (~9 ns/row — it was
            # most of the r3 sharded-vs-single gap at 1M/10M). An index
            # array is kept ONLY for a bucket whose padded range would
            # overrun n (a traced dynamic_slice would clamp and misalign
            # the real rows).
            if n_devices > 1 and gm["start"] + gm["pad"] > n:
                own = np.full(gm["pad"], gm["start"], np.int32)
                own[:gm["count"]] = np.arange(
                    gm["start"], gm["start"] + gm["count"], dtype=np.int32
                )
                bowns.append(jnp.asarray(own))
            else:
                bowns.append(None)
        step_ops["btables"] = btables
        step_ops["bowns"] = bowns
        ov_plan = nb.get("overflow_plan")
        if ov_plan is not None:
            step_ops["ov_plan"] = {
                "pairs": jnp.asarray(ov_plan["pairs"]),
                "block_hub": jnp.asarray(ov_plan["block_hub"]),
                "hub_ids": jnp.asarray(ov_plan["hub_ids"]),
            }
        elif len(nb["overflow"]):
            step_ops["nb_overflow"] = jnp.asarray(nb["overflow"])
        step_ops["edge_order"] = jnp.asarray(nb["edge_user"], jnp.int32)

        O2 = int(len(nb["overflow_lt"]))
        n_ref_slots = int(nb["ref_edge"].shape[0])
        if fused_refs is None:
            fused_refs = (
                mesh.devices.flat[0].platform == "tpu"
                and E > 0
                and n_ref_slots <= 4 * E
            )
        if fused_refs:
            # per-device local ref-tile layout: bucket segments of
            # loc_g*rc_g slots (rc_g>0 buckets only), then the shared
            # overflow block; the global PADDED ref space mirrors it with
            # pad_g*rc_g per bucket
            ref_edge_all = np.asarray(nb["ref_edge"])
            ref_valid_all = np.asarray(nb["ref_valid"])
            bref_valid, re_parts = [], []
            seg_meta = []  # (seg_off_local, seg_len_local, roff_global)
            seg_off = 0
            roff = 0
            ref_off = 0  # cursor into the UNPADDED global ref space
            for gm in geoms:
                rc, cnt, loc = gm["rc"], gm["count"], gm["loc"]
                if rc == 0:
                    continue
                if slot_order:
                    # slot-major enumeration (s*cnt + p per bucket):
                    # reshape to (rc, cnt), pad COLUMNS; global padded
                    # slot index = roff + s*pad + row
                    rv = ref_valid_all[ref_off:ref_off + cnt * rc].reshape(
                        rc, cnt
                    )
                    re = ref_edge_all[ref_off:ref_off + cnt * rc].reshape(
                        rc, cnt
                    )
                    if gm["pad"] != cnt:
                        z = gm["pad"] - cnt
                        rv = np.concatenate(
                            [rv, np.zeros((rc, z), bool)], axis=1
                        )
                        re = np.concatenate(
                            [re, np.zeros((rc, z), np.int32)], axis=1
                        )
                else:
                    rv = ref_valid_all[ref_off:ref_off + cnt * rc].reshape(
                        cnt, rc
                    )
                    re = ref_edge_all[ref_off:ref_off + cnt * rc].reshape(
                        cnt, rc
                    )
                    if gm["pad"] != cnt:
                        z = gm["pad"] - cnt
                        rv = np.concatenate([rv, np.zeros((z, rc), bool)])
                        re = np.concatenate(
                            [re, np.zeros((z, rc), np.int32)]
                        )
                bref_valid.append(jnp.asarray(rv))
                re_parts.append(re.reshape(-1))
                seg_meta.append(
                    (seg_off, loc * rc, roff, loc, gm["pad"])
                )
                seg_off += loc * rc
                roff += gm["pad"] * rc
                ref_off += cnt * rc
            SL = seg_off          # per-device slot-ref count (static)
            G_total = roff        # padded global ref-space size
            if SL == 0:
                fused_refs = False  # no i<j ref slots at all
            else:
                # only populate the fused-ref operands when the path is
                # actually taken: _fused_refs_active keys off
                # 'bref_valid' in step_ops, and dead operands would ride
                # the jit pytree (ADVICE r1)
                step_ops["bref_valid"] = bref_valid
                re_pad = np.concatenate(
                    re_parts + [ref_edge_all[ref_off:]]
                ) if re_parts else ref_edge_all[ref_off:]
                step_ops["ref_edge_pad"] = jnp.asarray(re_pad)
                if O2:
                    step_ops["overflow_lt"] = jnp.asarray(nb["overflow_lt"])
    elif nb is not None:
        n_loc = (n + n_devices - 1) // n_devices
        n_pad = n_loc * n_devices
        if slot_order:
            table_t = np.asarray(nb["table_t"])  # (D, n)
            D_tbl = table_t.shape[0]
            # pad COLUMNS (vertices >= n): index 0 keeps them in bounds;
            # the [:n] slice after the all_gather drops their output
            step_ops["table_t_pad"] = jnp.asarray(np.concatenate(
                [table_t, np.zeros((D_tbl, n_pad - n), np.int32)], axis=1
            )) if n_pad != n else jnp.asarray(table_t)
        else:
            table = nb["table"]
            D_tbl = table.shape[1]
            # pad rows (vertices >= n) gather garbage that the final [:n]
            # slice discards; index 0 keeps them in bounds
            step_ops["table_pad"] = jnp.concatenate(
                [jnp.asarray(table),
                 jnp.zeros((n_pad - n, D_tbl), jnp.int32)]
            ) if n_pad != n else jnp.asarray(table)
        # pv rows are contiguous — the body slices positions directly; an
        # index array is kept only when the padded range overruns n (see
        # the binned-branch note)
        step_ops["own_pad"] = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32),
             jnp.zeros(n_pad - n, jnp.int32)]
        ) if (n_devices > 1 and n_pad != n) else None
        ov_plan = nb.get("overflow_plan")
        if ov_plan is not None:
            # block-fold plan (ops/forces.py build_overflow_plan): same
            # formulation as the single-chip step, so 1-vs-N trajectories
            # stay bitwise-comparable; plan arrays are jit arguments,
            # the block size is static
            step_ops["ov_plan"] = {
                "pairs": jnp.asarray(ov_plan["pairs"]),
                "block_hub": jnp.asarray(ov_plan["block_hub"]),
                "hub_ids": jnp.asarray(ov_plan["hub_ids"]),
            }
        elif len(nb["overflow"]):
            step_ops["nb_overflow"] = jnp.asarray(nb["overflow"])

        # ---- fused kNN refs from the sharded table gather ------------ #
        ref_cap = min(int(nb["ref_cap"]), D_tbl)
        O2 = int(len(nb["overflow_lt"]))
        n_ref_slots = int(nb["ref_edge"].shape[0])
        if fused_refs is None:
            fused_refs = (
                mesh.devices.flat[0].platform == "tpu"
                and E > 0
                and n_ref_slots <= 4 * E
            )
        if fused_refs:
            SL = n_loc * ref_cap  # per-device slot-ref count (static)
            if slot_order:
                # slot-major flat enumeration (s*n + v): reshape to
                # (ref_cap, n), pad COLUMNS; global padded slot index =
                # s*n_pad + v
                rv = np.asarray(
                    nb["ref_valid"][:n * ref_cap]
                ).reshape(ref_cap, n)
                re_slots = np.asarray(
                    nb["ref_edge"][:n * ref_cap]
                ).reshape(ref_cap, n)
                if n_pad != n:
                    rv = np.concatenate(
                        [rv, np.zeros((ref_cap, n_pad - n), bool)], axis=1
                    )
                    re_slots = np.concatenate(
                        [re_slots,
                         np.zeros((ref_cap, n_pad - n), np.int32)], axis=1
                    )
            else:
                rv = np.asarray(nb["ref_valid"]).reshape(n, ref_cap)
                re_slots = np.asarray(
                    nb["ref_edge"][:n * ref_cap]
                ).reshape(n, ref_cap)
                if n_pad != n:
                    rv = np.concatenate(
                        [rv, np.zeros((n_pad - n, ref_cap), bool)]
                    )
                    re_slots = np.concatenate(
                        [re_slots,
                         np.zeros((n_pad - n, ref_cap), np.int32)]
                    )
            step_ops["ref_valid_pad"] = jnp.asarray(rv)
            # padded slot->edge map: vertex-pad slots map to edge 0 (they
            # sit at REF_PAD distance, never selected on non-degenerate
            # graphs); overflow refs live at [n_pad*ref_cap, +O2)
            re_pad = np.concatenate(
                [re_slots.reshape(-1),
                 np.asarray(nb["ref_edge"][n * ref_cap:])]
            )
            step_ops["ref_edge_pad"] = jnp.asarray(re_pad)
            if O2:
                step_ops["overflow_lt"] = jnp.asarray(nb["overflow_lt"])
    else:
        fused_refs = False

    if knn_comm == "ring_pallas":
        # Build-time geometry probe: ring_binfold's _geometry raises on
        # carry-VMEM / fp32-index-lane overflow. Probe it here with the
        # resolved per-device ref-tile row count and tier down to the lax
        # ring (bit-exact vs all_gather) instead of surfacing the
        # ValueError at trace time — the tiered-fallback pattern the
        # engine uses everywhere else (SURVEY §5.3).
        from .ring_binfold import ring_supported

        R_probe = (SL + O2) if fused_refs else E_loc
        k_merge_probe = min(k + 1, n_devices * min(k + 1, max(R_probe, 1)))
        if not ring_supported(R_probe, S, n_devices, k_merge_probe,
                              recall_target):
            import logging

            logging.getLogger(__name__).warning(
                "knn_comm='ring_pallas' geometry unsupported "
                "(refs/device=%d, S=%d, ndev=%d, k=%d); tiering down to "
                "knn_comm='ring'", R_probe, S, n_devices, k_merge_probe,
            )
            knn_comm = "ring"

    def shard_slice(x, i, loc, axis0_extra=()):
        """This device's row shard of a replicated array.

        On a 1-device mesh the shard IS the array: skip the
        dynamic_slice — a traced-start slice is a real copy plus a
        fusion barrier, and at the 10M tier the copied tables alone are
        hundreds of MB per step (measured in the r3 1-device A/B).
        """
        if n_devices == 1:
            return x
        start = (i * loc,) + (0,) * len(axis0_extra)
        return jax.lax.dynamic_slice(x, start, (loc,) + tuple(axis0_extra))

    def shard_slice_cols(x, i, loc):
        """Column shard of a 2D array — the slot-major tables/ref-valid
        ride transposed ((cap, pad) / (rc, pad)), so the device axis is
        axis 1."""
        if n_devices == 1:
            return x
        return jax.lax.dynamic_slice(
            x, (0, i * loc), (x.shape[0], loc)
        )

    def sharded_body(positions, edges_full, valid_full, key, ops,
                     inject_sample=False):
        i = jax.lax.axis_index(axis_name)
        # lane-packed gather source (XLA CSEs the pad+reshape across the
        # unrolled slot columns; see use_packed above)
        pos_packed = (
            pack_positions(positions, packed_g) if use_packed else None
        )

        # ---- local edge shard --------------------------------------- #
        edges_loc = shard_slice(edges_full, i, E_loc, (2,))
        valid_loc = shard_slice(valid_full, i, E_loc)

        if not fused_refs:
            # the fused path derives every midpoint from the table gather;
            # only the unfused tiers pay the 2*E_loc endpoint gather
            p1 = positions[edges_loc[:, 0]]
            p2 = positions[edges_loc[:, 1]]

        mids_slot = []  # fused-ref midpoint blocks (slot-order branches)
        if binned and slot_order:
            # ---- spring: slot-major bucket tables, per-slot gathers -- #
            # The single-chip slotwise formulation (ops/forces.py
            # spring_refs_binned_slotwise) on each device's column shard:
            # one (loc_g,)-row gather per table slot, sequential fold,
            # midpoint blocks for the fused ref tile emitted in the same
            # pass. Bucket-COLUMN sharding of the transposed tables owns
            # the same vertices as the row-major scheme, so pv slices and
            # the all_gather assembly are unchanged.
            blocks = []
            bidx = 0
            for g, gm in enumerate(geoms):
                if gm["cap"] == 0:
                    blocks.append(jnp.zeros(
                        (gm["count"], positions.shape[1]), positions.dtype
                    ))
                    continue
                tt_loc = shard_slice_cols(ops["btables"][g], i, gm["loc"])
                if n_devices == 1:
                    pvg = jax.lax.slice_in_dim(
                        positions, gm["start"], gm["start"] + gm["count"]
                    )
                elif ops["bowns"][g] is None:
                    pvg = jax.lax.dynamic_slice(
                        positions,
                        (gm["start"] + i * gm["loc"], 0),
                        (gm["loc"], positions.shape[1]),
                    )
                else:
                    owng = shard_slice(ops["bowns"][g], i, gm["loc"])
                    pvg = positions[owng]
                rvg = None
                if fused_refs and gm["rc"] > 0:
                    rvg = shard_slice_cols(
                        ops["bref_valid"][bidx], i, gm["loc"]
                    )
                acc = jnp.zeros_like(pvg)
                for s in range(gm["cap"]):
                    pn_s = (
                        packed_take(pos_packed, tt_loc[s],
                                    positions.shape[1])
                        if pos_packed is not None
                        else positions[tt_loc[s]]
                    )
                    dvs = pn_s - pvg
                    dds = jnp.linalg.norm(dvs, axis=-1, keepdims=True) + EPS
                    acc = acc + (-k_attr * (dds - L_min)) * (dvs / dds)
                    if rvg is not None and s < gm["rc"]:
                        mids_slot.append(jnp.where(
                            rvg[s][:, None], (pvg + pn_s) * 0.5,
                            jnp.asarray(REF_PAD_VALUE, positions.dtype),
                        ))
                if fused_refs and gm["rc"] > 0:
                    bidx += 1
                blocks.append(jax.lax.all_gather(
                    acc, axis_name, tiled=True
                )[:gm["count"]])
            spring = jnp.concatenate(blocks, axis=0)  # (n, d)
            if "ov_plan" in step_ops:
                spring = apply_overflow_plan(
                    spring, positions,
                    {**ops["ov_plan"], "block": ov_plan["block"]},
                    k_attr, L_min,
                )
            elif "nb_overflow" in step_ops:
                nb_overflow = ops["nb_overflow"]
                pvo = positions[nb_overflow[:, 0]]
                puo = positions[nb_overflow[:, 1]]
                do = puo - pvo
                ddo = jnp.linalg.norm(do, axis=1, keepdims=True) + EPS
                fo = (-k_attr * (ddo - L_min)) * (do / ddo)
                spring = spring + jax.ops.segment_sum(
                    fo, nb_overflow[:, 0], num_segments=n
                )
        elif binned:
            # ---- spring: bucket-row-sharded gathers + all_gathers ---- #
            # static unroll over <=8 buckets; identical shapes on every
            # device. pv/pn per bucket are reused by the fused refs below.
            blocks, bpv, bpn = [], [], []
            for g, gm in enumerate(geoms):
                tblg = shard_slice(
                    ops["btables"][g], i, gm["loc"], (gm["cap"],)
                )
                png = positions[tblg]                 # (loc_g, cap_g, d)
                if n_devices == 1:
                    # exact single-chip form: a free (fusable) slice
                    pvg = jax.lax.slice_in_dim(
                        positions, gm["start"], gm["start"] + gm["count"]
                    )
                elif ops["bowns"][g] is None:
                    # contiguous row range, no overrun past n possible:
                    # a bandwidth-bound DMA instead of loc_g gathered
                    # rows (overrun into the NEXT bucket's rows is fine —
                    # those land past count_g in the all_gather output
                    # and the [:count] slice drops them)
                    pvg = jax.lax.dynamic_slice(
                        positions,
                        (gm["start"] + i * gm["loc"], 0),
                        (gm["loc"], positions.shape[1]),
                    )
                else:
                    owng = shard_slice(ops["bowns"][g], i, gm["loc"])
                    pvg = positions[owng]
                bpv.append(pvg)
                bpn.append(png)
                if gm["cap"] == 0:
                    # isolated vertices: zero spring force, no collective
                    blocks.append(jnp.zeros(
                        (gm["count"], positions.shape[1]), positions.dtype
                    ))
                    continue
                dvg = png - pvg[:, None, :]
                ddg = jnp.linalg.norm(dvg, axis=-1, keepdims=True) + EPS
                fvg = (-k_attr * (ddg - L_min)) * (dvg / ddg)
                blocks.append(jax.lax.all_gather(
                    fvg.sum(axis=1), axis_name, tiled=True
                )[:gm["count"]])
            spring = jnp.concatenate(blocks, axis=0)  # (n, d)
            if "ov_plan" in step_ops:
                spring = apply_overflow_plan(
                    spring, positions,
                    {**ops["ov_plan"], "block": ov_plan["block"]},
                    k_attr, L_min,
                )
            elif "nb_overflow" in step_ops:
                nb_overflow = ops["nb_overflow"]
                pvo = positions[nb_overflow[:, 0]]
                puo = positions[nb_overflow[:, 1]]
                do = puo - pvo
                ddo = jnp.linalg.norm(do, axis=1, keepdims=True) + EPS
                fo = (-k_attr * (ddo - L_min)) * (do / ddo)
                spring = spring + jax.ops.segment_sum(
                    fo, nb_overflow[:, 0], num_segments=n
                )
        elif nb is not None and slot_order:
            # ---- spring: slot-major flat table, per-slot gathers ----- #
            tt_loc = shard_slice_cols(ops["table_t_pad"], i, n_loc)
            if n_devices == 1:
                pv = positions                        # n_loc == n
            elif ops["own_pad"] is None:
                pv = jax.lax.dynamic_slice(
                    positions, (i * n_loc, 0),
                    (n_loc, positions.shape[1]),
                )
            else:
                pv = positions[shard_slice(ops["own_pad"], i, n_loc)]
            rv_loc = None
            if fused_refs:
                rv_loc = shard_slice_cols(
                    ops["ref_valid_pad"], i, n_loc
                )
            acc = jnp.zeros_like(pv)
            for s in range(D_tbl):
                pn_s = (
                    packed_take(pos_packed, tt_loc[s], positions.shape[1])
                    if pos_packed is not None
                    else positions[tt_loc[s]]
                )
                dvs = pn_s - pv
                dds = jnp.linalg.norm(dvs, axis=-1, keepdims=True) + EPS
                acc = acc + (-k_attr * (dds - L_min)) * (dvs / dds)
                if rv_loc is not None and s < ref_cap:
                    mids_slot.append(jnp.where(
                        rv_loc[s][:, None], (pv + pn_s) * 0.5,
                        jnp.asarray(REF_PAD_VALUE, positions.dtype),
                    ))
            spring = jax.lax.all_gather(
                acc, axis_name, tiled=True
            )[:n]
            if "ov_plan" in step_ops:
                spring = apply_overflow_plan(
                    spring, positions,
                    {**ops["ov_plan"], "block": ov_plan["block"]},
                    k_attr, L_min,
                )
            elif "nb_overflow" in step_ops:
                nb_overflow = ops["nb_overflow"]
                pvo = positions[nb_overflow[:, 0]]
                puo = positions[nb_overflow[:, 1]]
                do = puo - pvo
                ddo = jnp.linalg.norm(do, axis=1, keepdims=True) + EPS
                fo = (-k_attr * (ddo - L_min)) * (do / ddo)
                spring = spring + jax.ops.segment_sum(
                    fo, nb_overflow[:, 0], num_segments=n
                )
        elif nb is not None:
            # ---- spring: vertex-sharded table gather + all_gather ---- #
            tbl = shard_slice(ops["table_pad"], i, n_loc, (D_tbl,))
            pn = positions[tbl]                       # (n_loc, D, d)
            if n_devices == 1:
                pv = positions                        # n_loc == n
            elif ops["own_pad"] is None:
                pv = jax.lax.dynamic_slice(
                    positions, (i * n_loc, 0),
                    (n_loc, positions.shape[1]),
                )
            else:
                pv = positions[shard_slice(ops["own_pad"], i, n_loc)]
            dv = pn - pv[:, None, :]
            dd = jnp.linalg.norm(dv, axis=-1, keepdims=True) + EPS
            fv = (-k_attr * (dd - L_min)) * (dv / dd)
            spring_loc = fv.sum(axis=1)               # (n_loc, d)
            spring = jax.lax.all_gather(
                spring_loc, axis_name, tiled=True
            )[:n]
            if "ov_plan" in step_ops:
                # replicated on every device (no collective needed)
                spring = apply_overflow_plan(
                    spring, positions,
                    {**ops["ov_plan"], "block": ov_plan["block"]},
                    k_attr, L_min,
                )
            elif "nb_overflow" in step_ops:
                # tiny, replicated on every device (no collective needed)
                nb_overflow = ops["nb_overflow"]
                pvo = positions[nb_overflow[:, 0]]
                puo = positions[nb_overflow[:, 1]]
                do = puo - pvo
                ddo = jnp.linalg.norm(do, axis=1, keepdims=True) + EPS
                fo = (-k_attr * (ddo - L_min)) * (do / ddo)
                spring = spring + jax.ops.segment_sum(
                    fo, nb_overflow[:, 0], num_segments=n
                )
        else:
            # ---- spring: edge-sharded segment-sum + psum ------------- #
            diff = p2 - p1
            dist = jnp.linalg.norm(diff, axis=1, keepdims=True) + EPS
            f = (-k_attr * (dist - L_min)) * (diff / dist)
            f = f * valid_loc[:, None]
            vals = jnp.concatenate([f, -f], axis=0)
            ids = jnp.concatenate([edges_loc[:, 0], edges_loc[:, 1]])
            spring_partial = jax.ops.segment_sum(vals, ids, num_segments=n)
            spring = jax.lax.psum(spring_partial, axis_name)

        if _debug_spring:
            # timing hook (experiments/probe_sharded_gap2_1m.py): stop
            # after the spring section, normalized so a chained timing
            # loop's carry stays finite
            s0 = spring - jnp.mean(spring, axis=0, keepdims=True)
            return s0 / (jnp.std(s0, axis=0, keepdims=True, ddof=1) + EPS)

        # ---- sampled query midpoints (identical on all devices) ------ #
        from ..ops.sampling import sample_indices

        # inject_sample: `key` carries a replicated (S,) int32 sample
        # instead of a PRNG key — the layer-by-layer parity hook (the
        # sharded analog of the single-chip engine's _raw_step)
        sampled = key if inject_sample else sample_indices(key, E, S)
        q_edges = edges_full[sampled]
        q_mid = (positions[q_edges[:, 0]] + positions[q_edges[:, 1]]) / 2.0

        # ---- sharded kNN: local top-(k+1), all_gather, exact merge --- #
        if fused_refs and slot_order:
            # slot-major fused refs: the midpoint blocks were emitted by
            # the spring pass above in local slot-major enumeration
            # (bucket-major, then s*loc + p); overflow block on device 0
            # only, exactly as the row-major branches.
            mid_loc = jnp.concatenate(mids_slot, axis=0)  # (SL, d)
            if O2:
                mid_loc = jnp.concatenate([
                    mid_loc,
                    overflow_midpoints(
                        positions, ops["overflow_lt"], active=(i == 0)
                    ),
                ], axis=0)
            R_loc = SL + O2
        elif fused_refs and binned:
            # binned fused refs: per-bucket slot midpoints from the spring
            # gathers above (same layout as ops/forces.py
            # midpoint_refs_binned, row-sharded); pads/j>i masked to
            # REF_PAD, overflow block on device 0 only.
            mids = []
            for _seg, (g, gm) in zip(
                seg_meta,
                [(g, gm) for g, gm in enumerate(geoms) if gm["rc"] > 0],
            ):
                rvg = shard_slice(
                    ops["bref_valid"][len(mids)], i, gm["loc"],
                    (gm["rc"],),
                )
                mids.append(masked_slot_midpoints(
                    bpv[g], bpn[g], gm["rc"], rvg
                ))
            mid_loc = jnp.concatenate(mids, axis=0)   # (SL, d)
            if O2:
                mid_loc = jnp.concatenate([
                    mid_loc,
                    overflow_midpoints(
                        positions, ops["overflow_lt"], active=(i == 0)
                    ),
                ], axis=0)
            R_loc = SL + O2
        elif fused_refs:
            # reference tile = this device's table-slot midpoints, pure
            # VPU math over the spring gather (pn/pv) — no extra HBM rows.
            # Invalid slots (pads, j>i duplicates) push to REF_PAD; the
            # overflow refs appear once (device 0), masked elsewhere.
            # Slot formula shared with the single-chip builder via
            # ops/forces.py masked_slot_midpoints / overflow_midpoints.
            rv_loc = shard_slice(ops["ref_valid_pad"], i, n_loc,
                                 (ref_cap,))
            mid_loc = masked_slot_midpoints(pv, pn, ref_cap, rv_loc)
            if O2:
                mid_loc = jnp.concatenate([
                    mid_loc,
                    overflow_midpoints(
                        positions, ops["overflow_lt"], active=(i == 0)
                    ),
                ], axis=0)
            R_loc = SL + O2
        else:
            mid_loc = (p1 + p2) / 2.0
            mid_loc = jnp.where(valid_loc[:, None] > 0, mid_loc, 1e30)
            R_loc = E_loc
        kk = min(k + 1, R_loc)
        if use_approx_local and not use_binfold_local:
            # TPU meshes: the reference count must be lane-padded for
            # approx_min_k (ragged E measured ~500x slower, BASELINE.md).
            # Pad rows sit at 1e30 so they are never selected. The
            # binfold kernel pads/transposes its own input
            # (ops/knn_binfold.py _binfold_padded) — pre-padding there
            # would just materialize an extra full copy of the ref set.
            R_lane = -(-R_loc // 128) * 128
            if R_lane != R_loc:
                mid_loc = jnp.concatenate([
                    mid_loc,
                    jnp.full(
                        (R_lane - R_loc, mid_loc.shape[1]), 1e30,
                        mid_loc.dtype,
                    ),
                ])

        def tile_topk(queries):
            """Local top-kk of `queries` against THIS device's ref tile."""
            if use_binfold_local:
                # fused Pallas distance + bin-min kernel (the single-chip
                # fast tier) — no (S, E_loc) distance buffer at all;
                # distances stay f32 in-kernel (bf16 measured slower,
                # ops/knn_binfold.py)
                from ..ops.knn_binfold import knn_binfold

                idx_t, vals_t = knn_binfold(
                    queries.astype(jnp.float32), mid_loc, kk,
                    recall_target=recall_target,
                )
                idx_t = jnp.minimum(idx_t, R_loc - 1)
            elif use_approx_local:
                # local top-k via approx_min_k (PartialReduce) — the same
                # tier the single-chip approx path uses; clamp guards the
                # tiny-shard corner.
                dt_ = knn_dtype if knn_dtype is not None else queries.dtype
                d2 = squared_distances(
                    queries.astype(dt_), mid_loc.astype(dt_)
                )
                vals_t, idx_t = jax.lax.approx_min_k(
                    d2, kk, recall_target=recall_target
                )
                idx_t = jnp.minimum(idx_t, R_loc - 1)
            else:
                if knn_dtype is not None:
                    # bf16 stays through the local top-k AND the merge
                    # (halves distance traffic and candidate wire)
                    d2 = squared_distances(
                        queries.astype(knn_dtype), mid_loc.astype(knn_dtype)
                    )
                else:
                    d2 = squared_distances(queries, mid_loc)  # (S?, R_loc)
                neg, idx_t = jax.lax.top_k(-d2, kk)
                vals_t = -neg
            return vals_t, idx_t.astype(jnp.int32)

        def to_global(idx_t, dev):
            """Map tile-local ref indices to the global ref space of
            device `dev` (the device that owns the tile)."""
            if fused_refs and binned:
                # local slot -> global padded-ref index, per bucket
                # segment. Row-major: device dev owns rows
                # [dev*loc_g, (dev+1)*loc_g) of bucket g, so local
                # (seg_off_g + r) maps to roff_g + dev*seg_len_g + r.
                # Slot-major: local (seg_off_g + s*loc_g + p) maps to
                # roff_g + s*pad_g + dev*loc_g + p. The shared overflow
                # block lives at [G_total, +O2). Static unroll over <=8
                # segments.
                idx_glob = idx_t - SL + G_total  # overflow default
                for seg_off_g, seg_len_g, roff_g, loc_g, pad_g in seg_meta:
                    in_seg = (idx_t >= seg_off_g) & (
                        idx_t < seg_off_g + seg_len_g
                    )
                    if slot_order:
                        u = idx_t - seg_off_g
                        cand = (
                            roff_g + (u // loc_g) * pad_g
                            + dev * loc_g + (u % loc_g)
                        )
                    else:
                        cand = idx_t - seg_off_g + roff_g + dev * seg_len_g
                    idx_glob = jnp.where(in_seg, cand, idx_glob)
                return idx_glob
            if fused_refs:
                # flat table. Row-major: device slots are vertex-major
                # (device dev owns slots [dev*SL, (dev+1)*SL)).
                # Slot-major: local (s*n_loc + p) -> s*n_pad + dev*n_loc
                # + p. The shared overflow block lives at
                # [n_pad*ref_cap, +O2).
                if slot_order:
                    return jnp.where(
                        idx_t < SL,
                        (idx_t // n_loc) * n_pad + dev * n_loc
                        + (idx_t % n_loc),
                        idx_t - SL + n_pad * ref_cap,
                    )
                return jnp.where(
                    idx_t < SL,
                    idx_t + dev * SL,
                    idx_t - SL + n_pad * ref_cap,
                )
            return idx_t + dev * E_loc

        # the merged candidate pool can be narrower than k+1 on tiny
        # shards (n_devices * kk columns); clamp like the single-chip tier
        k_merge = min(k + 1, n_devices * kk)
        if knn_comm == "ring_pallas":
            # ---- Pallas RDMA bin ring (parallel/ring_binfold.py) ------ #
            # carry = per-bin minima rotated via make_async_remote_copy,
            # the carry RDMA fully overlapped with the next hop's
            # distance fold; bins sized by the binfold recall model over
            # the GLOBAL reference set. Skips tile_topk entirely (the
            # fold IS the local selection).
            from .ring_binfold import ring_binfold_topk

            _, idx_g, R_pad_ring = ring_binfold_topk(
                q_mid, mid_loc, k_merge, ndev=n_devices,
                axis_name=axis_name, recall_target=recall_target,
            )
            ring_dev = idx_g // R_pad_ring
            ring_p = jnp.minimum(idx_g % R_pad_ring, R_loc - 1)
            knn_idx = to_global(ring_p, ring_dev)[:, 1:]
        elif knn_comm == "ring":
            # ---- ring merge: rotate query shards + running carry ------ #
            # The ring-attention analog (SURVEY §2.4/§5.8), with the roles
            # chosen for the wire: reference tiles are the LARGE operand
            # (E/ndev midpoints) and stay device-resident; each device's
            # S/ndev query rows plus their running top-k carry — the
            # SMALL operand, S*(d + 3k)/ndev elements — rotate around the
            # ring via lax.ppermute. After ndev rotations every query
            # shard has met every reference tile and is back home; one
            # (S/ndev, k_merge) all_gather of the final carries replaces
            # the two (ndev, S, kk) candidate all_gathers of the default
            # merge. The merge orders candidates by (distance, column
            # key = owner_device*kk + local rank) via a two-key lax.sort.
            # The column key is exactly the candidate's column index in
            # the all_gather merge's (device, rank) layout, and lax.top_k
            # is stable (ties keep the lower column), so the running
            # merge is associative — device-order independent — AND
            # bitwise-matches the all_gather merge even when distances
            # tie (duplicate midpoints are common on real graphs; the
            # pre-round-4 global-ref-index tie-break silently changed
            # trajectories there).
            S_loc = -(-S // n_devices)
            S_pad = S_loc * n_devices
            q_pad = jnp.concatenate([
                q_mid,
                jnp.full((S_pad - S, q_mid.shape[1]), 1e30, q_mid.dtype),
            ]) if S_pad != S else q_mid
            q_shard = jax.lax.dynamic_slice(
                q_pad, (i * S_loc, 0), (S_loc, q_pad.shape[1])
            )
            val_dtype = (
                knn_dtype if knn_dtype is not None else positions.dtype
            )
            perm = [(j, (j - 1) % n_devices) for j in range(n_devices)]

            def ring_body(_t, carry):
                q_sh, vals_c, col_c, idx_c = carry
                v_t, il_t = tile_topk(q_sh)
                i_t = to_global(il_t, i)  # refs are THIS device's tile
                # column key in the all_gather merge's (device, rank)
                # candidate layout; unique per (query, candidate) across
                # the whole ring, so (distance, colkey) is a total order
                c_t = jnp.broadcast_to(
                    i * kk + jnp.arange(kk, dtype=jnp.int32), il_t.shape
                )
                vc = jnp.concatenate([vals_c, v_t.astype(val_dtype)], axis=1)
                cc = jnp.concatenate([col_c, c_t], axis=1)
                ic = jnp.concatenate([idx_c, i_t], axis=1)
                vs_, cs_, is_ = jax.lax.sort(
                    (vc, cc, ic), dimension=1, num_keys=2
                )
                vals_c = jax.lax.slice_in_dim(vs_, 0, k_merge, axis=1)
                col_c = jax.lax.slice_in_dim(cs_, 0, k_merge, axis=1)
                idx_c = jax.lax.slice_in_dim(is_, 0, k_merge, axis=1)
                return tuple(
                    jax.lax.ppermute(x, axis_name, perm)
                    for x in (q_sh, vals_c, col_c, idx_c)
                )

            init = (
                q_shard,
                jnp.full((S_loc, k_merge), jnp.inf, val_dtype),
                jnp.full(
                    (S_loc, k_merge), jnp.iinfo(jnp.int32).max, jnp.int32
                ),
                jnp.zeros((S_loc, k_merge), jnp.int32),
            )
            _, _, _, idx_home = jax.lax.fori_loop(
                0, n_devices, ring_body, init
            )
            # ndev compute+rotate rounds bring each shard home with its
            # fully merged carry (sorted ascending; col 0 = self)
            idx_all = jax.lax.all_gather(
                idx_home[:, 1:], axis_name
            )  # (ndev, S_loc, k_merge-1)
            knn_idx = idx_all.reshape(S_pad, k_merge - 1)[:S]
        elif knn_comm == "all_to_all":
            # ---- query-sharded exact merge via lax.all_to_all --------- #
            # Each device still computes its tile's candidates for ALL S
            # queries, but instead of every device gathering EVERY
            # candidate block ((ndev-1)*S*kk received per device) and
            # merging replicated, the blocks are transposed device<->
            # query-shard: device j receives only the candidates for ITS
            # S/ndev queries ((ndev-1)/ndev * S*kk on the wire), merges
            # them, and one small (S_loc, k_merge) all_gather replicates
            # the result. Candidate order per query is (device, rank) —
            # identical to the all_gather merge, so results are bitwise
            # equal.
            vals_loc, idx_loc = tile_topk(q_mid)
            idx_glob = to_global(idx_loc, i)
            S_loc = -(-S // n_devices)
            S_pad = S_loc * n_devices
            if S_pad != S:
                pad = jnp.full((S_pad - S, kk), jnp.inf, vals_loc.dtype)
                vals_loc = jnp.concatenate([vals_loc, pad])
                idx_glob = jnp.concatenate([
                    idx_glob,
                    jnp.zeros((S_pad - S, kk), idx_glob.dtype),
                ])
            vals_x = jax.lax.all_to_all(
                vals_loc.reshape(n_devices, S_loc, kk), axis_name,
                split_axis=0, concat_axis=0,
            )  # (ndev=source device, S_loc, kk) for THIS query shard
            idx_x = jax.lax.all_to_all(
                idx_glob.reshape(n_devices, S_loc, kk), axis_name,
                split_axis=0, concat_axis=0,
            )
            vals_m = jnp.moveaxis(vals_x, 0, 1).reshape(
                S_loc, n_devices * kk
            )
            idx_m = jnp.moveaxis(idx_x, 0, 1).reshape(
                S_loc, n_devices * kk
            )
            neg2, pos2 = jax.lax.top_k(-vals_m, k_merge)
            knn_loc = jnp.take_along_axis(idx_m, pos2, axis=1)[:, 1:]
            knn_all = jax.lax.all_gather(knn_loc, axis_name)
            knn_idx = knn_all.reshape(S_pad, k_merge - 1)[:S]
        else:
            # ---- default merge: local top-kk, all_gather, exact merge - #
            vals_loc, idx_loc = tile_topk(q_mid)
            idx_glob = to_global(idx_loc, i)
            vals_g = jax.lax.all_gather(vals_loc, axis_name)  # (ndev,S,kk)
            idx_g = jax.lax.all_gather(idx_glob, axis_name)
            vals_m = jnp.moveaxis(vals_g, 0, 1).reshape(S, n_devices * kk)
            idx_m = jnp.moveaxis(idx_g, 0, 1).reshape(S, n_devices * kk)
            neg2, pos2 = jax.lax.top_k(-vals_m, k_merge)
            knn_idx = jnp.take_along_axis(idx_m, pos2, axis=1)[:, 1:]
        if fused_refs:
            knn_idx = ops["ref_edge_pad"][knn_idx]  # ref slots -> edge ids

        if _debug_knn:
            # quality-gate hook (tests/test_sharded.py): surface the
            # merged neighbor edge ids + sampled query ids so recall of
            # the forced bf16/approx TPU-mesh shape can be measured
            # against exact ground truth
            return knn_idx, sampled

        # ---- intersection repulsion (replicated, O(S*k)) ------------- #
        if knn_idx.shape[1] > 0:
            inter = intersection_forces(
                positions, edges_full, knn_idx, sampled, k_inter,
                edge_order=ops.get("edge_order"),
            )
        else:
            inter = jnp.zeros_like(positions)

        # ---- update + normalize (replicated) ------------------------- #
        new_positions = positions + spring + inter
        new_positions = new_positions - jnp.mean(
            new_positions, axis=0, keepdims=True
        )
        std = jnp.std(new_positions, axis=0, keepdims=True, ddof=1) + EPS
        return new_positions / std

    shard_fn = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P()) if _debug_knn else P(),
        check_vma=False,
    )

    # num_steps stays static — see models/embedder.py note on dynamic trip
    # counts (compile-time explosion on this toolchain).
    # positions and key are DONATED, mirroring the single-chip engine
    # (models/embedder.py): at the 10M x 3 f32 tier the position buffer
    # is 120 MB — without donation every dispatch keeps an extra live
    # copy on the tier built for the biggest graphs. Callers must treat
    # the passed-in positions/key as consumed (the embedder rebinds both
    # from the outputs; raw_step below stays undonated for the parity
    # harness, which replays the same buffers).
    @partial(jax.jit, donate_argnums=(0, 3))
    def step(positions, edges_padded, valid, key, ops):
        key, sub = jax.random.split(key)
        return shard_fn(positions, edges_padded, valid, sub, ops), key

    @partial(jax.jit, static_argnames=("num_steps",),
             donate_argnums=(0, 3))
    def multi_step(positions, edges_padded, valid, key, ops, num_steps):
        def body(_, carry):
            positions, key = carry
            key, sub = jax.random.split(key)
            return shard_fn(positions, edges_padded, valid, sub, ops), key

        return jax.lax.fori_loop(0, num_steps, body, (positions, key))

    if _debug_knn:
        multi_step = None  # the debug step's output can't feed the loop

    if return_raw:
        # sample-injection variant: (S,) int32 replicated sample rides
        # in the key slot (the parity hook the single-chip engine
        # exposes as _raw_step)
        shard_fn_inject = jax.shard_map(
            partial(sharded_body, inject_sample=True),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(), P()) if _debug_knn else P(),
            check_vma=False,
        )

        @jax.jit
        def raw_step(positions, edges_padded, valid, sampled, ops):
            return shard_fn_inject(
                positions, edges_padded, valid, sampled, ops
            )

        return step, multi_step, step_ops, raw_step
    return step, multi_step, step_ops
