"""Ring-binfold: Pallas RDMA kNN ring with comm/compute overlap.

The Pallas variant of the lax.ppermute kNN ring (sharded_step.py
knn_comm='ring'), per SURVEY §2.4/§5.8's `pltpu.make_async_remote_copy`
mandate — the TPU-native analog of the reference's NCCL comms layer
(the reference itself has no distributed execution; SURVEY §2.4 maps
its single-GPU cuVS tier to "mesh + collectives" here).

Design
------
- Queries (sampled edge midpoints) are replicated in the sharded step;
  each device folds its OWN reference tile (its shard of the fused
  midpoint slots) into per-bin running minima for a rotating
  query-shard assignment: at hop h, device i folds shard (i - h) % ndev.
- The carry that rides the ring is the (S_loc, G*128) bin array itself
  (ops/knn_binfold.py bin layout: bin of local ref position p is
  ((p // T) % G) * 128 + p % 128). Merging two tiles' bins is an
  elementwise (val, idx) min-select — associative, so ring order does
  not matter, and Mosaic-friendly (no in-kernel sort/top-k).
- The carry rotates right via `pltpu.make_async_remote_copy`, double
  buffered: the RDMA of hop h's merged carry is in transit while hop
  h+1's distance fold (the whole per-hop compute) runs. The lax ring
  alternates compute and a blocking ppermute; here transport hides
  behind the fold.
- Flow control: a receiver frees a carry slot for its left neighbor's
  NEXT send only after its own merge + outgoing read of that slot have
  completed (regular-semaphore signal). Without it a fast sender
  overruns a receiver still merging — caught by the interpret-mode
  race detector (experiments/ring_binfold_proto.py) and fixed here.
- After ndev hops device i holds the fully merged bins of shard
  (i + 1) % ndev; a local lax.top_k + one (S_loc, kk) all_gather with a
  row reorder yields the replicated (S, kk) neighbor set — the same
  contract the all_gather merge produces, with the binfold recall
  model now applied across the GLOBAL reference set (bins sized by
  params_for, collision probability depends on k and bins only).

Index lanes carry GLOBAL positions dev * R_pad + p in fp32 (exact below
2^24): ndev * R_pad must stay under MAX_REFS, enforced by the caller.
"""

import functools

import jax
import jax.numpy as jnp

from ..ops.knn_binfold import _BIG, _PAD_COORD, params_for

__all__ = ["ring_binfold_topk", "ring_supported", "REF_LIMIT"]

# global fp32 index-lane bound (ndev * R_pad)
REF_LIMIT = 1 << 24
# VMEM budget for the resident buffers (carry double-buffer + bins +
# accs); v5e VMEM is ~16 MiB twice-buffered by the pipeline, keep the
# kernel's own residents well under it. Carries beyond it ride the
# HBM-carry kernel (_kernel_hbm), bounded only by a sane HBM allocation.
_VMEM_BUDGET = 10 * 1024 * 1024
_HBM_CARRY_BUDGET = 2 * 1024 * 1024 * 1024


def _kernel(q_ref, r_ref, out_ref, acc_vals, acc_idx,
            bins_vals, bins_idx, carry, out_sem, send_sem, recv_sem,
            ready_sem, *, T, G, n_super, S_loc, ndev, axis_name, dim,
            R_pad):
    h = _pl.program_id(0)
    g = _pl.program_id(1)
    s = _pl.program_id(2)
    gt = s * G + g

    my_id = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my_id + 1, ndev)
    left = jax.lax.rem(my_id + ndev - 1, ndev)

    @_pl.when((h == 0) & (g == 0) & (s == 0))
    def _init_carry():
        carry[0, 0] = jnp.full((S_loc, G * 128), _BIG, jnp.float32)
        carry[0, 1] = jnp.zeros((S_loc, G * 128), jnp.float32)

    # ---- fold this ref tile into group g's running minima ----------- #
    @_pl.when(s == 0)
    def _init_acc():
        acc_vals[:] = jnp.full((S_loc, 128), _BIG, jnp.float32)
        acc_idx[:] = jnp.zeros((S_loc, 128), jnp.float32)

    v = acc_vals[:]
    i = acc_idx[:]
    base = jax.lax.broadcasted_iota(jnp.int32, (S_loc, 128), 1)
    # global candidate id = my tile offset + local position
    off = (my_id * R_pad).astype(jnp.float32)
    q = q_ref[0]
    for c in range(T // 128):
        d = jnp.zeros((S_loc, 128), jnp.float32)
        for coord in range(dim):
            qc = q[:, coord: coord + 1]
            rc = r_ref[coord: coord + 1, c * 128: (c + 1) * 128]
            diff = qc - rc
            d = d + diff * diff
        col = (base + (gt * T + c * 128)).astype(jnp.float32) + off
        take = d < v
        v = jnp.where(take, d, v)
        i = jnp.where(take, col, i)
    acc_vals[:] = v
    acc_idx[:] = i

    @_pl.when(s == n_super - 1)
    def _bank_group():
        bins_vals[:, _pl.ds(g * 128, 128)] = acc_vals[:]
        bins_idx[:, _pl.ds(g * 128, 128)] = acc_idx[:]

    # ---- end of hop: merge bins into the carry, rotate --------------- #
    def _merge_send(slot):
        # descriptor matching the copy INTO carry[slot] (sent by the
        # left neighbor during this hop); wait_recv consumes only the
        # matching receive semaphore
        rdma_slot = _pltpu.make_async_remote_copy(
            src_ref=carry.at[slot],
            dst_ref=carry.at[slot],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[slot],
            device_id=right,
            device_id_type=_pltpu.DeviceIdType.LOGICAL,
        )

        @_pl.when(h > 0)
        def _wait_recv():
            rdma_slot.wait_recv()

        bv = bins_vals[:]
        bi = bins_idx[:]
        cv = carry[slot, 0]
        ci = carry[slot, 1]
        take = bv < cv
        carry[slot, 0] = jnp.where(take, bv, cv)
        carry[slot, 1] = jnp.where(take, bi, ci)

        @_pl.when(h < ndev - 1)
        def _send():
            # flow control: the right neighbor frees our target slot
            # (its slot 1-slot) at the end of ITS previous hop; without
            # this a fast sender overruns a receiver still merging that
            # slot (one-hop overrun, caught by the interpret-mode race
            # detector during bring-up)
            @_pl.when(h > 0)
            def _wait_ready():
                _pltpu.semaphore_wait(ready_sem, 1)

            rdma = _pltpu.make_async_remote_copy(
                src_ref=carry.at[slot],
                dst_ref=carry.at[1 - slot],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[1 - slot],
                device_id=right,
                device_id_type=_pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            # our slot is free for the left neighbor's next send once
            # our outgoing read of it has completed
            rdma.wait_send()
            _pltpu.semaphore_signal(
                ready_sem, inc=1, device_id=left,
                device_id_type=_pltpu.DeviceIdType.LOGICAL,
            )

        @_pl.when(h == ndev - 1)
        def _emit():
            copy = _pltpu.make_async_copy(
                carry.at[slot], out_ref, out_sem.at[0]
            )
            copy.start()
            copy.wait()
            # drain the final inbound ready signal (the right
            # neighbor's last flow-control signal) for a clean exit
            if ndev > 1:
                _pltpu.semaphore_wait(ready_sem, 1)

    @_pl.when((g == G - 1) & (s == n_super - 1) & (h % 2 == 0))
    def _merge_even():
        _merge_send(0)

    @_pl.when((g == G - 1) & (s == n_super - 1) & (h % 2 == 1))
    def _merge_odd():
        _merge_send(1)


def _kernel_hbm(q_ref, r_ref, out_ref, acc_vals, acc_idx, mv, mi,
                loc_sem, send_sem, recv_sem, ready_sem, *, T, G,
                n_super, S_loc, ndev, axis_name, dim, R_pad):
    """HBM-carry variant: the (2, 2, S_loc, G*128) carry lives in ANY
    (HBM) space — as the kernel's OUTPUT buffer — so the VMEM budget no
    longer bounds S_loc * G (VERDICT r2 weak #3: S=512 refused ndev<4).

    Structural changes vs the VMEM kernel:
    - no bins arrays: each group's accumulator merges into its own
      128-column chunk of the carry as it completes (read-chunk /
      min-select / write-chunk, ~128 KB DMAs that vanish next to the
      group's distance fold);
    - hop 0 skips the read-merge and writes the accumulator through
      (the carry starts at +inf, so the select is the identity) — which
      also removes the carry-init pass entirely;
    - the final emit is free: the last hop's merged slot IS the output
      (the caller slices out[(ndev-1) % 2]).
    The ring protocol (send slot -> right's other slot, one-hop-overrun
    flow control via ready_sem) is unchanged from _kernel.
    """
    h = _pl.program_id(0)
    g = _pl.program_id(1)
    s = _pl.program_id(2)
    gt = s * G + g

    my_id = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my_id + 1, ndev)
    left = jax.lax.rem(my_id + ndev - 1, ndev)

    # ---- fold this ref tile into group g's running minima (same as
    # _kernel) ---------------------------------------------------------- #
    @_pl.when(s == 0)
    def _init_acc():
        acc_vals[:] = jnp.full((S_loc, 128), _BIG, jnp.float32)
        acc_idx[:] = jnp.zeros((S_loc, 128), jnp.float32)

    v = acc_vals[:]
    i = acc_idx[:]
    base = jax.lax.broadcasted_iota(jnp.int32, (S_loc, 128), 1)
    off = (my_id * R_pad).astype(jnp.float32)
    q = q_ref[0]
    for c in range(T // 128):
        d = jnp.zeros((S_loc, 128), jnp.float32)
        for coord in range(dim):
            qc = q[:, coord: coord + 1]
            rc = r_ref[coord: coord + 1, c * 128: (c + 1) * 128]
            diff = qc - rc
            d = d + diff * diff
        col = (base + (gt * T + c * 128)).astype(jnp.float32) + off
        take = d < v
        v = jnp.where(take, d, v)
        i = jnp.where(take, col, i)
    acc_vals[:] = v
    acc_idx[:] = i

    # ---- group complete: fold the accumulator into the HBM carry ----- #
    def _chunk(slot, plane):
        return out_ref.at[slot, plane, :, _pl.ds(g * 128, 128)]

    def _merge_group(slot):
        @_pl.when(h == 0)
        def _write_through():
            cv = _pltpu.make_async_copy(acc_vals, _chunk(0, 0),
                                        loc_sem.at[0])
            ci = _pltpu.make_async_copy(acc_idx, _chunk(0, 1),
                                        loc_sem.at[1])
            cv.start()
            ci.start()
            cv.wait()
            ci.wait()

        @_pl.when(h > 0)
        def _read_merge_write():
            # the inbound carry for this hop must have landed before the
            # FIRST chunk read; recv_sem covers the whole slot transfer
            rdma_slot = _pltpu.make_async_remote_copy(
                src_ref=out_ref.at[slot],
                dst_ref=out_ref.at[slot],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[slot],
                device_id=right,
                device_id_type=_pltpu.DeviceIdType.LOGICAL,
            )

            @_pl.when(g == 0)
            def _wait_recv():
                rdma_slot.wait_recv()

            rv = _pltpu.make_async_copy(_chunk(slot, 0), mv,
                                        loc_sem.at[0])
            ri = _pltpu.make_async_copy(_chunk(slot, 1), mi,
                                        loc_sem.at[1])
            rv.start()
            ri.start()
            rv.wait()
            ri.wait()
            take = acc_vals[:] < mv[:]
            mv[:] = jnp.where(take, acc_vals[:], mv[:])
            mi[:] = jnp.where(take, acc_idx[:], mi[:])
            wv = _pltpu.make_async_copy(mv, _chunk(slot, 0),
                                        loc_sem.at[0])
            wi = _pltpu.make_async_copy(mi, _chunk(slot, 1),
                                        loc_sem.at[1])
            wv.start()
            wi.start()
            wv.wait()
            wi.wait()

    @_pl.when((s == n_super - 1) & (h % 2 == 0))
    def _merge_even():
        _merge_group(0)

    @_pl.when((s == n_super - 1) & (h % 2 == 1))
    def _merge_odd():
        _merge_group(1)

    # ---- end of hop: rotate (same protocol/flow control as _kernel) --- #
    def _send_emit(slot):
        @_pl.when(h < ndev - 1)
        def _send():
            @_pl.when(h > 0)
            def _wait_ready():
                _pltpu.semaphore_wait(ready_sem, 1)

            rdma = _pltpu.make_async_remote_copy(
                src_ref=out_ref.at[slot],
                dst_ref=out_ref.at[1 - slot],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[1 - slot],
                device_id=right,
                device_id_type=_pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait_send()
            _pltpu.semaphore_signal(
                ready_sem, inc=1, device_id=left,
                device_id_type=_pltpu.DeviceIdType.LOGICAL,
            )

        @_pl.when(h == ndev - 1)
        def _emit():
            # the merged slot IS the output; just drain the final
            # inbound flow-control signal for a clean exit
            if ndev > 1:
                _pltpu.semaphore_wait(ready_sem, 1)

    @_pl.when((g == G - 1) & (s == n_super - 1) & (h % 2 == 0))
    def _rotate_even():
        _send_emit(0)

    @_pl.when((g == G - 1) & (s == n_super - 1) & (h % 2 == 1))
    def _rotate_odd():
        _send_emit(1)


_pl = None
_pltpu = None


def _ensure_pallas():
    global _pl, _pltpu
    if _pl is None:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        _pl, _pltpu = pl, pltpu


def _geometry(E_loc, S, ndev, k, recall_target):
    """Static kernel geometry; raises ValueError when unsupported.

    build_sharded_step probes this via ring_supported() at build time
    and tiers down to knn_comm='ring'; direct ring_binfold_topk callers
    see the ValueError at trace time."""
    T, G = params_for(k, recall_target)
    n_tiles = -(-max(E_loc, 1) // T)
    G = min(G, n_tiles)
    n_super = -(-n_tiles // G)
    R_pad = n_super * G * T
    if S % ndev != 0:
        S_pad = -(-S // ndev) * ndev
    else:
        S_pad = S
    S_loc = S_pad // ndev
    S_loc = -(-max(S_loc, 8) // 8) * 8
    S_pad = S_loc * ndev
    if ndev * R_pad > REF_LIMIT:
        raise ValueError(
            f"ring_binfold index lanes: ndev*R_pad = {ndev * R_pad} "
            f"exceeds {REF_LIMIT}; use knn_comm='ring' (the lax.ppermute "
            f"ring has no index-lane bound)"
        )
    # resident VMEM of the fast kernel: carry (2 slots x 2 planes) +
    # bins (2 planes). Beyond the budget the HBM-carry kernel takes over
    # (hbm=True); its own ceiling is the 2-slot carry allocation in HBM.
    resident = 6 * S_loc * G * 128 * 4
    hbm = resident > _VMEM_BUDGET
    if hbm and 4 * S_loc * G * 128 * 4 > _HBM_CARRY_BUDGET:
        raise ValueError(
            f"ring_binfold HBM carry too large: "
            f"{4 * S_loc * G * 128 * 4} bytes (S_loc={S_loc}, G={G}); "
            f"use knn_comm='ring'"
        )
    return T, G, n_super, R_pad, S_pad, S_loc, hbm


def ring_supported(E_loc, S, ndev, k, recall_target=0.95):
    """True when the static geometry fits the kernel's bounds."""
    try:
        _geometry(E_loc, S, ndev, k, recall_target)
        return True
    except ValueError:
        return False


def ring_binfold_topk(q_mid, mid_loc, kk, *, ndev, axis_name,
                      recall_target=0.95, interpret=None):
    """Global approximate top-kk via the RDMA bin ring.

    Call INSIDE shard_map. q_mid: (S, d) replicated query midpoints;
    mid_loc: (E_loc, d) this device's reference tile (REF_PAD rows fold
    harmlessly — their distances exceed every real candidate).

    Returns (vals (S, kk) f32, idx (S, kk) int32, R_pad) REPLICATED,
    where idx is `folder_device * R_pad + local_position` — the caller
    recovers (folder, position) with R_pad and translates the position
    through its own to_global mapping. Pad-query rows (S padded to
    ndev*8-row shards) are dropped before return.
    """
    _ensure_pallas()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    S_in, dim = q_mid.shape
    E_loc = mid_loc.shape[0]
    T, G, n_super, R_pad, S_pad, S_loc, hbm = _geometry(
        E_loc, S_in, ndev, kk, recall_target
    )

    q = q_mid.astype(jnp.float32)
    if S_pad != S_in:
        q = jnp.concatenate([
            q, jnp.full((S_pad - S_in, dim), _PAD_COORD, jnp.float32)
        ])
    refs_t = (
        jnp.full((R_pad, dim), _PAD_COORD, jnp.float32)
        .at[:E_loc].set(mid_loc.astype(jnp.float32)).T
    )

    i = jax.lax.axis_index(axis_name)
    # hop h's shard for this device: (i - h) % ndev
    hops = jax.lax.rem(
        i + ndev - jnp.arange(ndev, dtype=jnp.int32), ndev
    )
    q_rot = q.reshape(ndev, S_loc, dim)[hops]

    in_specs = [
        _pl.BlockSpec((1, S_loc, dim), lambda h, g, s: (h, 0, 0),
                      memory_space=_pltpu.VMEM),
        _pl.BlockSpec((dim, T), lambda h, g, s: (0, s * G + g),
                      memory_space=_pltpu.VMEM),
    ]
    # collective_id must stay unset: it is only legal alongside a
    # get_barrier_semaphore() custom barrier, which these kernels'
    # semaphore-based flow control replaces
    params = _pltpu.CompilerParams(has_side_effects=True)
    if isinstance(interpret, bool):
        # tests pass an InterpretParams directly (e.g. detect_races=True)
        interp = (
            _pltpu.InterpretParams(dma_execution_mode="on_wait")
            if interpret else False
        )
    else:
        interp = interpret
    if hbm:
        kernel = functools.partial(
            _kernel_hbm, T=T, G=G, n_super=n_super, S_loc=S_loc,
            ndev=ndev, axis_name=axis_name, dim=dim, R_pad=R_pad,
        )
        out = _pl.pallas_call(
            kernel,
            grid=(ndev, G, n_super),
            in_specs=in_specs,
            out_specs=_pl.BlockSpec(memory_space=_pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct(
                (2, 2, S_loc, G * 128), jnp.float32
            ),
            scratch_shapes=[
                _pltpu.VMEM((S_loc, 128), jnp.float32),    # acc_vals
                _pltpu.VMEM((S_loc, 128), jnp.float32),    # acc_idx
                _pltpu.VMEM((S_loc, 128), jnp.float32),    # mv
                _pltpu.VMEM((S_loc, 128), jnp.float32),    # mi
                _pltpu.SemaphoreType.DMA((2,)),            # local chunks
                _pltpu.SemaphoreType.DMA((2,)),            # send
                _pltpu.SemaphoreType.DMA((2,)),            # recv
                _pltpu.SemaphoreType.REGULAR,              # flow ctl
            ],
            compiler_params=params,
            interpret=interp,
        )(q_rot, refs_t)
        merged = out[(ndev - 1) % 2]  # (2, S_loc, G*128): [vals, idx]
    else:
        kernel = functools.partial(
            _kernel, T=T, G=G, n_super=n_super, S_loc=S_loc, ndev=ndev,
            axis_name=axis_name, dim=dim, R_pad=R_pad,
        )
        out = _pl.pallas_call(
            kernel,
            grid=(ndev, G, n_super),
            in_specs=in_specs,
            out_specs=_pl.BlockSpec(memory_space=_pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct(
                (2, S_loc, G * 128), jnp.float32
            ),
            scratch_shapes=[
                _pltpu.VMEM((S_loc, 128), jnp.float32),        # acc_vals
                _pltpu.VMEM((S_loc, 128), jnp.float32),        # acc_idx
                _pltpu.VMEM((S_loc, G * 128), jnp.float32),    # bins_vals
                _pltpu.VMEM((S_loc, G * 128), jnp.float32),    # bins_idx
                _pltpu.VMEM((2, 2, S_loc, G * 128), jnp.float32),  # carry
                _pltpu.SemaphoreType.DMA((1,)),                # out copy
                _pltpu.SemaphoreType.DMA((2,)),                # send
                _pltpu.SemaphoreType.DMA((2,)),                # recv
                _pltpu.SemaphoreType.REGULAR,                  # flow ctl
            ],
            compiler_params=params,
            interpret=interp,
        )(q_rot, refs_t)
        merged = out  # (2, S_loc, G*128): [vals, idx]

    # local top-kk over the merged bins of the shard that ended here
    neg, pos = jax.lax.top_k(-merged[0], kk)
    idx_loc = jnp.take_along_axis(merged[1], pos, axis=1)
    vals_loc = -neg

    # device i holds shard (i + 1) % ndev -> all_gather + row reorder
    vals_all = jax.lax.all_gather(vals_loc, axis_name)  # (ndev, S_loc, kk)
    idx_all = jax.lax.all_gather(idx_loc, axis_name)
    # shard a sits at device (a - 1) % ndev
    order = jnp.remainder(
        jnp.arange(ndev, dtype=jnp.int32) - 1, ndev
    )
    vals = vals_all[order].reshape(S_pad, kk)[:S_in]
    idx = idx_all[order].reshape(S_pad, kk)[:S_in]
    return vals, idx.astype(jnp.int32), R_pad
