"""ShardedGraphEmbedder — the multi-chip tier of the engine.

Same public surface as GraphEmbedderTPU (run_layout / update_positions /
positions / display_layout) so the factory can swap it in transparently for
100K+ vertex graphs on multi-device meshes (the role the cuVS backend plays
in the reference, re-cast as a mesh tier — SURVEY.md §7.1.2).
"""

import logging

import jax.numpy as jnp
import numpy as np

from ..models.embedder import GraphEmbedderTPU
from ..parallel.mesh import (
    default_mesh,
    mesh_is_multiprocess,
    replicate_to_mesh,
)
from ..parallel.sharded_step import build_sharded_step, pad_edges

logger = logging.getLogger(__name__)


class ShardedGraphEmbedder(GraphEmbedderTPU):
    """Edge-partitioned embedder over a jax.sharding.Mesh.

    Inherits all validation/init/toolkit behavior from the single-chip
    engine and replaces the layout step with the shard_map version.
    """

    # Degree-binned tables follow the same auto cost model as the
    # single-chip engine (was opt-in until hardware-measured; the
    # round-3 1-device TPU-mesh A/B at 1M vertices measured binned
    # 78.3 vs flat 116.3 ms/iter — BASELINE.md r3 table — so the
    # default now matches the single-chip tier's choice). Pass
    # binned_table=False to force the flat sliced table.
    _wants_binned_table = True
    # slot-major ref tiles supported since round 4 (sharded_step.py
    # slot_order branches: transposed tables column-sharded, per-slot
    # gathers + fold, slot-major local/global ref enumeration) — the
    # same auto threshold as the single-chip engine applies
    # (SLOT_REF_ORDER_MIN_N; 1.26-1.41x per step, BASELINE.md r4)
    _supports_slot_order = True
    # neighbor tables stay host-side until build_sharded_step pads them
    # (models/embedder.py _nb_to_device — avoids a device round-trip of
    # the full table bytes through the TPU tunnel at init)
    _nb_to_device = False

    def __init__(self, adjacency, n_components=2, mesh=None, knn_comm=None,
                 use_binfold_local=None, **kwargs):
        self.mesh = mesh if mesh is not None else default_mesh()
        self._n_mesh_devices = int(
            np.prod(list(self.mesh.shape.values()))
        )
        # 'all_gather' (default) or 'ring' — see build_sharded_step
        self.knn_comm = knn_comm
        # None = auto (TPU meshes behind a compile probe)
        self.use_binfold_local = use_binfold_local
        super().__init__(adjacency, n_components=n_components, **kwargs)

    def _resolved_strategy(self):
        return "sharded"

    def _ref_order_platform(self):
        # the auto ref_order must track the MESH's platform, not
        # self.device: on this host self.device resolves to the TPU
        # even when the embedder runs on a virtual CPU test mesh
        return self.mesh.devices.flat[0].platform

    def _init_mesh(self):
        # single-process meshes only: the sharded Chebyshev runner feeds
        # host numpy operands straight into a mesh-lowered jit, which on
        # a multi-HOST mesh would need global-array placement first
        return None if mesh_is_multiprocess(self.mesh) else self.mesh

    def _build_step(self):
        # self._edges_engine_np carries the engine's edge numbering: the
        # internal (renumbered, lexsorted) list when the binned table is
        # active, the user-order list otherwise — sampling, ref maps, and
        # the intersection dedup all speak that numbering. (The host copy
        # avoids fetching self.edges back off the device just to pad it.)
        edges_p, valid = pad_edges(
            self._edges_engine_np, self._n_mesh_devices
        )
        self._edges_padded = jnp.asarray(edges_p)
        self._valid = jnp.asarray(valid)

        # Multi-HOST execution: a jit lowered for a mesh that spans other
        # processes only accepts GLOBAL jax.Arrays. All step operands are
        # replicated (every process runs the same program on the same
        # graph — the standard JAX SPMD contract), so each process
        # contributes the full array (mesh.replicate_to_mesh).
        self._multiprocess = mesh_is_multiprocess(self.mesh)
        if self._multiprocess:
            rep = lambda x: replicate_to_mesh(x, self.mesh)  # noqa: E731
            self._edges_padded = rep(edges_p)
            self._valid = rep(valid)
            self._positions = rep(self._positions)
            self._key = rep(self._key)

        step, multi_step, sharded_ops, raw_step = build_sharded_step(
            self.mesh,
            self.n,
            self.n_edges,
            n_components=self.n_components,
            k_attr=self.k_attr,
            L_min=self.L_min,
            k_inter=self.k_inter,
            n_neighbors=self.n_neighbors,
            sample_size=self.sample_size,
            nb=self._nb,
            knn_recall_target=self.knn_recall_target,
            fused_refs=self.fused_midpoints,
            knn_comm=self.knn_comm,
            use_binfold_local=self.use_binfold_local,
            packed_gather=self.packed_gather,
            return_raw=True,
        )
        if self._multiprocess:
            import jax

            sharded_ops = jax.tree.map(rep, sharded_ops)
        self._fused_refs_active = (
            "ref_valid_pad" in sharded_ops or "bref_valid" in sharded_ops
        )

        # The inherited run_layout/update_positions thread self._step_ops;
        # here it is the sharded operand pytree from build_sharded_step
        # (padded neighbor table etc. as jit arguments).
        self._step_ops = sharded_ops

        def bound_step(positions, key, ops):
            return step(positions, self._edges_padded, self._valid, key, ops)

        def bound_multi(positions, key, ops, num_steps=1):
            return multi_step(
                positions, self._edges_padded, self._valid, key, ops,
                num_steps=num_steps,
            )

        self._multi_step = bound_multi

        # Parity hook (same contract as the single-chip _raw_step): run
        # one step with an INJECTED (S,) sample — lets the oracle-parity
        # harness drive the sharded step layer-by-layer. The inherited
        # update_positions translates user edge ids through _edge_map
        # before calling this.
        def bound_raw(positions, sampled, ops):
            return raw_step(
                positions, self._edges_padded, self._valid, sampled, ops
            )

        self._raw_step = bound_raw
        return bound_step

    def _place_state(self, value, dtype):
        """Engine state on multi-process meshes must be a GLOBAL array
        (the positions setter and load_checkpoint route through here, so
        checkpoint save/resume works mid multi-host run)."""
        if getattr(self, "_multiprocess", False):
            import numpy as _np

            return replicate_to_mesh(_np.asarray(value).astype(dtype),
                                     self.mesh)
        return super()._place_state(value, dtype)

    def update_positions(self, sample_indices=None):
        if sample_indices is not None:
            if self._multiprocess:
                # injected host samples would need global-array placement
                # on every participating process first
                raise NotImplementedError(
                    "sample injection on a multi-process mesh is not "
                    "supported; run the parity harness single-process"
                )
            # the inherited path routes through self._raw_step with the
            # _edge_map user->internal translation
            return super().update_positions(sample_indices=sample_indices)
        if self.n_edges == 0:
            return
        self._positions, self._key = self._step(
            self._positions, self._key, self._step_ops
        )
        self._iteration += 1

    def __repr__(self):
        return (
            f"ShardedGraphEmbedder(n_vertices={self.n}, "
            f"n_components={self.n_components}, "
            f"mesh={dict(self.mesh.shape)})"
        )
