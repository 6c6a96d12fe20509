"""GraphEmbedderTPU — the single TPU-native layout engine.

The reference ships two engines (GraphEmbedderPyTorch,
backends/embedder_pytorch.py; GraphEmbedderCuVS, backends/embedder_cuvs.py)
because of CUDA library gaps. Here there is ONE jitted engine and the
"backend" axis becomes kernel-strategy selection (exact XLA kNN vs Pallas
tiled kNN vs sharded multi-chip kNN) plus mesh selection — see
utils/backend_selection.py and SURVEY.md §7.1.2.

TPU-first design points:
- the whole layout iteration is one jitted, static-shape function; the
  position buffer is donated, so iterating never reallocates HBM;
- scatter accumulation is a pre-sorted segment-sum (deterministic on TPU,
  unlike CUDA index_add_ atomics);
- candidate filtering is multiplicative masking, not boolean indexing, so
  nothing recompiles across iterations;
- RNG is an explicit threaded jax.random key; sample indices can be
  injected for layer-by-layer parity testing against the numpy oracle.

Implements the (correct) midpoint-vs-midpoint kNN semantics of the PyTorch
backend, not the cuVS backend's vertex-index quirk (SURVEY.md §3.3).
"""

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops.forces import (
    build_neighbor_table,
    build_neighbor_table_binned,
    intersection_forces,
    midpoint_refs_binned,
    midpoint_refs_from_gathered,
    pack_positions,
    spring_forces_binned,
    spring_forces_from_gathered,
    spring_refs_binned_slotwise,
    spring_refs_slotwise,
)
from ..ops.knn import knn
from ..ops.laplacian import spectral_init
from ..utils.memory_management import get_optimal_chunk_size

logger = logging.getLogger(__name__)

EPS = 1e-6

# Auto threshold for the slot-major ref layout (ref_order=None on TPU).
# Round-4 A/Bs measured slot-major FASTER at every tier, not just the
# >=30M compile-forced one: 100K 6.13 -> 4.38 ms/iter (1.40x), 1M 73.0
# -> 57.8 (1.26x), 10M 960.7 -> 683.4 (1.41x) — the per-slot 2D (n, d)
# gathers both beat the row-major (count, cap) gather's ns/row and feed
# the binfold kernel's (d, E_pad) layout without the per-segment
# pad+transpose (BASELINE.md round-4 A/B table). The floor below skips
# only small/interactive graphs, where the per-slot unrolled gathers
# cost extra compile time (~+60 s at 100K) for microseconds of step.
SLOT_REF_ORDER_MIN_N = 100_000

# Auto WINDOW for the lane-packed per-slot gathers (packed_gather=None
# on TPU, slot paths only): the packed composed gather (ops/forces.py
# pack_positions/packed_take) beats the plain per-row gather only while
# the packed source stays in XLA's fused fast path (~<=125K source
# rows) AND the one-hot select overhead (~linear in G) stays under the
# shrink. Isolated-probe points (experiments/packed_gather_probe.py r5):
# 1M G=8 3.3 vs 5.9 ns/row, 2M G=16 4.7 vs 5.6, 4M+ every G loses
# (wide-row sources above ~250K rows fall off the fused path into a
# per-element regime — 18-36 ns/row at 10M, with the (R, G*D) rows
# materialized per the OOM dump). In-ENGINE window A/Bs (ab_1m_packed
# harness, full step, best of 3): 100K 0.93x / 150K 0.93x / 250K 1.61x
# / 500K 1.83x / 1M 1.70x / 2M 1.19x — window bounds below are the
# measured-win endpoints. Value-identical either way.
PACKED_GATHER_MIN_N = 250_000
PACKED_GATHER_MAX_N = 2_500_000


def _packed_gather_g(n):
    """Packing factor keeping the packed source near the measured fast
    regime (~125K rows): G=8 up to ~1.5M vertices, 16 to the window
    top."""
    return 8 if n <= 1_500_000 else 16


class GraphEmbedderTPU:
    """Force-directed graph embedder on TPU (JAX/XLA/Pallas).

    Parameters mirror the reference engine's constructor surface
    (embedder_pytorch.py:51-104) so reference users can switch directly.

    Parameters
    ----------
    adjacency : array-like or scipy.sparse matrix
        Square adjacency matrix (n x n); 1s for edges.
    n_components : int, default=2
        Embedding dimensionality.
    dtype : jnp dtype, default=jnp.float32
        Position/compute dtype.
    L_min : float, default=1.0
        Minimum spring length.
    k_attr : float, default=0.2
        Spring attraction constant.
    k_inter : float, default=0.5
        Intersection repulsion constant.
    n_neighbors : int, default=10
        Neighbors per sampled midpoint for intersection detection.
    sample_size : int, default=256
        Edge midpoints sampled per iteration (bounds the quadratic
        intersection search; reference embedder_pytorch.py:156).
    batch_size : int, optional
        kNN reference-tile chunk; auto-derived from static memory budgets
        when None (utils/memory_management.py).
    knn_strategy : str, default='auto'
        'auto' | 'exact' | 'chunked' | 'approx' | 'binfold' | 'pallas'.
        'auto' tiers on edge count: exact below EXACT_MAX_REFS, the fused
        Pallas bin-fold kernel on TPU when its gates + compile probe pass
        (ops/knn_binfold.py), else the one-shot approx (PartialReduce)
        tier; CPU hosts take the exact blockwise scan.
    knn_compute_dtype : optional dtype
        Distance compute dtype for the approx kNN tier. None (default)
        auto-selects bfloat16 on TPU — the (S, E) distance traffic
        dominates the approx tier and bf16 measured ~1 ms/iter faster at
        the 100K tier with no measurable Spearman-quality change
        (experiments/quality_bf16_fused.py). Pass jnp.float32 to force
        full-precision distances.
    knn_recall_target : float, default=0.95
        approx_min_k recall target for the approx tier.
    init : str, default='auto'
        Spectral-init tier: 'auto' | 'scipy' | 'chebyshev' | 'lobpcg' |
        'random'. 'auto' uses host ARPACK at small/medium n and the
        device Chebyshev-filtered subspace iteration beyond
        (ops/laplacian.py).
    fused_midpoints : bool, optional
        Build the kNN midpoint reference set from the spring neighbor-table
        gather (no second edge gather) instead of gathering edge endpoints.
        None (default) auto-enables it for the approx strategy when the
        slot-table padding overhead is bounded.
    binned_table : bool, optional
        Degree-binned neighbor tables over an internal degree-sorted
        vertex renumbering (ops/forces.py build_neighbor_table_binned):
        the spring gather's slot count drops toward 2E on non-regular
        degree distributions. None (default) lets the bucket cost model
        decide; True forces binning with zero per-bucket overhead
        allowance; False keeps the flat table.
    ref_order : {'row', 'slot'}, optional
        Flattened kNN ref-space enumeration and table orientation
        (ops/forces.py build_neighbor_table*). None (default) picks
        'slot' on TPU from SLOT_REF_ORDER_MIN_N vertices: the
        slot-major order builds spring forces and midpoint refs from
        per-slot 2D blocks — measured 1.26-1.41x faster per step at
        every tier 100K-10M (BASELINE.md round-4 A/B) — and avoids the
        cap-minor temps whose 16x lane padding blocked the 30M-vertex
        compile (BASELINE.md round 3).
    packed_gather : bool, optional
        Lane-packed per-slot position gathers (ops/forces.py
        pack_positions/packed_take): G=8 vertices per packed source row
        shrink the gather's source row count 8x, which is what the HBM
        per-row issue-rate wall actually responds to (index structure
        does not — experiments/gather_locality_probe.py). Slot paths
        only; value-identical to the plain gather. None (default)
        auto-enables on TPU from PACKED_GATHER_MIN_N vertices.
    memory_efficient : bool, default=True
        Kept for API compatibility; chunked strategies are always available.
    verbose : bool, default=True
    logger_instance : logging.Logger, optional
    seed : int, optional
        Seeds the jax.random key stream and the numpy fallback init.
    device : optional
        Accepted for reference API compatibility ('cpu', 'tpu', jax.Device);
        None selects jax.devices()[0].
    """

    # Subclasses that consume the flat neighbor table directly (the
    # sharded mesh tier) opt out of the degree-binned structure.
    _wants_binned_table = True
    # Whether the engine can consume the slot-major ref layout; both
    # tiers can since round 4 (the sharded tier gained slot_order
    # branches in parallel/sharded_step.py).
    _supports_slot_order = True

    def _ref_order_platform(self):
        """Platform that decides the auto ref_order: the COMPUTE
        platform. The sharded tier overrides this with its mesh's
        platform (self.device can be a TPU while the mesh is the
        virtual CPU test mesh)."""
        return self.device.platform
    # Whether the neighbor-table builders place their arrays on device.
    # The sharded tier sets False: it pads/reshapes the tables host-side
    # in build_sharded_step before a single device placement, and a
    # device round-trip costs a full table fetch + re-upload over the
    # TPU tunnel (most of the 70 s sharded-vs-single init gap measured
    # at 10M vertices — BASELINE.md round 3).
    _nb_to_device = True

    def __init__(
        self,
        adjacency,
        n_components=2,
        device=None,
        dtype=jnp.float32,
        L_min=1.0,
        k_attr=0.2,
        k_inter=0.5,
        n_neighbors=10,
        sample_size=256,
        batch_size=None,
        knn_strategy="auto",
        knn_compute_dtype=None,
        knn_recall_target=0.95,
        init="auto",
        fused_midpoints=None,
        binned_table=None,
        ref_order=None,
        packed_gather=None,
        memory_efficient=True,
        verbose=True,
        logger_instance=None,
        seed=None,
    ):
        if logger_instance is not None:
            self.logger = logger_instance
        else:
            self.logger = logger
            if verbose:
                logging.basicConfig(level=logging.INFO)

        adjacency = self._validate_adjacency(adjacency)
        self.adjacency = adjacency
        self.n = adjacency.shape[0]
        self.n_components = int(n_components)
        self.dtype = dtype
        self.L_min = float(L_min)
        self.k_attr = float(k_attr)
        self.k_inter = float(k_inter)
        self.n_neighbors = int(n_neighbors)
        self.memory_efficient = memory_efficient
        self.verbose = verbose
        self.seed = seed
        self.knn_strategy = knn_strategy
        self.knn_compute_dtype = knn_compute_dtype
        self.knn_recall_target = float(knn_recall_target)
        self.fused_midpoints = fused_midpoints
        self.binned_table = binned_table
        self.ref_order = ref_order
        self.packed_gather = packed_gather
        self._iteration = 0

        if self.n_components <= 0:
            raise ValueError(
                f"Number of components must be positive, got {n_components}"
            )
        if self.k_attr < 0:
            raise ValueError(
                f"Attractive force constant k_attr must be non-negative, "
                f"got {k_attr}"
            )
        if self.n_neighbors <= 0:
            raise ValueError(
                f"n_neighbors must be positive, got {n_neighbors}"
            )
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")

        self.device = self._resolve_device(device)

        edges_np = self._extract_edges_from_adjacency(adjacency)
        self.n_edges = len(edges_np)
        self.sample_size = int(min(sample_size, max(self.n_edges, 1)))
        self._edges_np = edges_np

        if batch_size is None:
            self.batch_size = get_optimal_chunk_size(
                self.n, self.n_components, strategy=self._resolved_strategy()
            )
            if self.verbose:
                self.logger.info(
                    "Using automatic batch size: %d", self.batch_size
                )
        else:
            self.batch_size = int(batch_size)
            if self.verbose:
                self.logger.info(
                    "Using user-defined batch size: %d", self.batch_size
                )

        with jax.default_device(self.device):
            # Gather-based aggregation plan: dense neighbor table + COO
            # overflow (4x faster than segment_sum scatter on TPU). On
            # non-regular degree distributions the degree-binned variant
            # replaces the single table with per-degree-range tables over
            # an INTERNAL degree-sorted vertex renumbering (gather cost
            # is proportional to total slot count — BASELINE.md); the
            # renumbering never leaks: `positions`, `_edges_np`, display,
            # checkpoints, and injected sample indices all speak user ids.
            want_binned = (
                self._wants_binned_table if binned_table is None
                else bool(binned_table)
            )
            if ref_order is None:
                ref_order = (
                    "slot"
                    if (self._supports_slot_order
                        and self._ref_order_platform() == "tpu"
                        and self.n >= SLOT_REF_ORDER_MIN_N)
                    else "row"
                )
            elif ref_order == "slot" and not self._supports_slot_order:
                raise ValueError(
                    "ref_order='slot' is not supported by this engine "
                    "(the sharded tier's ref tiles are row-major)"
                )
            elif ref_order not in ("row", "slot"):
                raise ValueError(f"unknown ref_order: {ref_order!r}")
            self.ref_order = ref_order
            # Keep the ref space inside the binfold kernel's segmented
            # index bound — past it the fused-refs gate silently turns
            # off and the step re-pays the 2E midpoint gather. Only
            # binds at ~100M-edge scale (the builders trim pad columns
            # first; see forces.py ref_budget).
            if self.device.platform == "tpu":
                from ..ops.knn_binfold import MAX_REFS_SEGMENTED

                ref_budget = MAX_REFS_SEGMENTED - 1
            else:
                ref_budget = None
            nbb = (
                build_neighbor_table_binned(
                    edges_np, self.n,
                    overhead_rows=0 if binned_table else 4096,
                    ref_order=ref_order, ref_budget=ref_budget,
                    to_device=self._nb_to_device,
                )
                if want_binned and self.n_edges > 0 else None
            )
            if nbb is not None:
                self._nb = nbb
                self._perm = nbb["perm"]
                self._inv_perm = nbb["inv_perm"]
                self._edge_map = nbb["edge_map"]
                # host copy in ENGINE numbering — the sharded tier pads
                # edges host-side and must not fetch them back off-device
                self._edges_engine_np = np.asarray(
                    nbb["edges_int"], np.int32
                )
                self.edges = jnp.asarray(nbb["edges_int"], jnp.int32)
            else:
                self._nb = build_neighbor_table(
                    edges_np, self.n, ref_order=ref_order,
                    ref_budget=ref_budget,
                    to_device=self._nb_to_device,
                )
                self._perm = None
                self._inv_perm = None
                self._edge_map = None
                self._edges_engine_np = np.asarray(edges_np, np.int32)
                self.edges = jnp.asarray(edges_np, jnp.int32)
            self._nb_overflow = (
                jnp.asarray(self._nb["overflow"])
                if len(self._nb["overflow"]) else None
            )
            self._key = jax.random.PRNGKey(
                seed if seed is not None else np.random.SeedSequence().entropy % (2**31)
            )

            if self.verbose:
                self.logger.info(
                    "Initialized GraphEmbedderTPU on %s", self.device
                )
                self.logger.info(
                    "Graph: %d vertices, %d edges, %dD",
                    self.n, self.n_edges, self.n_components,
                )
                self.logger.info(
                    "kNN strategy: %s", self._resolved_strategy()
                )

            init_np = spectral_init(
                adjacency, self.n_components, method=init, seed=seed,
                mesh=self._init_mesh(),
            )
            if self._perm is not None:
                init_np = init_np[self._perm]
            self._positions = jnp.asarray(init_np, self.dtype)

        self._step = self._build_step()

    # ------------------------------------------------------------------ #
    # construction helpers
    # ------------------------------------------------------------------ #

    @staticmethod
    def _resolve_device(device):
        # local_devices, not devices: in a multi-HOST run jax.devices()[0]
        # belongs to process 0 — pinning host arrays to a remote device
        # from another process yields arrays with no addressable shards
        if device is None:
            return jax.local_devices()[0]
        if isinstance(device, str):
            name = device.lower()
            if name in ("cpu",):
                return jax.local_devices(backend="cpu")[0]
            for d in jax.local_devices():
                if name in (d.platform, str(d).lower()):
                    return d
            return jax.local_devices()[0]
        return device

    def _validate_adjacency(self, adjacency):
        """Validate and convert to CSR (reference embedder_pytorch.py:182-218)."""
        if sp.issparse(adjacency):
            adjacency = adjacency.tocsr()
        elif not isinstance(adjacency, np.ndarray):
            adjacency = np.asarray(adjacency)

        if adjacency.ndim != 2 or adjacency.shape[0] != adjacency.shape[1]:
            raise ValueError(
                f"Adjacency matrix must be square, got shape {adjacency.shape}"
            )
        if adjacency.shape[0] == 0:
            raise ValueError("Adjacency matrix cannot be empty")
        if not sp.issparse(adjacency):
            adjacency = sp.csr_matrix(adjacency)
        return adjacency

    def _extract_edges_from_adjacency(self, adjacency):
        """Upper-triangle COO extraction (reference :220-245).

        Reads the CSR structure directly instead of ``adjacency.nonzero()``
        (which round-trips through COO): ~4x less host time at the
        10M-vertex tier. Explicit zeros are excluded, matching nonzero().

        Always returns int32 (the engine's device index dtype, see the
        jnp.int32 casts in __init__) so callers see one dtype whether or
        not the C extension is built.
        """
        if adjacency.format != "csr":
            adjacency = adjacency.tocsr()
        n = adjacency.shape[0]
        nz = adjacency.data != 0
        if nz.all() and n < 2**31:
            # threaded C scan of the CSR structure (native/fastgraph.c):
            # 17 s -> ~1 s at n=10M / nnz=70M vs the numpy formulation
            from ..native import csr_lt_edges_native

            edges = csr_lt_edges_native(
                adjacency.indptr, adjacency.indices, n
            )
            if edges is not None:
                if self.verbose and len(edges) == 0:
                    self.logger.warning(
                        "No edges found in adjacency matrix"
                    )
                return edges
        rows = np.repeat(
            np.arange(n, dtype=np.int64), np.diff(adjacency.indptr)
        )
        cols = adjacency.indices
        mask = rows < cols
        if not nz.all():
            mask &= nz
        edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int32)
        if self.verbose and len(edges) == 0:
            self.logger.warning("No edges found in adjacency matrix")
        return edges

    def _init_mesh(self):
        """Mesh for the spectral init's sharded Chebyshev tier (None on
        the single-chip engine; ShardedGraphEmbedder returns its mesh)."""
        return None

    def _resolved_strategy(self):
        if self.knn_strategy != "auto":
            return self.knn_strategy
        from ..ops.knn import EXACT_MAX_REFS

        if self.n_edges <= EXACT_MAX_REFS:
            return "exact"
        if self.device.platform == "cpu":
            # exact blockwise scan: approx_min_k has no fast CPU lowering
            # and interpret-mode pallas is test-only speed.
            return "chunked"
        # TPU tiers: the fused Pallas bin-fold kernel beats the one-shot
        # PartialReduce path (2.13 vs 3.19 ms at the 100K bench workload,
        # better recall) while its structural gates hold; the compile
        # probe tiers down to 'approx' if Mosaic rejects the kernel
        # (reference PyKeOps-probe pattern, embedder_pytorch.py:247-258).
        from ..ops import knn_binfold as bf

        k_eff = min(self.n_neighbors + 1, max(self.n_edges, 1))
        if (
            self.device.platform == "tpu"
            and self.n_components <= bf.MAX_DIM
            and k_eff <= bf.MAX_K
            and self.n_edges < bf.MAX_REFS_SEGMENTED
            and bf.probe(self.n_components, self.sample_size, k_eff,
                         self.knn_recall_target)
        ):
            return "binfold"
        # approx (PartialReduce) with bf16 distances — the cuVS-ANN-tier
        # analog and the fallback when binfold is gated out.
        return "approx"

    # ------------------------------------------------------------------ #
    # the jitted layout step
    # ------------------------------------------------------------------ #

    def _build_step(self):
        strategy = self._resolved_strategy()
        chunk = self.batch_size
        S = self.sample_size
        E = self.n_edges
        k = self.n_neighbors
        k_attr, L_min, k_inter = self.k_attr, self.L_min, self.k_inter
        edges = self.edges
        nb, nb_overflow = self._nb, self._nb_overflow

        # k+1 neighbors are requested (self column dropped, reference :421)
        # but never more than there are edges — the reference crashes on
        # graphs with fewer than n_neighbors+1 edges (torch.topk k>size);
        # we clamp instead.
        k_eff = min(k + 1, E)

        # Fused-gather path: reuse the spring neighbor-table gather as the
        # kNN midpoint reference set (ops/forces.py
        # midpoint_refs_from_gathered) — removes the step's second
        # full-edge HBM gather. Worth it only while the slot-table padding
        # overhead is bounded (near-regular graphs); heavily skewed tables
        # would inflate the kNN reference count past the gather saving.
        knn_dtype = self.knn_compute_dtype
        if (knn_dtype is None and strategy == "approx"
                and self.device.platform == "tpu"):
            knn_dtype = jnp.bfloat16
        recall = self.knn_recall_target
        n_ref_slots = int(nb["ref_edge"].shape[0])
        overflow_lt = (
            jnp.asarray(nb["overflow_lt"])
            if len(nb["overflow_lt"]) else None
        )
        if self.fused_midpoints is None:
            from ..ops.knn import oneshot_budget_bytes
            from ..ops.knn_binfold import (
                MAX_REFS_SEGMENTED as BINFOLD_MAX_REFS,
            )

            # auto: only while the padded slot count stays bounded AND the
            # enlarged reference set still fits the strategy's budget —
            # for 'approx', the one-shot (S, E) buffer (falling off the
            # one-shot path onto the blockwise scan costs far more than
            # the midpoint gather saves); for 'binfold', only the fp32
            # index-lane bound (the kernel never materializes (S, E)).
            if strategy == "binfold":
                budget_ok = n_ref_slots < BINFOLD_MAX_REFS
            else:
                budget_ok = S * n_ref_slots * 4 <= oneshot_budget_bytes()
            fused_refs = (
                strategy in ("approx", "binfold")
                and E > 0
                and n_ref_slots <= 4 * E
                and budget_ok
            )
        else:
            fused_refs = bool(self.fused_midpoints) and E > 0
        self._fused_refs_active = fused_refs

        # Big graph-shaped arrays ride as jit ARGUMENTS, not closure
        # constants: a closed-over (n, D) neighbor table embeds tens of MB
        # of literals in the jaxpr, and trace+lower alone then costs
        # minutes at the 1M tier even with a warm XLA compile cache
        # (measured on the Chebyshev init: 452 s trace+lower with the
        # table as a constant vs seconds as an argument —
        # experiments/cheb_bisect.py). Static ints (n, ref_cap) stay in
        # the closure; raw_step re-merges them into the nb dict the
        # forces helpers expect.
        binned = "buckets" in nb
        slot_order = nb.get("ref_order") == "slot"
        # Lane-packed slot gathers (ops/forces.py PACKED_GATHER_G note):
        # auto on TPU slot paths from PACKED_GATHER_MIN_N vertices.
        if self.packed_gather is None:
            use_packed = (
                slot_order
                and self._ref_order_platform() == "tpu"
                and PACKED_GATHER_MIN_N <= self.n < PACKED_GATHER_MAX_N
            )
        else:
            use_packed = bool(self.packed_gather) and slot_order
        self._packed_gather_active = use_packed
        packed_g = _packed_gather_g(self.n)
        step_ops = {
            "nb": {
                k_: v_ for k_, v_ in nb.items()
                if k_ in ("ref_edge", "ref_valid", "edge_ref")
                or (k_ in ("table", "table_t") and not binned)
            },
            "edges": edges,
        }
        if binned:
            # per-bucket tables ride as a jit-argument list; the bucket
            # geometry (starts/caps) stays static in the closure
            step_ops["tables"] = [
                g["table_t" if slot_order else "table"]
                for g in nb["buckets"]
            ]
            step_ops["edge_order"] = jnp.asarray(
                nb["edge_user"], jnp.int32
            )
        ov_plan = nb.get("overflow_plan")
        if ov_plan is not None:
            # plan arrays are jit arguments; the block size is static
            step_ops["ov_plan"] = {
                "pairs": jnp.asarray(ov_plan["pairs"]),
                "block_hub": jnp.asarray(ov_plan["block_hub"]),
                "hub_ids": jnp.asarray(ov_plan["hub_ids"]),
            }
        elif nb_overflow is not None:
            step_ops["nb_overflow"] = nb_overflow
        if overflow_lt is not None:
            step_ops["overflow_lt"] = overflow_lt
        nb_static = {"n": nb["n"]}
        if not binned:
            nb_static["ref_cap"] = nb["ref_cap"]
        self._step_ops = step_ops

        def raw_step(positions, sampled_indices, ops):
            nb_rt = {**ops["nb"], **nb_static}
            plan_rt = (
                {**ops["ov_plan"], "block": ov_plan["block"]}
                if "ov_plan" in ops else None
            )
            refs_sw = None
            if slot_order:
                # per-slot 2D gathers shared between the spring fold and
                # the midpoint ref set — no cap-minor temps (see
                # SLOT_REF_ORDER_MIN_N)
                want_refs = fused_refs and k_eff > 1
                packed = (
                    pack_positions(positions, packed_g)
                    if use_packed else None
                )
                if binned:
                    spring, refs_sw = spring_refs_binned_slotwise(
                        positions, ops["tables"], nb, k_attr, L_min,
                        ref_valid=nb_rt["ref_valid"],
                        overflow_lt=ops.get("overflow_lt"),
                        overflow_edges=ops.get("nb_overflow"),
                        overflow_plan=plan_rt, want_refs=want_refs,
                        packed=packed,
                    )
                else:
                    spring, refs_sw = spring_refs_slotwise(
                        positions, nb_rt["table_t"], nb_rt, k_attr, L_min,
                        ref_valid=nb_rt["ref_valid"],
                        overflow_lt=ops.get("overflow_lt"),
                        overflow_edges=ops.get("nb_overflow"),
                        overflow_plan=plan_rt, want_refs=want_refs,
                        packed=packed,
                    )
            elif binned:
                pn_list = [positions[t] for t in ops["tables"]]
                spring = spring_forces_binned(
                    positions, pn_list, nb, k_attr, L_min,
                    ops.get("nb_overflow"), plan_rt,
                )
            else:
                pn = positions[nb_rt["table"]]
                spring = spring_forces_from_gathered(
                    positions, pn, nb_rt, k_attr, L_min,
                    ops.get("nb_overflow"), plan_rt,
                )
            if k_eff > 1:
                if fused_refs:
                    if slot_order:
                        refs = refs_sw
                    elif binned:
                        refs = midpoint_refs_binned(
                            positions, pn_list,
                            {**nb, "ref_valid": nb_rt["ref_valid"]},
                            ops.get("overflow_lt"),
                        )
                    else:
                        refs = midpoint_refs_from_gathered(
                            positions, pn, nb_rt, ops.get("overflow_lt")
                        )
                    queries = refs[nb_rt["edge_ref"][sampled_indices]]
                    slot_idx, _ = knn(
                        queries, refs, k_eff,
                        strategy=strategy, chunk_size=chunk,
                        compute_dtype=knn_dtype, recall_target=recall,
                    )
                    knn_idx = nb_rt["ref_edge"][slot_idx[:, 1:]]  # drop self
                else:
                    midpoints = (
                        positions[ops["edges"][:, 0]]
                        + positions[ops["edges"][:, 1]]
                    ) / 2.0
                    knn_idx, _ = knn(
                        midpoints[sampled_indices], midpoints, k_eff,
                        strategy=strategy, chunk_size=chunk,
                        compute_dtype=knn_dtype, recall_target=recall,
                    )
                    knn_idx = knn_idx[:, 1:]  # drop self column
                inter = intersection_forces(
                    positions, ops["edges"], knn_idx, sampled_indices,
                    k_inter, edge_order=ops.get("edge_order"),
                )
            else:
                # a single edge has no neighbor edges to intersect
                inter = jnp.zeros_like(positions)
            new_positions = positions + spring + inter
            new_positions = new_positions - jnp.mean(
                new_positions, axis=0, keepdims=True
            )
            std = jnp.std(new_positions, axis=0, keepdims=True, ddof=1) + EPS
            return new_positions / std

        from ..ops.sampling import sample_indices

        def sample(key):
            return sample_indices(key, E, S)

        # NOTE: num_steps stays STATIC. A traced (dynamic) trip count would
        # compile once for all block sizes, but the resulting while-loop
        # program measured >25 min to compile at the 100K tier on this
        # toolchain vs ~3 min for the static fori — a bad trade.
        @partial(jax.jit, donate_argnums=(0,))
        def step(positions, key, ops):
            key, sub = jax.random.split(key)
            return raw_step(positions, sample(sub), ops), key

        @partial(jax.jit, static_argnames=("num_steps",), donate_argnums=(0,))
        def multi_step(positions, key, ops, num_steps):
            def body(_, carry):
                positions, key = carry
                key, sub = jax.random.split(key)
                return raw_step(positions, sample(sub), ops), key

            return jax.lax.fori_loop(0, num_steps, body, (positions, key))

        self._raw_step = jax.jit(raw_step)
        self._multi_step = multi_step
        return step

    # ------------------------------------------------------------------ #
    # public API (mirrors the reference engine surface)
    # ------------------------------------------------------------------ #

    @staticmethod
    def _host_value(x):
        """Device array -> host numpy, multi-host aware.

        A multi-process REPLICATED array is not fully addressable, but
        every process holds the full value in each local shard.
        """
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
            x = x.addressable_data(0)
        return np.asarray(x)

    def _place_state(self, value, dtype):
        """Host array -> device array for engine state (positions, key).

        ShardedGraphEmbedder overrides this to produce globally-replicated
        arrays on multi-process meshes.
        """
        with jax.default_device(self.device):
            return jnp.asarray(value, dtype)

    @property
    def positions(self):
        """Positions as a host numpy array (reference :324-327).

        Always in USER vertex order; the degree-binned engine's internal
        renumbering is undone here (host-side fancy index, off the hot
        path).
        """
        pos = self._host_value(self._positions)
        if self._perm is not None:
            pos = pos[self._inv_perm]
        return pos

    @positions.setter
    def positions(self, value):
        value = np.asarray(value)
        if self._perm is not None:
            value = value[self._perm]
        self._positions = self._place_state(value, self.dtype)

    def get_positions(self):
        """Positions as a numpy array."""
        return self.positions

    def update_positions(self, sample_indices=None):
        """Run one layout iteration.

        sample_indices : optional (S,) int array — inject the midpoint sample
        (parity-testing hook; SURVEY.md §7.1.4). When None, the sample is
        drawn from the embedder's jax.random key stream.
        """
        if self.n_edges == 0:
            return
        if sample_indices is not None:
            sample_indices = np.asarray(sample_indices)
            if self._edge_map is not None:
                # injected samples speak USER edge ids; the binned engine
                # renumbers edges internally
                sample_indices = self._edge_map[sample_indices]
            self._positions = self._raw_step(
                self._positions, jnp.asarray(sample_indices, jnp.int32),
                self._step_ops,
            )
        else:
            self._positions, self._key = self._step(
                self._positions, self._key, self._step_ops
            )
        self._iteration += 1

    def run_layout(self, num_iterations=100, block_size=10,
                   progress=False):
        """Run the force-directed layout.

        Iterations execute on-device in fused blocks of ``block_size`` (one
        XLA dispatch per block) with progress logged between blocks; the
        final positions are returned as numpy.

        progress : bool — show a tqdm progress bar (reference
        embedder_pytorch.py:825 wraps the loop in tqdm). The bar
        advances per BLOCK, not per iteration: a per-iteration bar
        would force one host sync per step and serialize the fused
        dispatches the engine's throughput comes from.
        """
        if self.verbose:
            self.logger.info("Running layout for %d iterations", num_iterations)
        if block_size < 1:
            raise ValueError(f"block_size must be >= 1, got {block_size}")
        if self.n_edges == 0:
            return self.positions

        bar = None
        if progress:
            try:
                from tqdm import tqdm

                bar = tqdm(total=num_iterations, desc="layout",
                           unit="iter")
            except ImportError:
                pass
        done = 0
        while done < num_iterations:
            n = min(block_size, num_iterations - done)
            self._positions, self._key = self._multi_step(
                self._positions, self._key, self._step_ops, num_steps=n
            )
            done += n
            self._iteration += n
            if bar is not None:
                # sync so the bar tracks real device progress, not the
                # async dispatch queue
                jax.block_until_ready(self._positions)
                bar.update(n)
            if self.verbose:
                self.logger.info(
                    "Completed iteration %d/%d", done, num_iterations
                )
        if bar is not None:
            bar.close()
        jax.block_until_ready(self._positions)
        return self.positions

    def save_checkpoint(self, path):
        """Save layout state (positions, RNG key, iteration) to an .npz.

        New capability vs the reference (SURVEY.md §5.4): long multi-chip
        runs can stop and resume exactly. The graph itself is not saved —
        reconstruct the embedder from the same adjacency, then
        ``load_checkpoint``.
        """
        np.savez(
            path,
            positions=self.positions,
            key=self._host_value(self._key),
            iteration=self._iteration,
            n=self.n,
            n_components=self.n_components,
            n_edges=self.n_edges,
        )

    def load_checkpoint(self, path):
        """Restore layout state saved by ``save_checkpoint``.

        Validates that the checkpoint matches this embedder's graph shape;
        raises ValueError on mismatch.
        """
        data = np.load(path)
        if int(data["n"]) != self.n or int(data["n_edges"]) != self.n_edges:
            raise ValueError(
                f"Checkpoint graph mismatch: checkpoint has n={int(data['n'])}"
                f"/E={int(data['n_edges'])}, embedder has n={self.n}"
                f"/E={self.n_edges}"
            )
        if int(data["n_components"]) != self.n_components:
            raise ValueError(
                f"Checkpoint n_components={int(data['n_components'])} != "
                f"{self.n_components}"
            )
        # checkpoints store USER-order positions; the setter re-applies
        # the internal renumbering when the binned engine is active
        self.positions = data["positions"]
        self._key = self._place_state(data["key"], jnp.uint32)
        self._iteration = int(data["iteration"])

    def display_layout(self, edge_width=1, node_size=3, node_colors=None):
        """Plotly 2D/3D scatter of the embedding (reference :846-969).

        Requires plotly; raises ImportError with guidance if missing.
        """
        from ..visualization import plot_layout

        plot_layout(
            self.positions,
            self._edges_np,
            edge_width=edge_width,
            node_size=node_size,
            node_colors=node_colors,
        )

    def __repr__(self):
        return (
            f"GraphEmbedderTPU(n_vertices={self.n}, "
            f"n_components={self.n_components}, device={self.device}, "
            f"knn_strategy={self._resolved_strategy()!r})"
        )
