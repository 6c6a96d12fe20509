"""Pallas RDMA kNN ring (parallel/ring_binfold.py) on the CPU mesh.

The kernel runs in TPU-interpret mode here (the same mode its RDMA
protocol was race-checked under, experiments/ring_binfold_proto.py);
a real-TPU compile+run check lives in
experiments/ring_pallas_tpu_check.py (measured: zero drift vs the
all_gather merge at 1 device).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.parallel import build_sharded_step, make_mesh
from graphem_rapids_tpu.parallel.ring_binfold import (
    _geometry,
    ring_binfold_topk,
    ring_supported,
)
from graphem_rapids_tpu.parallel.sharded_step import pad_edges

pytestmark = pytest.mark.multichip


def _bin_model_truth(q, refs, k, ndev, R_pad, T, G):
    """Numpy simulation of the kernel's bin semantics: global id
    dev*R_pad + p, bin key ((p // T) % G)*128 + p%128 on local p."""
    S = len(q)
    E = len(refs)
    E_loc = E // ndev
    d2 = ((q[:, None, :] - refs[None, :, :]) ** 2).sum(-1)
    dev = np.arange(E) // E_loc
    p = np.arange(E) % E_loc
    bins = ((p // T) % G) * 128 + (p % 128)
    gid = dev * R_pad + p
    nb = G * 128
    bv = np.full((S, nb), np.inf, np.float32)
    bi = np.zeros((S, nb), np.int64)
    for b in range(nb):
        cols = np.flatnonzero(bins == b)
        if len(cols):
            j = cols[np.argmin(d2[:, cols], axis=1)]
            bv[:, b] = d2[np.arange(S), j]
            bi[:, b] = gid[j]
    order = np.argsort(bv, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(bi, order, axis=1)


@pytest.mark.parametrize("ndev,S,E,k", [(8, 64, 8 * 2048, 9),
                                        (4, 50, 4 * 2048, 6),
                                        (1, 16, 2048, 5)])
def test_ring_binfold_matches_bin_model(ndev, S, E, k):
    """The RDMA ring's merged top-k equals the numpy bin-model ground
    truth exactly — the ring order and the RDMA protocol introduce no
    deviation beyond the binfold bin semantics themselves."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    axis, dim = "x", 3
    rng = np.random.default_rng(1)
    q = rng.standard_normal((S, dim)).astype(np.float32)
    refs = rng.standard_normal((E, dim)).astype(np.float32)
    E_loc = E // ndev
    mesh = Mesh(np.array(jax.devices()[:ndev]), (axis,))

    def body(q_all, refs_all):
        i = jax.lax.axis_index(axis)
        r = jax.lax.dynamic_slice(refs_all, (i * E_loc, 0), (E_loc, dim))
        v, ix, _ = ring_binfold_topk(q_all, r, k, ndev=ndev,
                                     axis_name=axis)
        return v, ix

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P(), P()),
                               out_specs=(P(), P()), check_vma=False))
    _, idx = fn(q, refs)
    idx = np.asarray(idx)
    T, G, _, R_pad, _, _, _ = _geometry(E_loc, S, ndev, k, 0.95)
    gt = _bin_model_truth(q, refs, k, ndev, R_pad, T, G)
    match = np.mean([set(a) == set(b) for a, b in zip(idx, gt)])
    assert match == 1.0, match


def test_ring_pallas_step_recall():
    """knn_comm='ring_pallas' through the full sharded step: merged
    neighbor recall vs exact ground truth meets the binfold model."""
    n, k, S = 600, 8, 128
    adj = gr.generate_random_regular(n=n, d=8, seed=3)
    rows, cols = adj.nonzero()
    mask = rows < cols
    edges = np.column_stack([rows[mask], cols[mask]]).astype(np.int64)
    E = len(edges)
    mesh = make_mesh(4)
    from graphem_rapids_tpu.ops.forces import build_neighbor_table

    nb = build_neighbor_table(edges, n)
    pos = np.random.default_rng(1).standard_normal((n, 3)).astype(
        np.float32
    )
    edges_p, valid = pad_edges(edges, 4)
    for kw in ({}, dict(fused_refs=True, nb=nb)):
        step, _, ops = build_sharded_step(
            mesh, n, E, n_components=3, k_attr=0.2, L_min=1.0,
            k_inter=0.5, n_neighbors=k, sample_size=S,
            knn_comm="ring_pallas", _debug_knn=True, **kw,
        )
        (knn_idx, sampled), _ = step(
            jnp.asarray(pos), jnp.asarray(edges_p), jnp.asarray(valid),
            jax.random.PRNGKey(0), ops,
        )
        knn_idx, sampled = np.asarray(knn_idx), np.asarray(sampled)
        mids = (pos[edges[:, 0]] + pos[edges[:, 1]]) / 2.0
        d2 = ((mids[sampled][:, None, :] - mids[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=1)[:, :k + 2]
        recalls = [
            len(set(sel) & set([j for j in row if j != s][:k])) / k
            for sel, row, s in zip(knn_idx, order, sampled)
        ]
        # binfold structural recall model (~0.96 expected at these bins)
        assert np.mean(recalls) > 0.9, np.mean(recalls)


def test_ring_pallas_embedder_runs():
    from graphem_rapids_tpu.parallel import ShardedGraphEmbedder

    adj = gr.erdos_renyi_graph(200, 0.05, seed=0)
    emb = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(4), seed=0, verbose=False,
        sample_size=64, n_neighbors=5, knn_comm="ring_pallas",
    )
    pos = emb.run_layout(num_iterations=3)
    assert np.isfinite(pos).all()


def test_ring_supported_bounds():
    assert ring_supported(4096, 128, 4, 9)
    # index lanes past 2^24 refuse
    assert not ring_supported(3_000_000, 128, 8, 9)
    # carries past the VMEM budget route to the HBM kernel (see
    # test_ring_supported_hbm_extension below)
    assert _geometry(4096, 8192, 2, 48, 0.95)[-1] is True


# ---------------------------------------------------------------------- #
# HBM-carry variant (_kernel_hbm): carries beyond the VMEM budget ride
# ANY/HBM space with per-group chunked read-merge-write (VERDICT r2
# weak #3 — S=512 used to refuse below ndev=4).
# ---------------------------------------------------------------------- #


@pytest.mark.parametrize("ndev,S,E,k", [(8, 64, 8 * 2048, 9),
                                        (4, 50, 4 * 2048, 6),
                                        (2, 40, 2 * 2048, 5),
                                        (1, 16, 2048, 5)])
def test_ring_binfold_hbm_matches_bin_model(monkeypatch, ndev, S, E, k):
    """With the VMEM budget forced to zero every geometry routes to the
    HBM-carry kernel; its merged top-k must equal the numpy bin model
    exactly, like the VMEM kernel."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from graphem_rapids_tpu.parallel import ring_binfold as rb

    monkeypatch.setattr(rb, "_VMEM_BUDGET", 0)
    axis, dim = "x", 3
    rng = np.random.default_rng(1)
    q = rng.standard_normal((S, dim)).astype(np.float32)
    refs = rng.standard_normal((E, dim)).astype(np.float32)
    E_loc = E // ndev
    assert _geometry(E_loc, S, ndev, k, 0.95)[-1] is True  # hbm path
    mesh = Mesh(np.array(jax.devices()[:ndev]), (axis,))

    def body(q_all, refs_all):
        i = jax.lax.axis_index(axis)
        r = jax.lax.dynamic_slice(refs_all, (i * E_loc, 0), (E_loc, dim))
        v, ix, _ = ring_binfold_topk(q_all, r, k, ndev=ndev,
                                     axis_name=axis)
        return v, ix

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P(), P()),
                               out_specs=(P(), P()), check_vma=False))
    _, idx = fn(q, refs)
    idx = np.asarray(idx)
    T, G, _, R_pad, _, _, _ = _geometry(E_loc, S, ndev, k, 0.95)
    gt = _bin_model_truth(q, refs, k, ndev, R_pad, T, G)
    match = np.mean([set(a) == set(b) for a, b in zip(idx, gt)])
    assert match == 1.0, match


def test_ring_binfold_hbm_race_free(monkeypatch):
    """Interpret-mode happens-before race detector over the HBM-carry
    protocol (per-group chunk DMAs + RDMA rotation + flow control)."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from jax._src.pallas.mosaic.interpret import interpret_pallas_call \
        as ipc
    from graphem_rapids_tpu.parallel import ring_binfold as rb

    monkeypatch.setattr(rb, "_VMEM_BUDGET", 0)
    axis, dim, ndev, S, k = "x", 3, 4, 48, 6
    E = ndev * 2048
    E_loc = E // ndev
    rng = np.random.default_rng(2)
    q = rng.standard_normal((S, dim)).astype(np.float32)
    refs = rng.standard_normal((E, dim)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:ndev]), (axis,))
    params = pltpu.InterpretParams(
        dma_execution_mode="on_wait", detect_races=True
    )

    def body(q_all, refs_all):
        i = jax.lax.axis_index(axis)
        r = jax.lax.dynamic_slice(refs_all, (i * E_loc, 0), (E_loc, dim))
        v, ix, _ = ring_binfold_topk(q_all, r, k, ndev=ndev,
                                     axis_name=axis, interpret=params)
        return v, ix

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P(), P()),
                               out_specs=(P(), P()), check_vma=False))
    v, idx = fn(q, refs)
    jax.block_until_ready(v)
    assert np.isfinite(np.asarray(v)).all()
    assert ipc.races is None or not ipc.races.races_found


def test_ring_supported_hbm_extension():
    """The old VMEM refusal shapes are now supported (HBM carry); only
    the fp32 index-lane bound still refuses."""
    # S=512 at ndev=2 was the BASELINE.md "refuses by design" shape
    assert ring_supported(4096, 512, 2, 16)
    assert ring_supported(4096, 8192, 2, 48)  # old VMEM-refused case
    assert not ring_supported(3_000_000, 128, 8, 9)  # index lanes
