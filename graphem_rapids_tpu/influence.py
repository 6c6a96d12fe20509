"""Influence maximization (reference graphem_rapids/influence.py).

Seed selection by embedding radius, plus Independent-Cascade influence
scoring. The reference scores with NDlib's pure-Python Monte-Carlo
simulator; here the primary engine is the vectorized JAX IC simulator
(ops/ic_sim.py) so greedy selection evaluates ALL candidate nodes of a round
in one batched device call. NDlib is used transparently for parity when it
is installed (SURVEY.md §2.3).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ops.ic_sim import _ic_run, independent_cascade

try:  # optional parity dependency
    import ndlib.models.ModelConfig as _mc
    import ndlib.models.epidemics as _ep

    _NDLIB_AVAILABLE = True
except ImportError:  # pragma: no cover
    _NDLIB_AVAILABLE = False


def _as_edges_and_n(G):
    """Accept a networkx graph, scipy adjacency, or (edges, n) tuple."""
    import networkx as nx
    import scipy.sparse as sp

    if isinstance(G, nx.Graph):
        n = G.number_of_nodes()
        edges = np.asarray(list(G.edges()), np.int64).reshape(-1, 2)
        return edges, n
    if sp.issparse(G):
        rows, cols = G.nonzero()
        mask = rows < cols
        return np.column_stack([rows[mask], cols[mask]]), G.shape[0]
    edges, n = G
    return np.asarray(edges), n


def graphem_seed_selection(embedder, k, num_iterations=20):
    """Run the layout, then pick the k nodes with the largest radial
    distance from the origin (reference influence.py:10-37)."""
    embedder.run_layout(num_iterations=num_iterations)
    positions = np.asarray(embedder.positions)
    radial_distances = np.linalg.norm(positions, axis=1)
    seeds = np.argsort(-radial_distances)[:k]
    return seeds.tolist()


def ndlib_estimated_influence(G, seeds, p=0.1, iterations_count=200,
                              key=None):
    """IC influence estimate with the reference's NDlib semantics
    (influence.py:40-84): returns (influenced_count, iterations).

    Uses NDlib when installed; otherwise falls back to the JAX simulator
    (single stochastic run to match NDlib's one-trajectory behavior).
    ``key`` seeds the fallback simulator (default PRNGKey(0), matching the
    package's explicit-key RNG discipline); NDlib itself draws from global
    RNG state exactly as the reference does.
    """
    if _NDLIB_AVAILABLE:
        import networkx as nx

        if not isinstance(G, nx.Graph):
            edges, n = _as_edges_and_n(G)
            H = nx.Graph()
            H.add_nodes_from(range(n))
            H.add_edges_from(edges)
            G = H
        model = _ep.IndependentCascadesModel(G)
        config = _mc.Configuration()
        for e in G.edges():
            config.add_edge_configuration("threshold", e, p)
        model.set_initial_status(config)
        for seed in seeds:
            config.add_node_configuration("status", seed, 1)
        iterations = model.iteration_bunch(iterations_count)
        final_status = iterations[-1]["status"]
        influenced = sum(1 for s in final_status.values() if s == 2)
        return influenced, len(iterations)

    edges, n = _as_edges_and_n(G)
    counts, iters = independent_cascade(
        edges, n, seeds, p=p, num_sims=1, max_iters=iterations_count,
        key=key if key is not None else jax.random.PRNGKey(0),
    )
    return int(counts[0]), iters


def estimated_influence(G, seeds, p=0.1, iterations_count=200, num_sims=64,
                        key=None):
    """Batched Monte-Carlo IC spread estimate (mean over num_sims runs).

    The TPU-native scoring path: one jitted batched cascade instead of
    num_sims sequential Python simulations.
    """
    edges, n = _as_edges_and_n(G)
    counts, _ = independent_cascade(
        edges, n, seeds, p=p, num_sims=num_sims, max_iters=iterations_count,
        key=key,
    )
    return float(np.mean(counts))


# Candidate-sweep dispatch bound: one greedy round is evaluated in
# host-level chunks of this many candidates so no single device dispatch
# runs for minutes (a full 10K-candidate sweep in ONE dispatch measured
# MINUTES on TPU and reproducibly crashed the remote worker — the
# watchdog restarts it; chunking keeps each dispatch seconds-long and
# one compile serves every chunk/round).
GREEDY_CAND_CHUNK = 1024


@partial(jax.jit, static_argnames=("num_sims", "max_iters"))
def _batched_marginal(src, dst, base_mask, p, key, cand_ids, num_sims,
                      max_iters):
    """Evaluate IC spread for base_mask + each candidate in cand_ids.

    The (C,) candidate chunk shape is fixed across greedy rounds (the
    caller pads the tail chunk), so one compilation serves the whole
    selection.
    """
    n = base_mask.shape[0]

    def one(args):
        cand, key = args
        mask = base_mask.at[cand].set(True)
        return jnp.mean(
            _ic_run(src, dst, mask, p, key, n, num_sims, max_iters).astype(
                jnp.float32
            )
        )

    keys = jax.random.split(key, cand_ids.shape[0])
    gains = jax.lax.map(one, (cand_ids, keys))
    # a node already in the seed set adds nothing; force it out of argmax
    return jnp.where(base_mask[cand_ids], -jnp.inf, gains)


@partial(jax.jit, static_argnames=("num_sims", "max_iters"))
def _marginal_chunk_table(table, ov_dst, ov_src, base_mask, p, key,
                          cand_ids, num_sims, max_iters):
    """Marginal spreads for a candidate chunk on the GATHER simulator.

    C candidates x num_sims Monte-Carlo runs fold into ONE (n, C*s)
    cascade batch — the batch rides the gather's row width, so the
    whole chunk costs about one cascade's gather traffic
    (ops/ic_sim.py gather-formulation note)."""
    from .ops.ic_sim import _ic_run_table

    n = base_mask.shape[0]
    C = cand_ids.shape[0]
    seed = jnp.broadcast_to(base_mask[:, None], (n, C))
    seed = seed.at[cand_ids, jnp.arange(C)].set(True)
    seed = jnp.repeat(seed, num_sims, axis=1)            # (n, C*s)
    counts = _ic_run_table(
        table, ov_dst, ov_src, seed, p, key, C * num_sims, max_iters
    )
    gains = counts.reshape(C, num_sims).mean(axis=1)
    return jnp.where(base_mask[cand_ids], -jnp.inf, gains)


def greedy_seed_selection(G, k, p=0.1, iterations_count=200, num_sims=32,
                          seed=0):
    """Greedy marginal-gain seed selection (reference influence.py:87-128).

    The O(k * n) candidate sweep the reference runs in pure Python is
    evaluated on device: candidates x Monte-Carlo runs fold into one
    (n, C*s) batched cascade per chunk on the GATHER IC simulator
    (ops/ic_sim.py), and rounds after the first use batched CELF lazy
    re-evaluation (marginal gains are submodular upper bounds, so only
    the top of the stale ranking needs re-simulation — the standard
    Leskovec et al. optimization, chunk-batched for the device).

    Returns (seeds list, total simulated cascades).
    """
    from .ops.ic_sim import build_cascade_plan

    edges, n = _as_edges_and_n(G)
    edges = np.asarray(edges, np.int32)
    key = jax.random.PRNGKey(seed)
    plan = build_cascade_plan(edges, n)
    if plan is None:
        return _greedy_scatter(
            edges, n, k, p, iterations_count, num_sims, key
        )

    cap = plan["table"].shape[1]
    # chunk size bounded by the (n, cap, C*s) bool gather working set
    C = int(max(1, min(
        64, n, (1 << 31) // max(n * cap * num_sims, 1)
    )))
    n_pad = -(-n // C) * C
    cand_all = np.zeros(n_pad, np.int32)
    cand_all[:n] = np.arange(n, dtype=np.int32)

    def eval_chunk(cands_np, base_mask, sub):
        return np.asarray(_marginal_chunk_table(
            plan["table"], plan["ov_dst"], plan["ov_src"], base_mask,
            float(p), sub, jnp.asarray(cands_np),
            int(num_sims), int(iterations_count),
        ))

    seeds = []
    total_evals = 0
    base_mask = jnp.zeros(n, bool)
    gains = np.full(n_pad, -np.inf, np.float32)
    key, sub = jax.random.split(key)
    for c0 in range(0, n_pad, C):
        sub, subc = jax.random.split(sub)
        gains[c0:c0 + C] = eval_chunk(cand_all[c0:c0 + C], base_mask, subc)
    gains = gains[:n]
    total_evals += n * num_sims
    fresh = np.ones(n, bool)

    while len(seeds) < k:
        order = np.argsort(-gains)
        top = int(order[0])
        if fresh[top]:
            seeds.append(top)
            base_mask = base_mask.at[top].set(True)
            gains[top] = -np.inf
            fresh[:] = False
            continue
        # batched CELF: re-evaluate the C highest stale candidates
        stale_top = order[~fresh[order]][:C]
        batch = np.zeros(C, np.int32)
        batch[:len(stale_top)] = stale_top
        key, sub = jax.random.split(key)
        vals = eval_chunk(batch, base_mask, sub)
        gains[stale_top] = vals[:len(stale_top)]
        fresh[stale_top] = True
        total_evals += len(stale_top) * num_sims
    return seeds, total_evals


def _greedy_scatter(edges, n, k, p, iterations_count, num_sims, key):
    """Fallback full-sweep greedy on the scatter simulator (graphs whose
    in-neighbor table exceeds the gather budget)."""
    src = jnp.asarray(np.concatenate([edges[:, 0], edges[:, 1]]))
    dst = jnp.asarray(np.concatenate([edges[:, 1], edges[:, 0]]))
    seeds = []
    total_evals = 0
    base_mask = jnp.zeros(n, bool)
    C = min(GREEDY_CAND_CHUNK, n)
    # fixed-shape candidate chunks; the tail is padded with candidate 0
    # (its duplicate gain is harmless — argmax sees id 0's real gain)
    n_pad = -(-n // C) * C
    cand_all = np.zeros(n_pad, np.int32)
    cand_all[:n] = np.arange(n, dtype=np.int32)
    for _ in range(k):
        key, sub = jax.random.split(key)
        gains = np.full(n_pad, -np.inf, np.float32)
        for c0 in range(0, n_pad, C):
            sub, subc = jax.random.split(sub)
            gains[c0:c0 + C] = np.asarray(
                _batched_marginal(
                    src, dst, base_mask, float(p), subc,
                    jnp.asarray(cand_all[c0:c0 + C]),
                    int(num_sims), int(iterations_count),
                )
            )
        best = int(np.argmax(gains[:n]))
        seeds.append(best)
        base_mask = base_mask.at[best].set(True)
        total_evals += (n - len(seeds) + 1) * num_sims
    return seeds, total_evals
