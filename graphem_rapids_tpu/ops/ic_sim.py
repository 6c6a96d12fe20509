"""Vectorized Independent-Cascade simulation in JAX.

The reference scores influence with NDlib's pure-Python Monte-Carlo
IndependentCascadesModel (graphem_rapids/influence.py:40-84), one run at a
time. Here the simulator is a jitted, batched frontier propagation: all
Monte-Carlo runs advance together as (num_sims, n) state arrays, with
per-edge Bernoulli activation attempts scattered through a segment-max —
so spread estimation runs on the TPU at thousands of simulations per batch.

Semantics match IC: when a node first activates, it gets exactly one chance
to activate each currently-inactive neighbor with probability p; the process
runs until the frontier is empty. The reported spread counts all activated
nodes (NDlib counts state==2 at termination, which equals the activated set
once the cascade has finished; reference influence.py:78-84).

Two frontier-update formulations:

- GATHER (``_ic_run_table`` — the default): the same scatter->gather
  rewrite the spring pass uses (ops/forces.py): a self-padded in-neighbor
  table turns the per-step activation test into ``frontier[table]`` — a
  dense gather + fused coin mask + row-any — with the few above-cap hub
  edges handled by a small sorted segment-max. State rides (n, B) with
  the Monte-Carlo batch as the MINOR axis, so the gather reads B-wide
  rows (the per-row gather cost is ~width-independent on TPU, BASELINE
  r5 probes) and the batch is effectively free. This is what makes
  greedy selection affordable at n=10K+: the scatter formulation's
  per-step ``.at[:, dst].max`` over 2E rows measured MINUTES per
  1024-candidate sweep and reproducibly crashed the remote TPU worker.
- SCATTER (``_ic_run`` — fallback): per-edge attempts folded with a
  segment-max. Kept for graphs whose in-neighbor table would not fit
  (n * cap beyond ``TABLE_BUDGET_SLOTS``; the cap cost model bounds cap,
  so this is only hit at extreme n).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .forces import _optimal_table_cap

# beyond this many table slots the gather formulation's memory cost
# stops paying for itself; fall back to the scatter path
TABLE_BUDGET_SLOTS = 1 << 27


@partial(jax.jit, static_argnames=("n", "num_sims", "max_iters"))
def _ic_run(src, dst, seed_mask, p, key, n, num_sims, max_iters):
    """Batched IC cascade.

    src, dst : (2E,) int32 directed edge endpoints (both directions of each
               undirected edge).
    seed_mask: (n,) bool initial active set.
    Returns (num_sims,) int32 final activated counts.
    """
    active0 = jnp.broadcast_to(seed_mask, (num_sims, n))
    frontier0 = active0

    def cond(state):
        _, frontier, _, it = state
        return (it < max_iters) & jnp.any(frontier)

    def body(state):
        active, frontier, key, it = state
        key, sub = jax.random.split(key)
        # One activation attempt per (sim, directed edge) where the source
        # is in the current frontier.
        coin = jax.random.uniform(sub, (num_sims, src.shape[0])) < p
        attempt = frontier[:, src] & coin
        hit = (
            jnp.zeros((num_sims, n), jnp.int32)
            .at[:, dst]
            .max(attempt.astype(jnp.int32))
        )
        newly = (hit > 0) & ~active
        return active | newly, newly, key, it + 1

    active, _, _, _ = jax.lax.while_loop(
        cond, body, (active0, frontier0, key, jnp.int32(0))
    )
    return jnp.sum(active, axis=1)


def build_cascade_plan(edges, n):
    """Self-padded in-neighbor table + hub overflow for the gather IC.

    Returns None when the table would exceed TABLE_BUDGET_SLOTS, else a
    dict with 'table' (n, cap) int32 (row v = in-neighbors of v, padded
    with v — a self-slot can never create a new activation because
    ``newly = hit & ~active`` and v's own frontier bit implies active),
    'ov_dst'/'ov_src' (O,) int32 sorted by dst (above-cap hub edges).
    """
    edges = np.asarray(edges, np.int64)
    src2 = np.concatenate([edges[:, 0], edges[:, 1]]).astype(np.int32)
    dst2 = np.concatenate([edges[:, 1], edges[:, 0]]).astype(np.int32)
    deg_in = np.bincount(dst2, minlength=n)
    cap = max(1, _optimal_table_cap(deg_in, n))
    if n * cap > TABLE_BUDGET_SLOTS:
        return None
    order = np.argsort(dst2, kind="stable")
    d_s, s_s = dst2[order], src2[order]
    starts = np.concatenate([[0], np.cumsum(deg_in)[:-1]]).astype(np.int64)
    rank = np.arange(len(d_s), dtype=np.int64) - starts[d_s]
    in_t = rank < cap
    table = np.repeat(np.arange(n, dtype=np.int32)[:, None], cap, axis=1)
    table[d_s[in_t], rank[in_t]] = s_s[in_t]
    return {
        "table": jnp.asarray(table),
        "ov_dst": jnp.asarray(d_s[~in_t]),
        "ov_src": jnp.asarray(s_s[~in_t]),
    }


@partial(jax.jit, static_argnames=("num_sims", "max_iters"))
def _ic_run_table(table, ov_dst, ov_src, seed_mask, p, key, num_sims,
                  max_iters):
    """Gather-formulation batched IC cascade; state (n, B) bool.

    seed_mask: (n,) or (n, B) bool initial active set — the (n, B) form
    lets a greedy candidate sweep fold C candidates x s sims into one
    batch (each column its own seed set).
    Returns (B,) int32 final activated counts.
    """
    n, cap = table.shape
    O = ov_dst.shape[0]
    if seed_mask.ndim == 1:
        active0 = jnp.broadcast_to(seed_mask[:, None], (n, num_sims))
    else:
        active0 = seed_mask

    def cond(state):
        _, frontier, _, it = state
        return (it < max_iters) & jnp.any(frontier)

    def body(state):
        active, frontier, key, it = state
        key, k1, k2 = jax.random.split(key, 3)
        fr_nb = frontier[table]                        # (n, cap, B)
        coins = jax.random.uniform(k1, fr_nb.shape) < p
        hit = jnp.any(fr_nb & coins, axis=1)           # (n, B)
        if O:
            att = frontier[ov_src] & (
                jax.random.uniform(k2, (O, num_sims)) < p
            )
            hit_ov = jax.ops.segment_max(
                att.astype(jnp.int32), ov_dst, num_segments=n,
                indices_are_sorted=True,
            )
            hit = hit | (hit_ov > 0)
        newly = hit & ~active
        return active | newly, newly, key, it + 1

    active, _, _, _ = jax.lax.while_loop(
        cond, body, (active0, active0, key, jnp.int32(0))
    )
    return jnp.sum(active, axis=0)


def independent_cascade(edges, n, seeds, p=0.1, num_sims=64, max_iters=200,
                        key=None, plan=None):
    """Monte-Carlo IC spread for a seed set.

    Parameters
    ----------
    edges : (E, 2) int array — undirected edge list (i < j).
    n : int — number of vertices.
    seeds : sequence of int — initially active nodes.
    p : float — per-edge propagation probability.
    num_sims : int — Monte-Carlo batch size (all runs execute together).
    max_iters : int — cascade-depth cap (reference iterations_count analog).
    key : optional jax.random key.

    Returns
    -------
    (counts (num_sims,) np.ndarray of activated-node counts, iterations cap)
    """
    edges = np.asarray(edges, np.int32)
    seed_mask = np.zeros(n, bool)
    seed_mask[np.asarray(list(seeds), np.int64)] = True
    if key is None:
        key = jax.random.PRNGKey(0)
    if plan is None:
        plan = build_cascade_plan(edges, n)
    if plan is not None:
        counts = _ic_run_table(
            plan["table"], plan["ov_dst"], plan["ov_src"],
            jnp.asarray(seed_mask), float(p), key,
            int(num_sims), int(max_iters),
        )
        return np.asarray(counts), max_iters
    src = jnp.asarray(np.concatenate([edges[:, 0], edges[:, 1]]))
    dst = jnp.asarray(np.concatenate([edges[:, 1], edges[:, 0]]))
    counts = _ic_run(
        src, dst, jnp.asarray(seed_mask), float(p), key,
        int(n), int(num_sims), int(max_iters),
    )
    return np.asarray(counts), max_iters


def estimated_influence(edges, n, seeds, p=0.1, num_sims=64, max_iters=200,
                        key=None):
    """Mean IC spread (float) over a Monte-Carlo batch."""
    counts, _ = independent_cascade(
        edges, n, seeds, p=p, num_sims=num_sims, max_iters=max_iters, key=key
    )
    return float(np.mean(counts))
