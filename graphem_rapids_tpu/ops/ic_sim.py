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
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


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


def independent_cascade(edges, n, seeds, p=0.1, num_sims=64, max_iters=200,
                        key=None):
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
    src = jnp.asarray(np.concatenate([edges[:, 0], edges[:, 1]]))
    dst = jnp.asarray(np.concatenate([edges[:, 1], edges[:, 0]]))
    seed_mask = np.zeros(n, bool)
    seed_mask[np.asarray(list(seeds), np.int64)] = True
    if key is None:
        key = jax.random.PRNGKey(0)
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
