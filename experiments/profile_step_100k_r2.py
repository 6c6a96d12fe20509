"""Phase attribution of the 100K bench step, tunnel-safe.

Each phase is timed as a 50-iteration fori_loop INSIDE one jit with the
phase output folded back into the carry (data-dependent chaining), so
repeat-dispatch acks and per-call upload costs cannot pollute the
numbers (CLAUDE.md timing discipline). Differences between cumulative
rows attribute the step budget.
"""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import jax
import jax.numpy as jnp
import numpy as np

import graphem_rapids_tpu as gr

N, DEG, D, S, K, ITERS = 100_000, 8, 3, 512, 15, 50
FORCE = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=K,
             sample_size=S)

adj = gr.generate_random_regular(n=N, d=DEG, seed=0)
emb = gr.GraphEmbedderTPU(adj, n_components=D, seed=0, verbose=False,
                          **FORCE)
E = emb.n_edges
print(f"strategy={emb._resolved_strategy()} fused={emb._fused_refs_active}",
      flush=True)

from graphem_rapids_tpu.ops.forces import (
    midpoint_refs_from_gathered,
    spring_forces_from_gathered,
)
from graphem_rapids_tpu.ops.knn_binfold import knn_binfold
from graphem_rapids_tpu.ops.sampling import sample_indices
from graphem_rapids_tpu.ops.forces import intersection_forces

ops = emb._step_ops
nb_static = dict(emb._nb)
edges = emb.edges
overflow_lt = ops.get("overflow_lt")


def time_loop(name, body):
    @jax.jit
    def run(pos, key):
        def f(_, carry):
            pos, key = carry
            key, sub = jax.random.split(key)
            return body(pos, sub), key

        return jax.lax.fori_loop(0, ITERS, f, (pos, key))

    pos0 = emb._positions
    key0 = jax.random.PRNGKey(0)
    out = run(pos0, key0)
    jax.block_until_ready(out)
    best = float("inf")
    for t in range(3):
        p = pos0 + np.float32(1e-6 * (t + 1))
        t0 = time.perf_counter()
        o = run(p, key0)
        np.asarray(o[0][:2])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best/ITERS*1e3:7.3f} ms/iter", flush=True)
    return best / ITERS


nb = emb._nb


def spring_of(pos):
    pn = pos[nb["table"]]
    return pn, spring_forces_from_gathered(
        pos, pn, nb, 0.5, 10.0,
        overflow_lt if overflow_lt is not None else None, None)


# 1. spring gather + VPU only
def body_spring(pos, key):
    pn, spring = spring_of(pos)
    out = pos + spring
    out = out - out.mean(0, keepdims=True)
    return out / (out.std(0, ddof=1, keepdims=True) + 1e-6)

t_spring = time_loop("spring(gather+fold)+normalize", body_spring)


# 2. + sampling + query midpoints
def body_sample(pos, key):
    pn, spring = spring_of(pos)
    sampled = sample_indices(key, E, S)
    q = (pos[edges[sampled, 0]] + pos[edges[sampled, 1]]) / 2.0
    out = pos + spring + 1e-9 * jnp.zeros_like(pos).at[0].add(q.sum())
    out = out - out.mean(0, keepdims=True)
    return out / (out.std(0, ddof=1, keepdims=True) + 1e-6)

t_sample = time_loop("+ sampling + query midpoints", body_sample)


# 3. + fused refs + binfold kNN
def body_knn(pos, key):
    pn, spring = spring_of(pos)
    sampled = sample_indices(key, E, S)
    q = (pos[edges[sampled, 0]] + pos[edges[sampled, 1]]) / 2.0
    refs = midpoint_refs_from_gathered(pos, pn, nb, overflow_lt)
    idx, vals = knn_binfold(q, refs, K + 1)
    out = pos + spring + 1e-9 * jnp.zeros_like(pos).at[0].add(
        vals.sum() + idx.sum())
    out = out - out.mean(0, keepdims=True)
    return out / (out.std(0, ddof=1, keepdims=True) + 1e-6)

t_knn = time_loop("+ fused refs + binfold kNN", body_knn)

# 4. the real full step (engine path)
multi = emb._multi_step
pos0, key0 = emb._positions, emb._key
out = multi(pos0, key0, emb._step_ops, num_steps=ITERS)
jax.block_until_ready(out)
best = float("inf")
for t in range(3):
    p = pos0 + np.float32(1e-6 * (t + 1))
    t0 = time.perf_counter()
    o = multi(p, key0, emb._step_ops, num_steps=ITERS)
    np.asarray(o[0][:2])
    best = min(best, time.perf_counter() - t0)
print(f"{'FULL engine step':46s} {best/ITERS*1e3:7.3f} ms/iter", flush=True)

print(f"\nattribution: spring+norm {t_spring*1e3:.3f} | sampling "
      f"{(t_sample-t_spring)*1e3:.3f} | refs+kNN {(t_knn-t_sample)*1e3:.3f} "
      f"| intersection+rest {(best/ITERS-t_knn)*1e3:.3f}")
