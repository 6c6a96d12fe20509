"""Phase attribution of the 100K bench step under the SLOT-MAJOR default.

Round-4 successor to profile_step_100k_r2.py (which assumes the
row-major table and cannot run against the slot default). Each phase is
a 50-iteration fori_loop inside ONE jit with the phase output folded
back into the carry (data-dependent chaining), so repeat-dispatch acks
and per-call upload costs cannot pollute the numbers (CLAUDE.md timing
discipline). Differences between cumulative rows attribute the step
budget. Reference hot-path anchor this step replaces:
/root/reference/graphem_rapids/backends/embedder_pytorch.py:595-736.
"""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import time

import jax
import jax.numpy as jnp
import numpy as np

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.ops.forces import (
    intersection_forces,
    spring_refs_binned_slotwise,
    spring_refs_slotwise,
)
from graphem_rapids_tpu.ops.knn_binfold import knn_binfold
from graphem_rapids_tpu.ops.sampling import sample_indices

N, DEG, D, S, K, ITERS = 100_000, 8, 3, 512, 15, 50
FORCE = dict(L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=K,
             sample_size=S)

adj = gr.generate_random_regular(n=N, d=DEG, seed=0)
emb = gr.GraphEmbedderTPU(adj, n_components=D, seed=0, verbose=False,
                          **FORCE)
E = emb.n_edges
nb = emb._nb
ops = emb._step_ops
binned = "buckets" in nb
assert nb.get("ref_order") == "slot", "profiler expects the slot default"
print(f"strategy={emb._resolved_strategy()} fused={emb._fused_refs_active} "
      f"binned={binned} ref_slots={nb['ref_edge'].shape[0]}", flush=True)

edges = ops["edges"]
overflow_lt = ops.get("overflow_lt")
ref_valid = ops["nb"]["ref_valid"]
ref_edge = ops["nb"]["ref_edge"]
edge_ref = ops["nb"]["edge_ref"]


def spring_refs(pos, want_refs):
    if binned:
        return spring_refs_binned_slotwise(
            pos, ops["tables"], nb, 0.5, 10.0, ref_valid=ref_valid,
            overflow_lt=overflow_lt, overflow_edges=ops.get("nb_overflow"),
            overflow_plan=None, want_refs=want_refs)
    return spring_refs_slotwise(
        pos, ops["nb"]["table_t"], nb, 0.5, 10.0, ref_valid=ref_valid,
        overflow_lt=overflow_lt, overflow_edges=ops.get("nb_overflow"),
        overflow_plan=None, want_refs=want_refs)


def norm(out):
    out = out - out.mean(0, keepdims=True)
    return out / (out.std(0, ddof=1, keepdims=True) + 1e-6)


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
    print(f"{name:44s} {best/ITERS*1e3:7.3f} ms/iter", flush=True)
    return best / ITERS


def body_spring(pos, key):
    spring, _ = spring_refs(pos, False)
    return norm(pos + spring)


def body_refs(pos, key):
    spring, refs = spring_refs(pos, True)
    return norm(pos + spring + 1e-9 * jnp.zeros_like(pos).at[0].add(
        refs.sum()))


def body_sample(pos, key):
    spring, refs = spring_refs(pos, True)
    sampled = sample_indices(key, E, S)
    q = refs[edge_ref[sampled]]
    return norm(pos + spring + 1e-9 * jnp.zeros_like(pos).at[0].add(
        q.sum()))


def body_knn(pos, key):
    spring, refs = spring_refs(pos, True)
    sampled = sample_indices(key, E, S)
    q = refs[edge_ref[sampled]]
    slot_idx, vals = knn_binfold(q, refs, K + 1)
    knn_idx = ref_edge[slot_idx[:, 1:]]
    return norm(pos + spring + 1e-9 * jnp.zeros_like(pos).at[0].add(
        vals.sum() + knn_idx.sum()))


def body_full(pos, key):
    spring, refs = spring_refs(pos, True)
    sampled = sample_indices(key, E, S)
    q = refs[edge_ref[sampled]]
    slot_idx, _ = knn_binfold(q, refs, K + 1)
    knn_idx = ref_edge[slot_idx[:, 1:]]
    inter = intersection_forces(pos, edges, knn_idx, sampled, 0.1,
                                edge_order=ops.get("edge_order"))
    return norm(pos + spring + inter)


t_spring = time_loop("spring slotwise (no refs) + normalize", body_spring)
t_refs = time_loop("+ refs assembly", body_refs)
t_sample = time_loop("+ sampling + slot queries", body_sample)
t_knn = time_loop("+ binfold kNN + slot->edge map", body_knn)
t_full = time_loop("+ intersection (rebuilt full step)", body_full)

# the real engine step, same methodology. _multi_step DONATES the
# positions/key buffers — reassign the outputs every call (bench.py
# pattern); reusing a donated input raises an async INVALID_ARGUMENT
# at the next fetch over the tunnel.
multi = emb._multi_step
pos, key = emb._positions, emb._key
pos, key = multi(pos, key, emb._step_ops, num_steps=ITERS)
np.asarray(pos[:2])
best = float("inf")
for t in range(3):
    pos = pos + np.float32(1e-6 * (t + 1))
    t0 = time.perf_counter()
    pos, key = multi(pos, key, emb._step_ops, num_steps=ITERS)
    np.asarray(pos[:2])
    best = min(best, time.perf_counter() - t0)
print(f"{'FULL engine step':44s} {best/ITERS*1e3:7.3f} ms/iter", flush=True)

# Cumulative phase rows can be NON-monotone (phase isolation changes
# XLA fusion: the r4 run measured the standalone sampling row ABOVE the
# row that adds binfold). Attribute sampling+queries+binfold JOINTLY —
# the split (t_knn - t_sample) would print a negative binfold and an
# inflated sampling figure (ADVICE r4).
if t_sample > t_knn:
    print("\nNOTE: cumulative rows non-monotone (sampling row > +binfold "
          "row) — fusion noise; sampling/queries/binfold attributed "
          "jointly below.")
print(f"\nattribution (ms/iter): spring+norm {t_spring*1e3:.3f} | "
      f"refs {(t_refs-t_spring)*1e3:.3f} | "
      f"sampling+queries+binfold {(t_knn-t_refs)*1e3:.3f} | "
      f"intersection {(t_full-t_knn)*1e3:.3f} | "
      f"engine total {best/ITERS*1e3:.3f}")
