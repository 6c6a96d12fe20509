"""Micro-attribution of the 100K kNN phase: refs build vs kernel prep
vs kernel."""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.ops.forces import midpoint_refs_from_gathered
from graphem_rapids_tpu.ops import knn_binfold as bf

N, DEG, D, S, K, ITERS = 100_000, 8, 3, 512, 15, 50
adj = gr.generate_random_regular(n=N, d=DEG, seed=0)
emb = gr.GraphEmbedderTPU(adj, n_components=D, seed=0, verbose=False,
                          L_min=10.0, k_attr=0.5, k_inter=0.1,
                          n_neighbors=K, sample_size=S)
nb = emb._nb
E = emb.n_edges
overflow_lt = emb._step_ops.get("overflow_lt")
q0 = np.random.default_rng(0).standard_normal((S, D)).astype(np.float32)


def time_loop(name, body, pos0):
    @jax.jit
    def run(pos):
        def f(_, p):
            return body(p)

        return jax.lax.fori_loop(0, ITERS, f, pos)

    out = run(pos0)
    jax.block_until_ready(out)
    best = float("inf")
    for t in range(3):
        p = pos0 + np.float32(1e-6 * (t + 1))
        t0 = time.perf_counter()
        o = run(p)
        np.asarray(o[:2] if o.ndim == 2 else o[:2])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best/ITERS*1e3:7.3f} ms/iter", flush=True)
    return best / ITERS


pos0 = emb._positions

# A: pn gather only
def body_gather(pos):
    pn = pos[nb["table"]]
    return pos + 1e-9 * pn.sum(axis=(1,))

t_g = time_loop("pn gather", body_gather, pos0)

# B: gather + refs build
def body_refs(pos):
    pn = pos[nb["table"]]
    refs = midpoint_refs_from_gathered(pos, pn, nb, overflow_lt)
    return pos + 1e-9 * jnp.zeros_like(pos).at[0].add(refs.sum())

t_r = time_loop("+ refs build (mask+overflow)", body_refs, pos0)

# C: + kernel prep (pad + transpose) — replicate _binfold_padded's prep
T_, G_ = bf.params_for(K + 1, 0.95)


def prep(refs):
    E_ = refs.shape[0]
    n_tiles = -(-E_ // T_)
    G2 = min(G_, n_tiles)
    n_super = -(-n_tiles // G2)
    E_pad = n_super * G2 * T_
    return (jnp.full((E_pad, D), bf._PAD_COORD, jnp.float32)
            .at[:E_].set(refs).T)


def body_prep(pos):
    pn = pos[nb["table"]]
    refs = midpoint_refs_from_gathered(pos, pn, nb, overflow_lt)
    rt = prep(refs)
    return pos + 1e-9 * jnp.zeros_like(pos).at[0].add(rt.sum())

t_p = time_loop("+ kernel prep (pad+T)", body_prep, pos0)

# D: + full binfold call (kernel + final top_k)
def body_full(pos):
    pn = pos[nb["table"]]
    refs = midpoint_refs_from_gathered(pos, pn, nb, overflow_lt)
    idx, vals = bf.knn_binfold(q0, refs, K + 1)
    return pos + 1e-9 * jnp.zeros_like(pos).at[0].add(
        vals.sum() + idx.sum())

t_f = time_loop("+ binfold kernel + top_k", body_full, pos0)

print(f"\ngather {t_g*1e3:.3f} | refs {((t_r-t_g))*1e3:.3f} | "
      f"prep {(t_p-t_r)*1e3:.3f} | kernel+topk {(t_f-t_p)*1e3:.3f}")
