"""Find the ~1.4 s/iter unattributed in the 10M full step.

probe_10m_phases.py: full step 2385 ms vs parts ~1000 ms (gather 638,
spring +136, refs+binfold +190, sampling 12, normalize 10). Hypothesis:
in the full program XLA rematerializes the 70M-row table gather instead
of keeping the 840 MB pn_list live across the binfold (2x638 = the gap).
Build the step incrementally inside ONE jitted loop; each stage's delta
isolates one component's cost IN CONTEXT.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")

import jax
import jax.numpy as jnp
import numpy as np

LOOP = 3


def timed(label, fn):
    fn(0)
    t0 = time.perf_counter()
    fn(1)
    print(f"{label:58s} {(time.perf_counter()-t0)/LOOP*1e3:10.1f} ms/iter",
          flush=True)


def main():
    from experiments.probe_10m import build_adj

    import graphem_rapids_tpu as gr
    from graphem_rapids_tpu.ops.forces import (
        intersection_forces,
        midpoint_refs_binned,
        spring_forces_binned,
    )
    from graphem_rapids_tpu.ops.knn import knn
    from graphem_rapids_tpu.ops.sampling import sample_indices

    adj = build_adj()
    emb = gr.GraphEmbedderTPU(
        adj, n_components=3, seed=0, verbose=False, init="random",
        L_min=10.0, k_attr=0.5, k_inter=0.1, n_neighbors=15,
        sample_size=512,
    )
    nb, ops = emb._nb, emb._step_ops
    pos0 = emb._positions
    k_attr, L_min, k_inter = emb.k_attr, emb.L_min, emb.k_inter
    E, S = emb.n_edges, emb.sample_size
    k_eff = min(emb.n_neighbors + 1, E)
    strategy = emb._resolved_strategy()
    ov_plan = nb.get("overflow_plan")

    def plan_rt(t_ops):
        if "ov_plan" not in t_ops:
            return None
        return {**t_ops["ov_plan"], "block": ov_plan["block"]}

    def stage_fn(level):
        """One jitted chained loop running the step up to `level`."""

        @jax.jit
        def run(pos, t_ops, key):
            def body(i, carry):
                p, key = carry
                key, sub = jax.random.split(key)
                pn_list = [p[t] for t in t_ops["tables"]]
                spring = spring_forces_binned(
                    p, pn_list, nb, k_attr, L_min,
                    t_ops.get("nb_overflow"), plan_rt(t_ops),
                )
                if level == 0:
                    return p + spring * 1e-30, key
                si = sample_indices(sub, E, S)
                refs = midpoint_refs_binned(
                    p, pn_list,
                    {**nb, "ref_valid": t_ops["nb"]["ref_valid"]},
                    t_ops.get("overflow_lt"),
                )
                queries = refs[t_ops["nb"]["edge_ref"][si]]
                slot_idx, _ = knn(queries, refs, k_eff, strategy=strategy)
                knn_idx = t_ops["nb"]["ref_edge"][slot_idx[:, 1:]]
                if level == 1:
                    return p + spring * 1e-30 + knn_idx[0, 0] * 1e-30, key
                inter = intersection_forces(
                    p, t_ops["edges"], knn_idx, si, k_inter,
                    edge_order=t_ops.get("edge_order"),
                )
                np_ = p + spring + inter
                np_ = np_ - jnp.mean(np_, axis=0, keepdims=True)
                np_ = np_ / (jnp.std(np_, axis=0, keepdims=True, ddof=1)
                             + 1e-6)
                return np_, key

            return jax.lax.fori_loop(0, LOOP, body, (pos, key))

        def call(seed):
            return np.asarray(
                run(pos0, ops, jax.random.PRNGKey(seed))[0][:2]
            )

        return call

    timed("L0: gather+spring (shared-loop)", stage_fn(0))
    timed("L1: + sample+refs+binfold (pn_list shared)", stage_fn(1))
    timed("L2: + intersection + normalize (== full step)", stage_fn(2))

    # ground truth from the engine itself
    def full(seed):
        emb.run_layout(num_iterations=LOOP, block_size=LOOP)
        return np.asarray(emb._positions[:2])

    timed("engine run_layout block", full)


if __name__ == "__main__":
    main()
