"""Predicted weak-scaling curve from lowered collective bytes (VERDICT
r4 #7): the >=80%-at-2-hosts BASELINE target is hardware-blocked (one
chip via axon), so this banks a falsifiable PREDICTION a future pod run
can confirm: per-iteration collective payloads are counted from the
REAL lowered program (shard_map StableHLO on 2/4/8-device virtual
meshes, production TPU-mesh shape: binned tables + fused refs), and
combined with the banked per-chip phase rates into a 2-host ICI/DCN
model.

Model (constants labelled; the SHAPE of the curve comes from counted
bytes + banked rates, only the wire bandwidths are assumed):

    t(P) = t_shard                 # per-chip shardable work — constant
                                   # in weak scaling (gather rows/chip,
                                   # local binfold refs/chip fixed)
         + t_repl(n_chip * P)      # replicated phases: update+normalize
                                   # ~0.87 ns/vertex (30M attribution:
                                   # 26 ms @ 30M) + sampling stream
                                   # E*4B / 819 GB/s
         + wire(P)                 # counted bytes / assumed BW

    per-device ring-algorithm wire bytes per collective:
      all_gather:   (P-1)/P * out_bytes     all_reduce: 2 (P-1)/P * in
      all_to_all:   (P-1)/P * in_bytes      ppermute:   in_bytes per hop

    2-host DCN: payload crossing hosts ~ (H-1)/H of the n-scaling
    collectives' bytes (hierarchical collective assumption).

Run: python scripts/predict_weak_scaling.py  (forces CPU; safe while
the TPU is busy)
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E501
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp

# ---- banked per-chip rates (BASELINE.md, v5e, slot-major default) ----
T_1CHIP_1M = 0.0578          # s/iter, 1M tier single chip (r4)
NS_PER_VERTEX_REPL = 0.87    # update+normalize+intersection: 26ms @ 30M
HBM_BW = 819e9               # for the replicated sampling stream
# ---- assumed wire bandwidths (the ONLY non-measured constants) -------
ICI_BW = 45e9                # usable B/s per device, one direction
DCN_BW = 25e9                # usable B/s per host, one direction

N = 1_000_000                # lowering workload = the banked 1M tier
CHORDS = 3_000_000

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "i32": 4, "si32": 4,
               "u32": 4, "ui32": 4, "i8": 1, "pred": 1, "f64": 8,
               "i64": 8, "si64": 8}

COLLECTIVE_RE = re.compile(
    r'"(stablehlo\.(all_gather|all_reduce|all_to_all|collective_permute))"'
    r"[^\n]*?:\s*\(([^)]*)\)\s*->\s*(\S+)"
)
TENSOR_RE = re.compile(r"tensor<([0-9x]*)x?([a-z]+[0-9]*)>")


def tensor_bytes(type_str):
    total = 0
    for dims, dt in TENSOR_RE.findall(type_str):
        el = 1
        for d in dims.split("x"):
            if d:
                el *= int(d)
        total += el * DTYPE_BYTES.get(dt, 4)
    return total


def wire_bytes(text, P):
    """Per-device per-iteration wire bytes, split n-scaling vs constant."""
    n_scaling = 0.0
    const = 0.0
    counts = {}
    for m in COLLECTIVE_RE.finditer(text):
        op = m.group(2)
        in_b = tensor_bytes(m.group(3))
        out_b = tensor_bytes(m.group(4))
        if op == "all_gather":
            b = (P - 1) / P * out_b
        elif op == "all_reduce":
            b = 2 * (P - 1) / P * in_b
        elif op == "all_to_all":
            b = (P - 1) / P * in_b
        else:  # collective_permute: one hop
            b = in_b
        counts[op] = counts.get(op, 0) + 1
        # classify: ops whose payload is ~n-sized scale with the graph
        # in weak scaling; S-sized merge traffic stays constant. The
        # spring assembly is a ~10-way TILED all_gather, so compare each
        # chunk against n/(8P) elements (merge ops are S*kk ~ 256 KB at
        # most; spring chunks are n*d*4/(10P) ~ 1.2 MB at P=2).
        if max(in_b, out_b) >= N * 4 // (8 * P):
            n_scaling += b
        else:
            const += b
    return n_scaling, const, counts


def build_and_lower(P, comm):
    import graphem_rapids_tpu as gr  # noqa: F401
    from graphem_rapids_tpu.parallel.mesh import make_mesh
    from graphem_rapids_tpu.parallel.sharded_embedder import (
        ShardedGraphEmbedder,
    )

    rng = np.random.default_rng(0)
    ring = np.column_stack([np.arange(N), (np.arange(N) + 1) % N])
    ch = rng.integers(0, N, (CHORDS, 2))
    ch = ch[ch[:, 0] != ch[:, 1]]
    e = np.concatenate([ring, ch])
    i, j = np.minimum(e[:, 0], e[:, 1]), np.maximum(e[:, 0], e[:, 1])
    adj = sp.coo_matrix(
        (np.ones(len(e)), (i, j)), shape=(N, N)
    ).tocsr()
    adj.data[:] = 1
    adj = adj + adj.T

    emb = ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(P), seed=0, verbose=False,
        sample_size=512, n_neighbors=15, init="random",
        fused_midpoints=True, knn_comm=comm,
        L_min=10.0, k_attr=0.5, k_inter=0.1,
    )
    assert emb._fused_refs_active
    lowered = jax.jit(emb._step).lower(
        emb._positions, emb._key, emb._step_ops
    )
    return lowered.as_text()


def main():
    rows = []
    for P in (2, 4, 8):
        for comm in ("all_gather", "all_to_all", "ring"):
            text = build_and_lower(P, comm)
            nb, cb, counts = wire_bytes(text, P)
            rows.append((P, comm, nb, cb, counts))
            print(f"[P={P} {comm}] n-scaling {nb/1e6:.2f} MB/dev/iter, "
                  f"const {cb/1e6:.3f} MB, ops {counts}", flush=True)

    # ---- weak-scaling prediction at n_chip = 1M vertices/chip --------
    e_chip = 4_000_000
    t_repl_1 = NS_PER_VERTEX_REPL * 1e-9 * N + e_chip * 4 / HBM_BW
    t_shard = T_1CHIP_1M - t_repl_1
    print(f"\nper-chip shardable work {t_shard*1e3:.1f} ms, replicated "
          f"@1M {t_repl_1*1e3:.2f} ms (banked rates)")

    print("\n| mesh | comm | wire MB/dev/iter | t_pred ms/iter | "
          "efficiency |")
    print("|---|---|---|---|---|")
    results = {}
    for (P, comm, nb, cb, counts) in rows:
        # weak scaling: the n-sized payloads grow with n = P * n_chip
        wire_b = nb * P + cb
        t_wire = wire_b / ICI_BW
        n_tot = N * P
        t_repl = (NS_PER_VERTEX_REPL * 1e-9 * n_tot
                  + e_chip * P * 4 / HBM_BW)
        t = t_shard + t_repl + t_wire
        eff = T_1CHIP_1M / t
        results[(P, comm)] = eff
        print(f"| {P} chips (ICI) | {comm} | {wire_b/1e6:.1f} | "
              f"{t*1e3:.1f} | {eff*100:.0f}% |")

    # 2 hosts x 4 chips: the host-crossing share of the n-scaling
    # payload rides DCN ((H-1)/H with hierarchical collectives)
    H = 2
    for comm in ("all_gather", "all_to_all", "ring"):
        P = 8
        nb = next(r[2] for r in rows if r[0] == P and r[1] == comm)
        cb = next(r[3] for r in rows if r[0] == P and r[1] == comm)
        wire_b = nb * P + cb
        dcn_b = nb * P * (H - 1) / H
        t_wire = wire_b / ICI_BW + dcn_b / DCN_BW
        n_tot = N * P
        t_repl = (NS_PER_VERTEX_REPL * 1e-9 * n_tot
                  + e_chip * P * 4 / HBM_BW)
        t = t_shard + t_repl + t_wire
        eff = T_1CHIP_1M / t
        print(f"| 2 hosts x 4 | {comm} | {wire_b/1e6:.1f} "
              f"(+{dcn_b/1e6:.1f} DCN) | {t*1e3:.1f} | {eff*100:.0f}% |")

    print(f"\nassumed BW: ICI {ICI_BW/1e9:.0f} GB/s/dev, DCN "
          f"{DCN_BW/1e9:.0f} GB/s/host; sensitivity at 0.5x wire BW:")
    for comm in ("all_gather", "ring"):
        P = 8
        nb = next(r[2] for r in rows if r[0] == P and r[1] == comm)
        cb = next(r[3] for r in rows if r[0] == P and r[1] == comm)
        wire_b = nb * P + cb
        dcn_b = nb * P * (H - 1) / H
        t_wire = 2 * (wire_b / ICI_BW + dcn_b / DCN_BW)
        n_tot = N * P
        t_repl = (NS_PER_VERTEX_REPL * 1e-9 * n_tot
                  + e_chip * P * 4 / HBM_BW)
        t = t_shard + t_repl + t_wire
        print(f"  2 hosts x 4, {comm}: {T_1CHIP_1M/t*100:.0f}%")


if __name__ == "__main__":
    main()
