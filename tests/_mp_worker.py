"""Worker for test_multiprocess.py: one process of an N-process CPU mesh.

Usage: python tests/_mp_worker.py <process_id> <num_processes> <port> <out>
       [mode] [devices_per_proc]

`mode` is a '+'-separated flag set: 'fused' (fused slot-midpoint refs),
'binned' (bucket-row-sharded binned tables, implies fused), 'fresh'
(checkpoint-resume into a FRESH embedder object instead of reloading in
place). Each process owns `devices_per_proc` virtual CPU devices
(default 2); the mesh spans all num_processes * devices_per_proc global
devices. Every process builds the same embedder (same graph, same
seed — the SPMD contract) and runs 3 steps with a checkpoint
save/restore after step 2; each process writes its final positions to
<out>.p<pid>.npz.
"""

import os
import sys

pid, nproc, port, out = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
flags = set((sys.argv[5] if len(sys.argv) > 5 else "").split("+"))
dpp = int(sys.argv[6]) if len(sys.argv) > 6 else 2
fused = "fused" in flags
binned = "binned" in flags
fresh = "fresh" in flags
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={dpp}"
)
os.environ.setdefault("GRAPHEM_RAPIDS_QUIET", "true")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import graphem_rapids_tpu as gr
from graphem_rapids_tpu.parallel import (
    ShardedGraphEmbedder,
    distributed_init,
    make_mesh,
)

distributed_init(f"localhost:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert jax.device_count() == dpp * nproc


def build():
    adj = gr.erdos_renyi_graph(120, 0.08, seed=4)
    return ShardedGraphEmbedder(
        adj, n_components=3, mesh=make_mesh(), seed=11, verbose=False,
        sample_size=64, n_neighbors=6,
        fused_midpoints=True if (fused or binned) else None,
        binned_table=True if binned else None,
    )


emb = build()
assert emb._multiprocess
if fused or binned:
    assert emb._fused_refs_active
if binned:
    assert "buckets" in emb._nb
for _ in range(2):
    emb.update_positions()
# checkpoint save/load roundtrip mid multi-host run (every process
# writes+reads its own copy; contents are identical by replication)
ck = f"{out}.ck{pid}.npz"
emb.save_checkpoint(ck)
if fresh:
    # resume into a FRESH embedder object: catches state-placement bugs
    # that in-place reload can't (positions/key must land replicated on
    # the new object's mesh, iteration counter must carry over)
    emb = build()
emb.load_checkpoint(ck)
emb.update_positions()
pos = emb.positions
assert np.isfinite(pos).all()
np.savez(f"{out}.p{pid}.npz", positions=pos)
print(f"[p{pid}] wrote positions", flush=True)
