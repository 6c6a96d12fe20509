"""Device-mesh helpers.

The single mesh axis 'edges' partitions the COO edge list (DP-of-edges with
replicated vertex state — SURVEY.md §2.4). Multi-host pods extend the same
axis across hosts; XLA routes the psum/all_gather over ICI within a slice
and DCN across slices.

Multi-HOST (multi-process) execution: call :func:`distributed_init` once
per process before building the embedder (standard JAX SPMD contract —
every process runs the same program on the same graph), then
``make_mesh()`` spans the GLOBAL device set and
:func:`replicate_to_mesh` turns host data into globally-replicated
jax.Arrays that a global-mesh jit accepts. Validated by
tests/test_multiprocess.py with two local CPU processes.
"""

import jax
import numpy as np

EDGE_AXIS = "edges"


def distributed_init(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize JAX's distributed runtime for multi-host execution.

    Thin wrapper over ``jax.distributed.initialize`` so user code and the
    tests share one entry point. On TPU pods all arguments are inferred
    from the environment; on CPU/GPU clusters pass them explicitly.
    No-op if the runtime is already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_mesh(n_devices=None, axis_name=EDGE_AXIS, devices=None):
    """A 1-D mesh over ``n_devices`` (default: every global device)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(devices, (axis_name,))


def default_mesh():
    """Mesh over every global device."""
    return make_mesh()


def mesh_is_multiprocess(mesh):
    """True when the mesh spans devices owned by other processes."""
    return any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )


def replicate_to_mesh(x, mesh):
    """Host/local array -> globally-REPLICATED jax.Array on ``mesh``.

    A jit lowered for a multi-process mesh only accepts global
    jax.Arrays; every step operand (tables, edges, positions, RNG key)
    is replicated, so each process contributes the full array. In
    single-process meshes this is equivalent to the implicit placement
    jit would do.
    """
    target = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.sharding.is_equivalent_to(target, x.ndim):
            return x
        # global but differently-sharded (e.g. jnp.asarray's implicit
        # multi-process replication): jax cannot reshard non-addressable
        # inputs, but a REPLICATED array's full value is present in every
        # local shard — rebuild on the target sharding from it.
        x = np.asarray(x.addressable_data(0))
    else:
        x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, target, lambda idx: x[idx])
