"""Device-mesh helpers.

The single mesh axis 'edges' partitions the COO edge list (DP-of-edges with
replicated vertex state — SURVEY.md §2.4). Multi-host pods simply extend
the same axis across hosts; XLA routes the psum/all_gather over ICI within
a slice and DCN across slices.
"""

import jax


EDGE_AXIS = "edges"


def make_mesh(n_devices=None, axis_name=EDGE_AXIS, devices=None):
    """A 1-D mesh over ``n_devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(devices, (axis_name,))


def default_mesh():
    """Mesh over every addressable device."""
    return make_mesh()
