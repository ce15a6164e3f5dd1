"""Device-mesh utilities: live-point batch sharding for the sampler.

The reference's parallelism is MPI master/worker likelihood farming
(``nmma/core/mpi_setup.py:604-683``, SURVEY.md §2.7 P1/P2); the TPU-native
equivalent is *no* message passing at all: the live-point / proposal-chain
batch axis is sharded over an ICI mesh and the whole nested-sampling
iteration runs as one GSPMD program — XLA inserts the all-gathers for the
argsort/threshold reductions and psums for the acceptance statistics.

With ``xla_force_host_platform_device_count=N`` the same code dry-runs on
N virtual CPU devices (see ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices=None, axis_name=BATCH_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def live_point_sharding(mesh: Mesh, axis_name=BATCH_AXIS) -> NamedSharding:
    """Sharding for [nlive, ndim] / [nlive] arrays: batch axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh, axis_name=BATCH_AXIS):
    """Place an NSState so live arrays are batch-sharded, scalars replicated."""
    live = live_point_sharding(mesh, axis_name)
    rep = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.devices.size == 0 and \
                x.shape[0] > 1:
            return jax.device_put(x, live)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, state)
