"""Multi-host initialization + per-host input sharding helpers.

Single-host multi-chip needs nothing beyond `make_mesh()`.  For multi-host
(pod slices), call `initialize()` once at process start — JAX then exposes
the global device set and `make_mesh()` builds the DCN-aware mesh; XLA
routes the data-parallel all-reduce over ICI within a slice and DCN across
slices (`mesh_utils.create_device_mesh` orders devices accordingly).

Input pipeline contract for multi-host data parallelism: every host loads
only its shard of the global batch (`host_batch_slice`) and assembles the
global array with `jax.make_array_from_process_local_data`.
"""

import jax
import numpy as np

from .mesh import batch_sharded


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize passthrough (no-op when single-process)."""
    if num_processes in (None, 1) and jax.process_count() == 1 \
            and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_batch_slice(global_batch_size: int):
    """(start, size) of this host's slice of the global batch dimension."""
    n, i = jax.process_count(), jax.process_index()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} must divide over {n} hosts")
    per = global_batch_size // n
    return i * per, per


def global_batch_from_local(mesh, local_batch):
    """Assemble per-host numpy shards into one globally-sharded jax array
    per leaf (batch dim sharded over the mesh's `data` axis)."""
    sharding = batch_sharded(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )
