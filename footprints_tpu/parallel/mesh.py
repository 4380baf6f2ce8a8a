"""Device mesh + sharding policy.

Scaling model (TPU-first; the reference is single-device — SURVEY.md §2.9):
  * 1-D `data` axis over all chips for data parallelism: batch dim sharded,
    params/optimizer state replicated.  Gradients are all-reduced by XLA over
    ICI — no hand-written collectives.
  * The mesh helper accepts an optional `spatial` axis size for sharding the
    image height dim of very large inputs (the CNN analog of sequence
    parallelism); halo exchange is compiled by XLA's spatial partitioner.

Everything is expressed through `jax.sharding.NamedSharding` annotations on a
jitted function; the same code path runs single-chip (mesh of 1) and
multi-slice (DCN-aware mesh from `jax.experimental.mesh_utils`).
"""

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(devices=None, *, spatial: int = 1) -> Mesh:
    """Build a (data [, spatial]) mesh over the given (default: all) devices.

    With `spatial > 1`, the device array is (n_devices // spatial, spatial)
    and image rows can be sharded over SPATIAL_AXIS.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if spatial == 1:
        dev_array = mesh_utils.create_device_mesh((n,), devices=devices)
        return Mesh(dev_array, (DATA_AXIS,))
    assert n % spatial == 0, f"{n} devices not divisible by spatial={spatial}"
    dev_array = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for params / optimizer state: fully replicated."""
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, *, spatial_dim: int | None = 1) -> NamedSharding:
    """Sharding for a batch tensor: dim 0 over `data` and — when the mesh has
    a `spatial` axis — an image dim (default 1 = H) over `spatial`.  XLA's
    spatial partitioner inserts conv halo exchanges automatically."""
    if SPATIAL_AXIS in mesh.axis_names and spatial_dim is not None:
        spec = [None] * (spatial_dim + 1)
        spec[0] = DATA_AXIS
        spec[spatial_dim] = SPATIAL_AXIS
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch):
    """Place a host-side pytree of numpy batch arrays onto the mesh, batch dim
    sharded over `data`."""
    sharding = batch_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params / opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
