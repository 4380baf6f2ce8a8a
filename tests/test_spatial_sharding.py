"""Spatial sharding (the CNN analog of sequence parallelism): image rows
sharded over a `spatial` mesh axis must reproduce single-device numerics —
XLA inserts the conv halo exchanges."""

import numpy as np

import jax
import jax.numpy as jnp

from footprints_tpu.parallel import make_mesh, replicate_tree, shard_batch
from footprints_tpu.parallel.mesh import SPATIAL_AXIS, batch_sharded, replicated
from footprints_tpu.train import TrainStepConfig, build_eval_step, init_train_state

from .test_train_step import TinyNet, _make_batch


def test_spatial_mesh_axes():
    mesh = make_mesh(jax.devices()[:8], spatial=2)
    assert mesh.axis_names == ("data", SPATIAL_AXIS)
    assert mesh.devices.shape == (4, 2)


def test_spatial_sharded_eval_matches_single_device():
    net = TinyNet()
    config = TrainStepConfig()
    ts = init_train_state(net, jax.random.PRNGKey(0), config)
    batch_np = _make_batch(4, 16, 16, seed=5)

    ev1 = build_eval_step(net, config)
    ref = ev1(ts["params"], ts["state"],
              {k: jnp.asarray(v) for k, v in batch_np.items()})

    mesh = make_mesh(jax.devices()[:8], spatial=2)  # 4-way data x 2-way rows
    ts8 = replicate_tree(mesh, ts)
    ev8 = build_eval_step(net, config, mesh=mesh)
    got = ev8(ts8["params"], ts8["state"], shard_batch(mesh, batch_np))

    for k in ref:
        assert abs(float(ref[k]) - float(got[k])) < 1e-5, k


def test_shard_batch_places_spatially():
    mesh = make_mesh(jax.devices()[:8], spatial=2)
    batch = shard_batch(mesh, {"image": np.zeros((4, 16, 16, 3), np.float32)})
    sh = batch["image"].sharding
    assert sh == batch_sharded(mesh)
