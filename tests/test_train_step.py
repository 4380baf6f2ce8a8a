"""Train-step tests: single-device step runs and decreases loss; the
data-parallel sharded step over the virtual 8-device CPU mesh produces the
same numbers as the single-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from footprints_tpu.models import FootprintNetwork
from footprints_tpu.parallel import make_mesh, replicate_tree, shard_batch
from footprints_tpu.train import (
    TrainStepConfig,
    build_eval_step,
    build_train_step,
    init_train_state,
)


class TinyNet:
    """Small conv net with the FootprintNetwork output contract, to keep the
    CPU-mesh tests fast.  Single scale '1/1', 4 channels."""

    def init(self, key):
        from footprints_tpu.nn import init as nn_init

        k1, k2 = jax.random.split(key)
        params = {
            "c1": nn_init.conv_kaiming_uniform(k1, 3, 3, 3, 8),
            "c2": nn_init.conv_kaiming_uniform(k2, 3, 3, 8, 4),
        }
        return params, {}

    def apply(self, params, state, image, *, train=False):
        from footprints_tpu.nn.layers import conv2d, elu, sigmoid

        x = elu(conv2d(image, params["c1"]["w"], params["c1"]["b"], padding=1))
        x = conv2d(x, params["c2"]["w"], params["c2"]["b"], padding=1)
        out = jnp.concatenate([x[..., :2], sigmoid(x[..., 2:])], axis=-1)
        return {"1/1": out}, state


def _make_batch(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.rand(n, h, w, 3).astype(np.float32),
        "depth": (rng.rand(n, h, w) * 20).astype(np.float32),
        "visible_ground": (rng.rand(n, h, w) > 0.5).astype(np.float32),
        "all_ground": (rng.rand(n, h, w) > 0.4).astype(np.float32),
        "ground_depth": (rng.rand(n, h, w) * 15).astype(np.float32),
        "depth_mask": (rng.rand(n, h, w) > 0.6).astype(np.float32),
        "moving_object_mask": np.zeros((n, h, w), np.float32),
    }


def test_train_step_decreases_loss():
    net = TinyNet()
    config = TrainStepConfig(learning_rate=1e-2, steps_per_epoch=100)
    ts = init_train_state(net, jax.random.PRNGKey(0), config)
    step = build_train_step(net, config)
    batch = {k: jnp.asarray(v) for k, v in _make_batch(2, 16, 16).items()}
    losses = []
    for _ in range(5):
        ts, metrics = step(ts, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(ts["step"]) == 5


def test_lr_schedule_steplr():
    from footprints_tpu.train.step import make_lr_schedule

    config = TrainStepConfig(learning_rate=1e-4, scheduler_step_epochs=10,
                             scheduler_gamma=0.1, steps_per_epoch=5)
    sched = make_lr_schedule(config)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(49)) == pytest.approx(1e-4)
    assert float(sched(50)) == pytest.approx(1e-5)
    assert float(sched(100)) == pytest.approx(1e-6, rel=1e-3)


def test_data_parallel_matches_single_device():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    net = TinyNet()
    config = TrainStepConfig(learning_rate=1e-3, steps_per_epoch=100)
    batch_np = _make_batch(8, 16, 16, seed=3)

    # single device
    ts1 = init_train_state(net, jax.random.PRNGKey(1), config)
    step1 = build_train_step(net, config)
    ts1, m1 = step1(ts1, {k: jnp.asarray(v) for k, v in batch_np.items()})

    # 8-device mesh
    mesh = make_mesh(jax.devices()[:8])
    ts8 = init_train_state(net, jax.random.PRNGKey(1), config)
    ts8 = replicate_tree(mesh, ts8)
    step8 = build_train_step(net, config, mesh=mesh)
    ts8, m8 = step8(ts8, shard_batch(mesh, batch_np))

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    p1 = jax.tree.leaves(ts1["params"])
    p8 = jax.tree.leaves(ts8["params"])
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mixed_precision_step_matches_f32():
    """bf16 compute with f32 master params: loss close to f32, params
    updated, optimizer state stays f32."""
    net = TinyNet()
    batch = {k: jnp.asarray(v) for k, v in _make_batch(2, 16, 16).items()}

    cfg32 = TrainStepConfig(learning_rate=1e-3, steps_per_epoch=100)
    ts32 = init_train_state(net, jax.random.PRNGKey(0), cfg32)
    _, m32 = build_train_step(net, cfg32)(ts32, batch)

    cfg16 = TrainStepConfig(learning_rate=1e-3, steps_per_epoch=100,
                            compute_dtype="bfloat16")
    ts16 = init_train_state(net, jax.random.PRNGKey(0), cfg16)
    ts16, m16 = build_train_step(net, cfg16)(ts16, batch)

    assert abs(float(m32["loss"]) - float(m16["loss"])) < 0.05
    for leaf in jax.tree.leaves(ts16["params"]):
        assert leaf.dtype == jnp.float32  # master params stay f32


def test_eval_step_runs():
    net = TinyNet()
    config = TrainStepConfig()
    ts = init_train_state(net, jax.random.PRNGKey(0), config)
    ev = build_eval_step(net, config)
    batch = {k: jnp.asarray(v) for k, v in _make_batch(2, 16, 16).items()}
    losses = ev(ts["params"], ts["state"], batch)
    assert np.isfinite(float(losses["loss"]))


def test_eval_step_honors_compute_dtype():
    """Validation runs the same-precision graph as training: bf16 config
    evals close to f32 but not bit-identical, and the loss stays f32."""
    net = TinyNet()
    batch = {k: jnp.asarray(v) for k, v in _make_batch(2, 16, 16).items()}
    ts = init_train_state(net, jax.random.PRNGKey(0), TrainStepConfig())

    l32 = build_eval_step(net, TrainStepConfig())(
        ts["params"], ts["state"], batch)
    l16 = build_eval_step(net, TrainStepConfig(compute_dtype="bfloat16"))(
        ts["params"], ts["state"], batch)
    assert l16["loss"].dtype == jnp.float32
    assert abs(float(l32["loss"]) - float(l16["loss"])) < 0.05
    assert float(l32["loss"]) != float(l16["loss"])  # bf16 graph actually ran


def test_compute_dtype_typo_rejected():
    with pytest.raises(ValueError, match="compute_dtype"):
        TrainStepConfig(compute_dtype="float16")
    with pytest.raises(ValueError, match="compute_dtype"):
        TrainStepConfig(compute_dtype="bfloat")  # classic typo


def test_lr_schedule_zero_steps_per_epoch_clamped():
    from footprints_tpu.train.step import make_lr_schedule

    sched = make_lr_schedule(TrainStepConfig(learning_rate=1e-4,
                                             steps_per_epoch=0))
    assert float(sched(0)) > 0  # no step//0 garbage
