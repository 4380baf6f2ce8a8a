"""Jitted training / eval steps with data-parallel sharding.

One compiled function does forward, loss, backward, all-reduce (inserted by
XLA over ICI from the sharding annotations) and the optimizer update.  The
train state is donated, so params/opt-state update in place in HBM.  Loss
scalars stay on device — fetch them at logging cadence, not every step
(the reference synced device->host every step; SURVEY.md §3.2 hard part #7).

Optimizer contract (reference: /root/reference/footprints/model_manager.py:27-28):
Adam(lr=1e-4) + StepLR(step_size=10 epochs, gamma=0.1 default).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from ..parallel import mesh as meshlib
from .losses import LossConfig, compute_losses


_COMPUTE_DTYPES = (None, "float32", "f32", "bfloat16", "bf16")


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    learning_rate: float = 1e-4
    scheduler_step_epochs: int = 10
    scheduler_gamma: float = 0.1
    steps_per_epoch: int = 1  # used to convert the epoch-based StepLR to steps
    loss: LossConfig = LossConfig()
    # 'bfloat16' = mixed precision: master params, grads and optimizer state
    # stay f32; the forward/backward compute graph runs in bf16 (2-3x step
    # throughput on TPU).  None/'float32' = full f32 (reference parity).
    compute_dtype: str | None = None
    # score the native '1/1' scale in s2d basis (models/footprint.py
    # s2d_head): removes the head's tiny-channel depth_to_space from the
    # step (PERF.md r5 roadmap #2).  fp-summation-order-only deviation;
    # fastest when the batch carries '<target>@s2d' keys (put-path decode,
    # data/compact.py) — the loss falls back to in-step packing otherwise.
    s2d_head: bool = False
    # period-4 '1/2' head (PERF.md r5): the half-scale head is computed
    # from block4's pre-d2s s2d tensor and scored in period-4 basis
    # against '<target>@s2d2' keys.  Same deviation class and fallback
    # behavior as s2d_head.
    p4_head: bool = False

    def __post_init__(self):
        # loud failure instead of silently training full-f32 at 1/3 speed
        # on a typo ('bfloat', 'float16', ...) from a programmatic caller
        if self.compute_dtype not in _COMPUTE_DTYPES:
            raise ValueError(
                f"compute_dtype={self.compute_dtype!r} not supported; "
                f"one of {_COMPUTE_DTYPES}")


def make_lr_schedule(config: TrainStepConfig):
    """StepLR as a step-indexed schedule: lr * gamma^(epoch // step_epochs)."""
    # clamp: steps_per_epoch=0 (empty dataloader) would make `step // 0`
    # silently yield garbage lr under XLA instead of raising
    boundary = max(config.scheduler_step_epochs * config.steps_per_epoch, 1)

    def schedule(step):
        return config.learning_rate * config.scheduler_gamma ** (step // boundary)

    return schedule


def make_optimizer(config: TrainStepConfig):
    # flatten: Adam runs as a few fused ops over one contiguous ~33M-element
    # vector instead of ~6 tiny ops per param leaf (~1200 serialized device
    # ops/step measured in the r1 profile — ~8 ms/step on v5e)
    return optax.flatten(optax.adam(learning_rate=make_lr_schedule(config)))


def init_train_state(net, key, config: TrainStepConfig):
    """Returns the train-state pytree {params, state, opt_state, step}."""
    params, state = net.init(key)
    opt_state = make_optimizer(config).init(params)
    return {
        "params": params,
        "state": state,
        "opt_state": opt_state,
        "step": jnp.zeros((), jnp.int32),
    }


def build_train_step(net, config: TrainStepConfig, mesh=None):
    """Compile the full train step.

    Returned fn: (train_state, batch) -> (train_state, metrics) where batch is
    {'image': [N,H,W,3], 'depth', 'visible_ground', 'all_ground',
     'ground_depth', 'depth_mask', 'moving_object_mask': [N,H,W]}.
    With a mesh, batch dim is sharded over the `data` axis and params are
    replicated; XLA all-reduces gradients over ICI.
    """
    optimizer = make_optimizer(config)
    mixed = config.compute_dtype in ("bfloat16", "bf16")
    # only pass the kwarg when enabled: nets that don't implement an s2d
    # head (e.g. test doubles) keep satisfying the plain apply contract
    head_kw = {}
    if config.s2d_head:
        head_kw["s2d_head"] = True
    if config.p4_head:
        head_kw["p4_head"] = True

    def loss_fn(params, state, batch):
        if mixed:
            # bf16 compute copy of the params; grads flow back to the f32
            # masters (loss stays f32 so metric semantics are unchanged)
            fwd_params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16) if a is not None else None,
                params)
            image = batch["image"].astype(jnp.bfloat16)
        else:
            fwd_params, image = params, batch["image"]
        outputs, new_state = net.apply(fwd_params, state, image, train=True,
                                       **head_kw)
        losses = compute_losses(outputs, batch, config.loss)
        return losses["loss"], (new_state, losses)

    def step_fn(train_state, batch):
        grads, (new_state, losses) = jax.grad(loss_fn, has_aux=True)(
            train_state["params"], train_state["state"], batch
        )
        updates, new_opt_state = optimizer.update(
            grads, train_state["opt_state"], train_state["params"]
        )
        new_params = optax.apply_updates(train_state["params"], updates)
        new_train_state = {
            "params": new_params,
            "state": new_state,
            "opt_state": new_opt_state,
            "step": train_state["step"] + 1,
        }
        metrics = dict(losses)
        metrics["lr"] = make_lr_schedule(config)(train_state["step"])
        return new_train_state, metrics

    if mesh is False:  # raw, unjitted step (for benchmarking under lax.scan)
        return step_fn
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = meshlib.replicated(mesh)  # params / opt_state / step: replicated
    data = meshlib.batch_sharded(mesh)
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
    )


def build_eval_step(net, config: TrainStepConfig, mesh=None):
    """Compiled no-grad eval step: (params, state, batch) -> losses dict.

    Honors config.compute_dtype so validation runs the same-precision graph
    as training (comparable train/val curves, bf16 eval throughput); the
    loss itself stays f32 either way (compute_losses upcasts)."""
    mixed = config.compute_dtype in ("bfloat16", "bf16")
    head_kw = {}
    if config.s2d_head:
        head_kw["s2d_head"] = True
    if config.p4_head:
        head_kw["p4_head"] = True

    def eval_fn(params, state, batch):
        if mixed:
            params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16) if a is not None else None,
                params)
            batch = dict(batch, image=batch["image"].astype(jnp.bfloat16))
        outputs, _ = net.apply(params, state, batch["image"], train=False,
                               **head_kw)
        return compute_losses(outputs, batch, config.loss)

    if mesh is None:
        return jax.jit(eval_fn)
    repl = meshlib.replicated(mesh)
    data = meshlib.batch_sharded(mesh)
    return jax.jit(eval_fn, in_shardings=(repl, repl, data), out_shardings=repl)
