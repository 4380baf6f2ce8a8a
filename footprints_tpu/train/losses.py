"""Training losses as pure jnp functions (run inside the jitted step).

Behavioral contract (reference: /root/reference/footprints/training/losses.py):

Per scale, four terms on the 4-channel prediction:
  ch0 visible ground: BCE-with-logits vs `visible_ground` target, plain mean.
  ch1 all/hidden ground: ThreeClassLoss —
        per-pixel BCE vs `all_ground`, masked to (all_ground | depth_mask),
        multiplied by (1 - moving_object_mask),
        plus `prior_weight` * BCE(pred, 0) on the *unlabeled* pixels;
        mean over all pixels.
  ch2 visible depth: sigmoid->depth, log-L1 `log(|pred-gt|+1)` masked to gt>0,
        mean over all pixels (not just valid ones — reference semantics).
  ch3 hidden-ground depth: same as ch2 vs `ground_depth`.

Total = mean over the 4 scales of the per-scale sums.

All losses are computed and accumulated on device; nothing here forces a
host sync (the reference synced per step — see SURVEY.md §3.2).
"""

import dataclasses

import jax.numpy as jnp

from ..core.ops import sigmoid_to_depth


@dataclasses.dataclass(frozen=True)
class LossConfig:
    min_depth: float = 0.1
    max_depth: float = 100.0
    footprint_prior_weight: float = 0.25


def bce_with_logits(logits, targets):
    """Numerically stable elementwise binary cross-entropy on logits."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def supervised_depth_loss(pred_depth, target_depth, mask):
    """Mean over ALL pixels of log(|pred - gt| + 1) * mask."""
    return jnp.mean(jnp.log(jnp.abs(pred_depth - target_depth) + 1.0) * mask)


def three_class_loss(logits, ground_target, depth_mask, moving_mask, prior_weight):
    """Hidden-ground loss: labeled BCE + weighted negative prior on unlabeled."""
    labeled = ((ground_target + depth_mask) > 0).astype(logits.dtype)
    loss = bce_with_logits(logits, ground_target) * labeled
    loss = loss * moving_mask
    unlabeled = 1.0 - labeled
    loss = loss + prior_weight * bce_with_logits(logits, jnp.zeros_like(logits)) * unlabeled
    return jnp.mean(loss)


def compute_losses(predictions, targets, config: LossConfig = LossConfig()):
    """predictions: {scale: [N,H,W,4]}; targets: dict of [N,H,W] maps.

    Returns losses dict with '<term>/<scale>' keys and scalar 'loss'.
    """
    target_depth = targets["depth"]
    valid_depth = (target_depth > 0).astype(jnp.float32)
    target_ground = targets["visible_ground"]
    target_ground_all = targets["all_ground"]
    moving_mask = 1.0 - targets["moving_object_mask"]
    target_ground_depth = targets["ground_depth"]
    valid_ground_depth = (target_ground_depth > 0).astype(jnp.float32)
    depth_mask = targets["depth_mask"]

    losses = {}
    total = 0.0
    for scale_key, output in predictions.items():
        output = output.astype(jnp.float32)
        l_vis = jnp.mean(bce_with_logits(output[..., 0], target_ground))
        l_all = three_class_loss(
            output[..., 1], target_ground_all, depth_mask, moving_mask,
            config.footprint_prior_weight,
        )
        pred_depth = sigmoid_to_depth(output[..., 2], config.min_depth, config.max_depth)
        l_depth = supervised_depth_loss(pred_depth, target_depth, valid_depth)
        pred_gdepth = sigmoid_to_depth(output[..., 3], config.min_depth, config.max_depth)
        l_gdepth = supervised_depth_loss(pred_gdepth, target_ground_depth, valid_ground_depth)

        losses[f"visible_ground/{scale_key}"] = l_vis
        losses[f"all_ground/{scale_key}"] = l_all
        losses[f"depth/{scale_key}"] = l_depth
        losses[f"ground_depth/{scale_key}"] = l_gdepth
        scale_loss = l_vis + l_all + l_depth + l_gdepth
        losses[f"loss/{scale_key}"] = scale_loss
        total = total + scale_loss

    # Reference hardcodes `/= 4` (training/losses.py:87); the model's scale
    # layout is fixed at 4 ('1/8'..'1/1'), so len(predictions) == 4 on every
    # real path — pinned by tests/test_losses.py at the 4-scale layout.
    losses["loss"] = total / len(predictions)
    return losses
