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


def s2d_map(t):
    """[N,H,W] -> [N,H/2,W/2,4] space-to-depth pack of a target map; phase
    (a,b) at channel 2a+b (matches ops/s2d.py's phase-major convention and
    the channel-major model head's per-channel phase order)."""
    n, h, w = t.shape
    return t.reshape(n, h // 2, 2, w // 2, 2).transpose(
        0, 1, 3, 2, 4).reshape(n, h // 2, w // 2, 4)


def p4_map(t):
    """[N,H,W] -> [N,H/4,W/4,16] period-4 pack of a target map: lane
    (2a+b)*4 + (2alpha+beta) holds t[4i + 2*alpha + a, 4j + 2*beta + b] —
    the exact per-channel phase order of the p4 '1/2' head
    (ops/s2d.py:bilinear_up2_p4)."""
    n, h, w = t.shape
    t = t.reshape(n, h // 4, 2, 2, w // 4, 2, 2)  # (n, i, alpha, a, j, beta, b)
    t = t.transpose(0, 1, 4, 3, 6, 2, 5)          # (n, i, j, a, b, alpha, beta)
    return t.reshape(n, h // 4, w // 4, 16)


def compute_losses(predictions, targets, config: LossConfig = LossConfig()):
    """predictions: {scale: [N,H,W,4]}; targets: dict of [N,H,W] maps.

    Returns losses dict with '<term>/<scale>' keys and scalar 'loss'.

    The native scale may arrive as '1/1_s2d' instead of '1/1' (the
    training fast path, models/footprint.py): [N,H/2,W/2,16] channel-major
    s2d, contract channel c's 4 phases at lanes 4c..4c+3.  Pixelwise
    losses are permutation-invariant, so each term is computed against the
    s2d-packed targets ('<name>@s2d' batch keys produced off-step by the
    put-path decode, data/compact.py; packed inline as a fallback) — the
    same numbers as the full-res form up to fp summation order, with the
    head's 58 GB/s depth_to_space eliminated from the step (PERF.md r5
    roadmap #2).  Loss keys stay '<term>/1/1'.
    """
    target_depth = targets["depth"]
    valid_depth = (target_depth > 0).astype(jnp.float32)
    target_ground = targets["visible_ground"]
    target_ground_all = targets["all_ground"]
    moving_mask = 1.0 - targets["moving_object_mask"]
    target_ground_depth = targets["ground_depth"]
    valid_ground_depth = (target_ground_depth > 0).astype(jnp.float32)
    depth_mask = targets["depth_mask"]

    def s2d_target(name):
        t = targets.get(name + "@s2d")
        return s2d_map(targets[name]) if t is None else t

    def p4_target(name):
        t = targets.get(name + "@s2d2")
        return p4_map(targets[name]) if t is None else t

    losses = {}
    total = 0.0
    for scale_key, output in predictions.items():
        output = output.astype(jnp.float32)
        if scale_key in ("1/1_s2d", "1/2_s2d2"):
            packed, width = ((s2d_target, 4) if scale_key == "1/1_s2d"
                             else (p4_target, 16))
            scale_key = "1/1" if width == 4 else "1/2"
            t_g = packed("visible_ground")
            t_ga = packed("all_ground")
            t_dm = packed("depth_mask")
            t_mov = 1.0 - packed("moving_object_mask")
            t_d = packed("depth")
            t_gd = packed("ground_depth")
            ch = lambda c: output[..., width * c:width * c + width]
            vd = (t_d > 0).astype(jnp.float32)
            vgd = (t_gd > 0).astype(jnp.float32)
        else:
            t_g, t_ga, t_dm, t_mov = (target_ground, target_ground_all,
                                      depth_mask, moving_mask)
            t_d, t_gd, vd, vgd = (target_depth, target_ground_depth,
                                  valid_depth, valid_ground_depth)
            ch = lambda c: output[..., c]
        l_vis = jnp.mean(bce_with_logits(ch(0), t_g))
        l_all = three_class_loss(
            ch(1), t_ga, t_dm, t_mov, config.footprint_prior_weight,
        )
        pred_depth = sigmoid_to_depth(ch(2), config.min_depth, config.max_depth)
        l_depth = supervised_depth_loss(pred_depth, t_d, vd)
        pred_gdepth = sigmoid_to_depth(ch(3), config.min_depth, config.max_depth)
        l_gdepth = supervised_depth_loss(pred_gdepth, t_gd, vgd)

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
