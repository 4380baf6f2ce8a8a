"""Loss golden tests vs an inline torch implementation of the reference
formulas (BCE-with-logits, three-class hidden-ground loss, log-L1 depth)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from footprints_tpu.core.ops import np_sigmoid_to_depth
from footprints_tpu.train.losses import LossConfig, compute_losses

RNG = np.random.RandomState(7)


def _torch_reference_losses(pred4, targets, prior_weight=0.25):
    """Reference loss arithmetic in torch (losses.py behavioral spec)."""
    p = torch.from_numpy(pred4)
    t = {k: torch.from_numpy(v) for k, v in targets.items()}
    moving = 1 - t["moving_object_mask"]

    l_vis = F.binary_cross_entropy_with_logits(p[..., 0], t["visible_ground"])

    labeled = ((t["all_ground"] + t["depth_mask"]) > 0).float()
    loss = F.binary_cross_entropy_with_logits(
        p[..., 1], t["all_ground"], reduction="none") * labeled
    loss = loss * moving
    loss = loss + prior_weight * F.binary_cross_entropy_with_logits(
        p[..., 1], torch.zeros_like(p[..., 1]), reduction="none") * (1 - labeled)
    l_all = loss.mean()

    depth = torch.from_numpy(np_sigmoid_to_depth(pred4[..., 2]).astype(np.float32))
    valid = (t["depth"] > 0).float()
    l_depth = (torch.log(torch.abs(depth - t["depth"]) + 1) * valid).mean()

    gdepth = torch.from_numpy(np_sigmoid_to_depth(pred4[..., 3]).astype(np.float32))
    gvalid = (t["ground_depth"] > 0).float()
    l_gdepth = (torch.log(torch.abs(gdepth - t["ground_depth"]) + 1) * gvalid).mean()

    return {
        "visible_ground": float(l_vis),
        "all_ground": float(l_all),
        "depth": float(l_depth),
        "ground_depth": float(l_gdepth),
    }


def test_compute_losses_matches_reference_formulas():
    n, h, w = 2, 8, 12
    pred = RNG.randn(n, h, w, 4).astype(np.float32)
    pred[..., 2:] = 1 / (1 + np.exp(-pred[..., 2:]))  # depth channels sigmoided
    targets = {
        "depth": (RNG.rand(n, h, w) * 20 * (RNG.rand(n, h, w) > 0.3)).astype(np.float32),
        "visible_ground": (RNG.rand(n, h, w) > 0.5).astype(np.float32),
        "all_ground": (RNG.rand(n, h, w) > 0.4).astype(np.float32),
        "ground_depth": (RNG.rand(n, h, w) * 15 * (RNG.rand(n, h, w) > 0.4)).astype(np.float32),
        "depth_mask": (RNG.rand(n, h, w) > 0.6).astype(np.float32),
        "moving_object_mask": (RNG.rand(n, h, w) > 0.8).astype(np.float32),
    }
    ref = _torch_reference_losses(pred, targets)

    preds = {"1/1": jnp.asarray(pred)}
    jt = {k: jnp.asarray(v) for k, v in targets.items()}
    losses = compute_losses(preds, jt, LossConfig())

    for term in ("visible_ground", "all_ground", "depth", "ground_depth"):
        got = float(losses[f"{term}/1/1"])
        assert abs(got - ref[term]) < 1e-5, f"{term}: {got} vs {ref[term]}"

    total = float(losses["loss"])
    expected = sum(ref.values())  # single scale -> mean over scales is itself
    assert abs(total - expected) < 1e-4


def _make_targets(n, h, w, rng):
    return {
        "depth": (rng.rand(n, h, w) * 20 * (rng.rand(n, h, w) > 0.3)).astype(np.float32),
        "visible_ground": (rng.rand(n, h, w) > 0.5).astype(np.float32),
        "all_ground": (rng.rand(n, h, w) > 0.4).astype(np.float32),
        "ground_depth": (rng.rand(n, h, w) * 15 * (rng.rand(n, h, w) > 0.4)).astype(np.float32),
        "depth_mask": (rng.rand(n, h, w) > 0.6).astype(np.float32),
        "moving_object_mask": (rng.rand(n, h, w) > 0.8).astype(np.float32),
    }


def test_compute_losses_four_scale_aggregation():
    """Full 4-scale layout vs a torch replica of the reference LossManager
    loop — pins the mean-over-scales divisor against the reference's
    hardcoded `/= 4` (reference training/losses.py:80-88): with the model's
    fixed 4-scale layout our `/ len(predictions)` is the same number."""
    rng = np.random.RandomState(11)
    n, h, w = 2, 8, 12
    targets = _make_targets(n, h, w, rng)

    scale_preds = {}
    ref_scale_totals = []
    for scale in ("1/8", "1/4", "1/2", "1/1"):
        pred = rng.randn(n, h, w, 4).astype(np.float32)
        pred[..., 2:] = 1 / (1 + np.exp(-pred[..., 2:]))
        scale_preds[scale] = pred
        ref = _torch_reference_losses(pred, targets)
        ref_scale_totals.append(sum(ref.values()))

    # reference aggregation: sum per-scale totals, then hardcoded /4
    ref_total = sum(ref_scale_totals) / 4

    preds = {k: jnp.asarray(v) for k, v in scale_preds.items()}
    jt = {k: jnp.asarray(v) for k, v in targets.items()}
    losses = compute_losses(preds, jt, LossConfig())

    for scale, ref_t in zip(("1/8", "1/4", "1/2", "1/1"), ref_scale_totals):
        got = float(losses[f"loss/{scale}"])
        assert abs(got - ref_t) < 1e-4, f"scale {scale}: {got} vs {ref_t}"
    assert abs(float(losses["loss"]) - ref_total) < 1e-4


def test_compute_losses_bf16_predictions_give_f32_losses():
    """Mixed precision: bf16 model outputs must yield f32 loss scalars
    (compute_losses upcasts before any reduction), within bf16 rounding of
    the f32 values."""
    rng = np.random.RandomState(13)
    n, h, w = 2, 8, 12
    targets = _make_targets(n, h, w, rng)
    pred = rng.randn(n, h, w, 4).astype(np.float32)
    pred[..., 2:] = 1 / (1 + np.exp(-pred[..., 2:]))

    jt = {k: jnp.asarray(v) for k, v in targets.items()}
    losses_f32 = compute_losses({"1/1": jnp.asarray(pred)}, jt, LossConfig())
    losses_bf16 = compute_losses(
        {"1/1": jnp.asarray(pred).astype(jnp.bfloat16)}, jt, LossConfig())

    for k, v in losses_bf16.items():
        assert v.dtype == jnp.float32, f"{k} is {v.dtype}, want float32"
    # bf16 has ~3 decimal digits; totals should agree to ~1%
    a, b = float(losses_f32["loss"]), float(losses_bf16["loss"])
    assert abs(a - b) / abs(a) < 0.02, (a, b)
