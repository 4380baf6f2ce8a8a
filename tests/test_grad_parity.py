"""Full-model gradient parity: d(loss)/d(params) of FootprintNetwork under
the reference training loss vs torch.autograd through the torch oracle.

Loss *values* are torch-golden in test_losses.py and forward activations in
test_model_parity.py, but those leave training numerics resting on
composition-level self-consistency.  Here the complete backward graph —
encoder BN train-mode batch stats, both decoders (incl. the gated fast-op
paths with their hand-written VJPs), reflect pads, bilinear upsamples, the
sigmoid-disparity heads and the 4-scale loss aggregation — is diffed
leaf-by-leaf against an independent autodiff (torch CPU, f32).

Weights cross via the torch-free converter; torch *gradients* cross through
the SAME converter (it is a pure rename/transpose, so feeding a state_dict
of .grad tensors yields the gradient pytree in our layout — zero extra
mapping code to get wrong).

Reference loss: /root/reference/footprints/training/losses.py; reference
trainer backward: /root/reference/footprints/training/train.py:153-156.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from footprints_tpu.convert import footprint_params_from_state_dict
from footprints_tpu.models import FootprintNetwork
from footprints_tpu.train.losses import LossConfig, compute_losses

from . import torch_oracle

N, H, W = 2, 64, 96  # deepest feature 2x3 (reflect pad needs >=2 per dim)


def _torch_sigmoid_to_depth(disp, min_depth=0.1, max_depth=100.0):
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    return 1.0 / (min_disp + (max_disp - min_disp) * disp)


def _torch_loss(outputs, targets, prior_weight=0.25):
    """Reference LossManager arithmetic, differentiable in torch.

    outputs: {scale: [N,4,H,W]}; targets: dict of [N,H,W] tensors."""
    t = targets
    moving = 1 - t["moving_object_mask"]
    labeled = ((t["all_ground"] + t["depth_mask"]) > 0).float()
    valid = (t["depth"] > 0).float()
    gvalid = (t["ground_depth"] > 0).float()

    total = 0.0
    for p in outputs.values():
        l_vis = torch.nn.functional.binary_cross_entropy_with_logits(
            p[:, 0], t["visible_ground"])
        raw = torch.nn.functional.binary_cross_entropy_with_logits(
            p[:, 1], t["all_ground"], reduction="none") * labeled * moving
        prior = prior_weight * torch.nn.functional.binary_cross_entropy_with_logits(
            p[:, 1], torch.zeros_like(p[:, 1]), reduction="none") * (1 - labeled)
        l_all = (raw + prior).mean()
        depth = _torch_sigmoid_to_depth(p[:, 2])
        l_depth = (torch.log(torch.abs(depth - t["depth"]) + 1) * valid).mean()
        gdepth = _torch_sigmoid_to_depth(p[:, 3])
        l_gdepth = (torch.log(torch.abs(gdepth - t["ground_depth"]) + 1) * gvalid).mean()
        total = total + l_vis + l_all + l_depth + l_gdepth
    return total / 4


def _make_targets(rng):
    return {
        "depth": (rng.rand(N, H, W) * 20 * (rng.rand(N, H, W) > 0.3)).astype(np.float32),
        "visible_ground": (rng.rand(N, H, W) > 0.5).astype(np.float32),
        "all_ground": (rng.rand(N, H, W) > 0.4).astype(np.float32),
        "ground_depth": (rng.rand(N, H, W) * 15 * (rng.rand(N, H, W) > 0.4)).astype(np.float32),
        "depth_mask": (rng.rand(N, H, W) > 0.6).astype(np.float32),
        "moving_object_mask": (rng.rand(N, H, W) > 0.8).astype(np.float32),
    }


@pytest.mark.parametrize("fast", [False, True],
                         ids=["naive-path", "fast-ops-path"])
def test_footprint_grad_parity_vs_torch_autograd(fast, monkeypatch):
    # the s2d fast path gates on spatial size; force it ON for the small test
    # shape so its hand-written VJPs are exercised through the real model too
    if fast:
        from footprints_tpu.nn import blocks
        monkeypatch.setattr(blocks, "_S2D_MIN_PIXELS", 0)

    torch.manual_seed(4)
    tnet = torch_oracle.FootprintNetwork().train()

    rng = np.random.RandomState(2)
    x = rng.rand(N, H, W, 3).astype(np.float32)
    targets = _make_targets(rng)

    # --- torch side: loss + autograd -------------------------------------
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    tt = {k: torch.from_numpy(v) for k, v in targets.items()}
    outputs = tnet(tx)
    tloss = _torch_loss(outputs, tt)
    tnet.zero_grad()
    tloss.backward()

    # --- jax side ---------------------------------------------------------
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, state = footprint_params_from_state_dict(sd)
    net = FootprintNetwork(depth=34)
    jt = {k: jnp.asarray(v) for k, v in targets.items()}

    def loss_fn(params):
        out, _ = net.apply(params, state, jnp.asarray(x), train=True)
        return compute_losses(out, jt, LossConfig())["loss"]

    jloss, jgrads = jax.value_and_grad(loss_fn)(params)

    tloss_f = float(tloss.detach())
    assert abs(float(jloss) - tloss_f) < 1e-5, (float(jloss), tloss_f)

    # --- torch grads -> our layout via the converter ------------------------
    grad_sd = {}
    for k, v in tnet.state_dict(keep_vars=True).items():
        if v.grad is not None:
            grad_sd[k] = v.grad.numpy()
        else:  # running stats etc. — converter needs the keys present
            grad_sd[k] = np.zeros_like(v.detach().numpy())
    ref_grads, _ = footprint_params_from_state_dict(grad_sd)

    flat_got = jax.tree_util.tree_flatten_with_path(jgrads)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_grads)[0])
    assert len(flat_got) == len(flat_ref)

    worst = (0.0, None)
    for path, g in flat_got:
        r = flat_ref[path]
        if r is None or g is None:
            assert r is None and g is None, path
            continue
        g = np.asarray(g)
        r = np.asarray(r)
        assert g.shape == r.shape, path
        # norm-relative per leaf: robust to fp accumulation noise on
        # near-cancelling tiny grads (deep-encoder BN leaves sit at ~6e-3
        # from summation order alone) while any structural bug — a sign
        # flip (rel≈2), a dropped loss term, a transposed kernel — lands
        # orders of magnitude above the 2e-2 gate.
        rel = np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-7)
        if rel > worst[0]:
            worst = (rel, path)
        assert rel < 2e-2, (
            f"{jax.tree_util.keystr(path)}: ‖Δ‖/‖ref‖ = {rel:.2e} "
            f"(ref max {np.abs(r).max():.3e})")
    assert worst[0] < 2e-2
