"""Segmentation loss as a pure jnp function (runs inside the jitted step).

Reference semantics (/root/reference/footprints/preprocessing/segmentation/
evaluation.py:37-59 + train.py:172-195): each of the 4 scale outputs is
bilinearly upsampled (align_corners=False) to the input resolution, then
BCE-with-logits masked by `labelled_pix` and normalized per image by the
labeled-pixel count; total = mean over the 4 scales.
"""

import jax
import jax.numpy as jnp

from ...train.losses import bce_with_logits


def upsample_to(x, height, width):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="bilinear",
                            antialias=False)


def compute_seg_losses(outputs, ground_mask, labelled_pix):
    """outputs: list of 4 [N,h_s,w_s,1] logit maps; targets [N,H,W].

    Returns dict with per-scale 'ground_loss_<s>' and scalar 'loss'.
    """
    height, width = ground_mask.shape[1:3]
    losses = {}
    total = 0.0
    for scale, out in enumerate(outputs):
        pred = upsample_to(out.astype(jnp.float32), height, width)[..., 0]
        loss = bce_with_logits(pred, ground_mask)
        valid = labelled_pix.sum(axis=(1, 2))
        per_image = (loss * labelled_pix).sum(axis=(1, 2)) / (valid + 1e-7)
        losses[f"ground_loss_{scale}"] = per_image.mean()
        total = total + per_image.mean()
    losses["loss"] = total / len(outputs)
    return losses
