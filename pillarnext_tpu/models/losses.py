"""CenterPoint losses — jittable, static-shape.

Semantics parity with the reference (det3d/models/loss/centerloss.py):
FastFocalLoss (CornerNet penalty-reduced focal), RegLoss (masked L1 at
gathered centers with NaN targets contributing zero gradient), IouLoss (L1 to
the aligned 3-D IoU of decoded vs GT boxes mapped to 2*IoU-1), IouRegLoss
(1 - closed-form DIoU).  Boolean indexing in the reference becomes mask
weighting (fixed max_objs slots).

Feature-map layout is NHWC; ``ind`` are flattened row-major (y*W + x) center
indices as built by the target assigner (assign.py:97).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pillarnext_tpu.core import jax_box_ops


def gather_feat(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, H*W, C) rows at (B, M) indices -> (B, M, C)."""
    return jnp.take_along_axis(feat, ind[..., None], axis=1)


def gather_feature_map(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """NHWC feature map (B, H, W, C) gathered at flat indices (B, M)."""
    b, h, w, c = feat.shape
    return gather_feat(feat.reshape(b, h * w, c), ind)


def fast_focal_loss(
    out: jnp.ndarray,
    target: jnp.ndarray,
    ind: jnp.ndarray,
    mask: jnp.ndarray,
    cat: jnp.ndarray,
) -> jnp.ndarray:
    """CornerNet penalty-reduced focal loss (centerloss.py:8-37).

    out/target: (B, H, W, C) — ``out`` already sigmoid-clamped.
    ind/mask/cat: (B, M).
    """
    maskf = mask.astype(jnp.float32)
    neg_weights = jnp.power(1.0 - target, 4)
    neg_loss = (jnp.square(out) * neg_weights * jnp.log(1.0 - out)).sum()

    pos_pred_pix = gather_feature_map(out, ind)  # (B, M, C)
    pos_pred = jnp.take_along_axis(pos_pred_pix, cat[..., None], axis=2)[..., 0]
    num_pos = maskf.sum()
    pos_loss = (jnp.log(pos_pred) * jnp.square(1.0 - pos_pred) * maskf).sum()
    return jnp.where(
        num_pos > 0, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0), -neg_loss
    )


def reg_loss(
    output: jnp.ndarray,
    mask: jnp.ndarray,
    ind: jnp.ndarray,
    target: jnp.ndarray,
) -> jnp.ndarray:
    """Masked L1 at object centers, normalized by positive count; returns the
    per-dimension (D,) loss vector (centerloss.py:40-61).

    NaN target slots (velocity of GT-paste crops) are replaced by the detached
    prediction so they contribute zero loss and zero gradient.
    """
    pred = gather_feature_map(output, ind)  # (B, M, D)
    maskf = mask.astype(jnp.float32)[..., None]
    # NaN slots must contribute zero loss AND zero gradient.  (The reference
    # substitutes the detached prediction, relying on torch's sign(0)=0 L1
    # subgradient; JAX's |x| JVP at 0 is +1, so zero both sides explicitly.)
    nan_slots = jnp.isnan(target)
    target = jnp.where(nan_slots, 0.0, target)
    pred = jnp.where(nan_slots, 0.0, pred)
    loss = jnp.abs(pred * maskf - target * maskf)
    loss = loss / (maskf.sum() + 1e-4)
    return loss.sum(axis=(0, 1))  # (D,)


def iou_pred_loss(
    iou_out: jnp.ndarray,
    mask: jnp.ndarray,
    ind: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
) -> jnp.ndarray:
    """L1 between the predicted IoU channel and 2*IoU3D(pred, gt) - 1
    (centerloss.py:64-87).  ``pred_boxes``/``gt_boxes``: (B, M, 7) gathered at
    the same indices; ``pred_boxes`` must already be detached."""
    maskf = mask.astype(jnp.float32)
    pred = gather_feature_map(iou_out, ind)[..., 0]  # (B, M)

    flat_pred = pred_boxes.reshape(-1, 7)
    flat_gt = gt_boxes.reshape(-1, 7)
    iou = jax_box_ops.boxes_aligned_iou3d(flat_pred, flat_gt).reshape(mask.shape)
    target = 2.0 * iou - 1.0

    num = maskf.sum()
    loss = (jnp.abs(pred - target) * maskf).sum() / (num + 1e-4)
    return jnp.where(num > 0, loss, 0.0)


def iou_reg_loss(
    pred_boxes: jnp.ndarray,
    mask: jnp.ndarray,
    gt_boxes: jnp.ndarray,
) -> jnp.ndarray:
    """DIoU regression loss: mean over positives of 1 - DIoU
    (centerloss.py:90-110).  ``pred_boxes`` (B, M, 7) carries gradients."""
    maskf = mask.astype(jnp.float32)
    diou = jax_box_ops.bbox3d_overlaps_diou(
        pred_boxes.reshape(-1, 7), gt_boxes.reshape(-1, 7)
    ).reshape(mask.shape)
    num = maskf.sum()
    loss = ((1.0 - diou) * maskf).sum() / (num + 1e-4)
    return jnp.where(num > 0, loss, 0.0)
