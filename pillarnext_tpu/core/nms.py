"""On-device NMS — fully jittable, no host round-trips.

Replaces the reference's CUDA bitmask kernel + host greedy scan
(reference: det3d/core/iou3d_nms/src/iou3d_nms.cpp:113-159,
iou3d_nms_kernel.cu:280-324) with: score top-k to a static K, a K x K rotated
BEV IoU matrix (branch-free polygon clip, core/jax_box_ops.py), and a greedy
suppression sweep expressed as ``lax.fori_loop`` over rows.  Also provides the
cheaper circle-NMS variant used by CenterPoint-style Waymo configs.

All outputs are fixed-size with validity masks (static shapes for XLA).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pillarnext_tpu.core import jax_box_ops

NEG_INF = -1e9


def _greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Greedy NMS over a score-sorted K x K IoU matrix.

    Row i suppresses later rows j > i with iou > thresh, but only if row i
    itself survived.  Returns (K,) keep mask.
    """
    k = iou.shape[0]
    over = (iou > thresh) & valid[None, :] & valid[:, None]
    idx = jnp.arange(k)
    later = idx[None, :] > idx[:, None]
    over = over & later  # row i can only suppress strictly later boxes

    def body(i, suppressed):
        keep_i = jnp.logical_not(suppressed[i]) & valid[i]
        return jnp.where(keep_i, suppressed | over[i], suppressed)

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    return jnp.logical_not(suppressed) & valid


@partial(jax.jit, static_argnums=(2, 3, 4))
def rotated_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    thresh: float,
    pre_max_size: int,
    post_max_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotated BEV NMS (reference: box_torch_ops.rotate_nms_pcdet).

    Args:
        boxes: (N, 7) [x, y, z, dx, dy, dz, yaw].
        scores: (N,) — entries may be ``NEG_INF`` to mark invalid rows.
        thresh: IoU threshold.
        pre_max_size / post_max_size: static truncation sizes.

    Returns:
        (post_max_size,) indices into the original N rows, and a
        (post_max_size,) validity mask.  Invalid slots index row 0.
    """
    n = boxes.shape[0]
    k = min(pre_max_size, n)
    top_scores, order = jax.lax.top_k(scores, k)
    valid = top_scores > NEG_INF / 2
    cand = boxes[order]

    iou = jax_box_ops.boxes_iou_bev(cand, cand)
    keep = _greedy_suppress(iou, valid, thresh)

    # stable-compact kept rows (already score-sorted), pad to post_max_size
    rank = jnp.argsort(~keep, stable=True)
    kept_sorted = order[rank]
    keep_sorted = keep[rank]
    p = post_max_size
    if k >= p:
        sel, sel_valid = kept_sorted[:p], keep_sorted[:p]
    else:
        sel = jnp.zeros((p,), order.dtype).at[:k].set(kept_sorted)
        sel_valid = jnp.zeros((p,), bool).at[:k].set(keep_sorted)
    sel = jnp.where(sel_valid, sel, 0)
    return sel, sel_valid


@partial(jax.jit, static_argnums=(2, 3, 4))
def circle_nms(
    centers: jnp.ndarray,
    scores: jnp.ndarray,
    radius: float,
    pre_max_size: int,
    post_max_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CenterPoint-style circle NMS: suppress later detections whose center
    lies within ``radius`` of a kept one.  Same interface as rotated_nms."""
    n = centers.shape[0]
    k = min(pre_max_size, n)
    top_scores, order = jax.lax.top_k(scores, k)
    valid = top_scores > NEG_INF / 2
    cand = centers[order]

    d2 = jnp.sum((cand[:, None, :2] - cand[None, :, :2]) ** 2, axis=-1)
    # reuse the greedy sweep with a "distance-overlap" indicator
    keep = _greedy_suppress((d2 < radius**2).astype(jnp.float32), valid, 0.5)

    rank = jnp.argsort(~keep, stable=True)
    kept_sorted = order[rank]
    keep_sorted = keep[rank]
    p = post_max_size
    if k >= p:
        sel, sel_valid = kept_sorted[:p], keep_sorted[:p]
    else:
        sel = jnp.zeros((p,), order.dtype).at[:k].set(kept_sorted)
        sel_valid = jnp.zeros((p,), bool).at[:k].set(keep_sorted)
    sel = jnp.where(sel_valid, sel, 0)
    return sel, sel_valid
