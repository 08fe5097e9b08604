"""On-device NMS — fully jittable, no host round-trips.

Replaces the reference's CUDA bitmask kernel + host greedy scan
(reference: det3d/core/iou3d_nms/src/iou3d_nms.cpp:113-159,
iou3d_nms_kernel.cu:280-324).  Two layers of restructuring:

1. Greedy suppression is a Jacobi fixpoint: the recurrence
   ``keep[i] = valid[i] and no kept j<i overlaps i`` has a unique solution,
   and iterating ``keep <- valid & ~(over^T @ keep)`` reaches it in
   (suppression-chain-depth) rounds — each round one matvec on the MXU —
   instead of a K-step sequential scan.

2. The K x K IoU matrix is never fully materialized: candidates stream
   through a ``lax.while_loop`` in score-sorted chunks of 128, each chunk
   tested against the (bounded) kept set and then greedily resolved within
   itself.  The loop exits as soon as ``post_max_size`` boxes are kept or
   the valid candidates run out — for typical scenes that is 1-3 chunks
   instead of ceil(K/128), and empty classes cost ~nothing.  Boxes kept
   beyond ``post_max_size`` cannot influence the emitted set (kept ranks
   only grow), so the kept buffer is safely bounded.

The IoU threshold is a *traced* scalar so one compiled kernel serves every
class (per-class thresholds become a vmapped argument).  All outputs are
fixed-size with validity masks.  Also provides the circle-NMS variant used
by CenterPoint-style Waymo configs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pillarnext_tpu.core import jax_box_ops

NEG_INF = -1e9
_CHUNK = 128


def _greedy_suppress(over: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Greedy NMS keep-mask over a score-sorted boolean overlap matrix.

    ``over[j, i]`` True when j would suppress a later i (strictly j < i).
    """
    k = over.shape[0]
    idx = jnp.arange(k)
    over = over & valid[None, :] & valid[:, None] & (idx[None, :] > idx[:, None])
    overf = over.astype(jnp.float32)

    def cond(carry):
        _, changed, it = carry
        return changed & (it < k)

    def body(carry):
        keep, _, it = carry
        suppressed = (keep.astype(jnp.float32) @ overf) > 0.0
        new_keep = valid & jnp.logical_not(suppressed)
        return new_keep, jnp.any(new_keep != keep), it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True), 0))
    return keep


def _select(order, keep, post_max_size):
    """Stable-compact kept (score-sorted) rows and pad to post_max_size."""
    k = order.shape[0]
    rank = jnp.argsort(jnp.logical_not(keep), stable=True)
    kept_sorted = order[rank]
    keep_sorted = keep[rank]
    p = post_max_size
    if k >= p:
        sel, sel_valid = kept_sorted[:p], keep_sorted[:p]
    else:
        sel = jnp.zeros((p,), order.dtype).at[:k].set(kept_sorted)
        sel_valid = jnp.zeros((p,), bool).at[:k].set(keep_sorted)
    return jnp.where(sel_valid, sel, 0), sel_valid


def _chunked_greedy(cand: jnp.ndarray, valid: jnp.ndarray, overlap_fn, post_max: int):
    """Streaming greedy NMS over score-sorted candidates.

    cand: (K, D) geometry rows; overlap_fn(a (M, D), b (N, D)) -> (M, N) bool
    "suppresses" indicator.  Returns (K,) keep mask.
    """
    k, d = cand.shape
    c = min(_CHUNK, k)
    n_chunks = -(-k // c)
    kept_cap = min(-(-post_max // c) * c, k)

    n_valid = valid.sum()

    def cond(st):
        chunk_i, _, _, kept_count, _ = st
        return (
            (chunk_i < n_chunks)
            & (chunk_i * c < n_valid)
            & (kept_count < post_max)
        )

    def body(st):
        chunk_i, keep_out, kept_rows, kept_count, kept_valid = st
        start = chunk_i * c
        chunk = jax.lax.dynamic_slice(cand, (start, 0), (c, d))
        chunk_valid = jax.lax.dynamic_slice(valid, (start,), (c,))

        # suppression by the already-kept set
        sup = overlap_fn(kept_rows, chunk) & kept_valid[:, None]
        free = chunk_valid & jnp.logical_not(sup.any(axis=0))

        # greedy within the chunk
        over_cc = overlap_fn(chunk, chunk)
        chunk_keep = _greedy_suppress(over_cc, free)

        keep_out = jax.lax.dynamic_update_slice(keep_out, chunk_keep, (start,))

        # append survivors to the kept buffer (capped; overflow cannot
        # affect the first post_max emitted boxes)
        pos = kept_count + jnp.cumsum(chunk_keep.astype(jnp.int32)) - 1
        pos = jnp.where(chunk_keep & (pos < kept_cap), pos, kept_cap)
        kept_rows = kept_rows.at[pos].set(chunk, mode="drop")
        kept_valid = kept_valid.at[pos].set(chunk_keep, mode="drop")
        kept_count = kept_count + chunk_keep.sum(dtype=jnp.int32)
        return chunk_i + 1, keep_out, kept_rows, kept_count, kept_valid

    # pad cand/valid so dynamic_slice windows are always in bounds
    if n_chunks * c != k:
        pad = n_chunks * c - k
        cand = jnp.concatenate([cand, jnp.zeros((pad, d), cand.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)

    init = (
        jnp.int32(0),
        jnp.zeros((n_chunks * c,), bool),
        jnp.zeros((kept_cap + 1, d), cand.dtype),  # +1 = overflow/drop row
        jnp.int32(0),
        jnp.zeros((kept_cap + 1,), bool),
    )
    _, keep_out, _, _, _ = jax.lax.while_loop(cond, body, init)
    return keep_out[:k]


@partial(jax.jit, static_argnums=(3, 4))
def rotated_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    thresh: jnp.ndarray | float,
    pre_max_size: int,
    post_max_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotated BEV NMS (reference: box_torch_ops.rotate_nms_pcdet).

    Args:
        boxes: (N, 7) [x, y, z, dx, dy, dz, yaw].
        scores: (N,) — entries may be ``NEG_INF`` to mark invalid rows.
        thresh: IoU threshold (may be a traced scalar).
        pre_max_size / post_max_size: static truncation sizes.

    Returns:
        (post_max_size,) indices into the original N rows + validity mask.
    """
    n = boxes.shape[0]
    k = min(pre_max_size, n)
    top_scores, order = jax.lax.top_k(scores, k)
    valid = top_scores > NEG_INF / 2
    cand = boxes[order]

    def overlaps(a, b):
        return jax_box_ops.boxes_iou_bev(a, b) > thresh

    keep = _chunked_greedy(cand, valid, overlaps, post_max_size)
    return _select(order, keep, post_max_size)


@partial(jax.jit, static_argnums=(3, 4))
def axis_aligned_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    thresh: jnp.ndarray | float,
    pre_max_size: int,
    post_max_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Axis-aligned BEV NMS — the reference's ``nms_normal_gpu`` variant
    (iou3d_nms_kernel.cu:327-385: greedy over AABB IoU, yaw ignored).
    Same interface and greedy semantics as :func:`rotated_nms`.
    """
    n = boxes.shape[0]
    k = min(pre_max_size, n)
    top_scores, order = jax.lax.top_k(scores, k)
    valid = top_scores > NEG_INF / 2
    cand = boxes[order]

    def overlaps(a, b):
        # AABB IoU from center +- dim/2 (iou_normal, iou3d_nms_kernel.cu:327-343)
        lo = jnp.maximum(
            a[:, None, :2] - a[:, None, 3:5] / 2, b[None, :, :2] - b[None, :, 3:5] / 2
        )
        hi = jnp.minimum(
            a[:, None, :2] + a[:, None, 3:5] / 2, b[None, :, :2] + b[None, :, 3:5] / 2
        )
        inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
        area_a = jnp.prod(a[:, 3:5], axis=-1)[:, None]
        area_b = jnp.prod(b[:, 3:5], axis=-1)[None, :]
        iou = inter / jnp.maximum(area_a + area_b - inter, 1e-9)
        return iou > thresh

    keep = _chunked_greedy(cand, valid, overlaps, post_max_size)
    return _select(order, keep, post_max_size)


@partial(jax.jit, static_argnums=(3, 4))
def circle_nms(
    centers: jnp.ndarray,
    scores: jnp.ndarray,
    radius: jnp.ndarray | float,
    pre_max_size: int,
    post_max_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CenterPoint-style circle NMS: suppress later detections whose center
    lies within ``radius`` of a kept one.  Same interface as rotated_nms."""
    n = centers.shape[0]
    k = min(pre_max_size, n)
    top_scores, order = jax.lax.top_k(scores, k)
    valid = top_scores > NEG_INF / 2
    cand = centers[order][:, :2]

    def overlaps(a, b):
        d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
        return d2 < jnp.square(radius)

    keep = _chunked_greedy(cand, valid, overlaps, post_max_size)
    return _select(order, keep, post_max_size)
