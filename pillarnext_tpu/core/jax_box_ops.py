"""On-device (jittable) rotated-box geometry.

TPU-native replacement for the reference CUDA IoU kernels
(reference: det3d/core/iou3d_nms/src/iou3d_nms_kernel.cu:104-278 and the
host mirror iou3d_cpu.cpp).  The branch-heavy polygon-clip in the reference is
re-derived here as a branch-free Sutherland–Hodgman clip with fixed-size
vertex buffers so it vectorizes on the VPU: a convex quad clipped by the four
half-planes of another quad has at most 8 vertices, so every buffer is static.

Numerics match the exact polygon-clip oracle (core/native/geometry.cpp) to
float32 round-off; tests compare against it directly.

Box convention: [x, y, z, dx, dy, dz, yaw] (z = center), yaw CCW around +z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_VERTS = 8  # quad clipped by 4 half-planes has <= 8 vertices


def box_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """BEV corners (..., 4, 2) in CCW order from (..., 7) boxes."""
    x, y = boxes[..., 0], boxes[..., 1]
    hx, hy = boxes[..., 3] / 2, boxes[..., 4] / 2
    c, s = jnp.cos(boxes[..., 6]), jnp.sin(boxes[..., 6])
    # CCW in local frame: (+hx,+hy), (-hx,+hy), (-hx,-hy), (+hx,-hy)
    lx = jnp.stack([hx, -hx, -hx, hx], axis=-1)
    ly = jnp.stack([hy, hy, -hy, -hy], axis=-1)
    gx = lx * c[..., None] - ly * s[..., None] + x[..., None]
    gy = lx * s[..., None] + ly * c[..., None] + y[..., None]
    return jnp.stack([gx, gy], axis=-1)


def _clip_by_halfplane(verts, valid, q0, q1):
    """One Sutherland–Hodgman pass: clip (V, 2) ``verts`` (``valid`` mask marks
    a compacted prefix) against the left half-plane of directed edge q0->q1.

    Returns compacted (V, 2) verts and (V,) valid mask.
    """
    v = verts.shape[0]
    n = valid.sum()
    idx = jnp.arange(v)
    nxt_idx = jnp.where(idx + 1 >= n, 0, idx + 1)
    cur = verts
    nxt = verts[nxt_idx]

    edge = q1 - q0
    # signed distance ~ cross(edge, p - q0); >= 0 is inside (left of edge)
    def side(p):
        return edge[0] * (p[..., 1] - q0[1]) - edge[1] * (p[..., 0] - q0[0])

    s_cur = side(cur)
    s_nxt = side(nxt)
    cur_in = s_cur >= 0
    nxt_in = s_nxt >= 0

    # segment/half-plane intersection point (guard 0-division when parallel)
    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = cur + t[:, None] * (nxt - cur)

    active = idx < n
    # emission slots: 2i -> cur (if inside), 2i+1 -> intersection (if crossing)
    emit_pts = jnp.zeros((2 * v, 2), verts.dtype)
    emit_pts = emit_pts.at[0::2].set(cur)
    emit_pts = emit_pts.at[1::2].set(inter)
    emit_ok = jnp.zeros((2 * v,), bool)
    emit_ok = emit_ok.at[0::2].set(active & cur_in)
    emit_ok = emit_ok.at[1::2].set(active & (cur_in != nxt_in))

    # stable compaction: valid entries first, original order preserved
    order = jnp.argsort(~emit_ok, stable=True)
    emit_pts = emit_pts[order][:v]
    emit_ok = emit_ok[order][:v]
    return emit_pts, emit_ok


def _pair_overlap_bev(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Exact BEV intersection area of two (7,) boxes (scalar)."""
    ca = box_corners_bev(box_a)  # (4, 2) CCW
    cb = box_corners_bev(box_b)

    verts = jnp.zeros((_MAX_VERTS, 2), box_a.dtype).at[:4].set(ca)
    valid = jnp.zeros((_MAX_VERTS,), bool).at[:4].set(True)
    for k in range(4):
        verts, valid = _clip_by_halfplane(verts, valid, cb[k], cb[(k + 1) % 4])

    n = valid.sum()
    # shoelace over the compacted prefix, fanned from vertex 0
    v0 = verts[0]
    d = verts - v0
    idx = jnp.arange(_MAX_VERTS)
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    crosses = d[:, 0] * d[nxt, 1] - d[:, 1] * d[nxt, 0]
    area = 0.5 * jnp.abs(jnp.where(idx < n, crosses, 0.0).sum())
    return jnp.where(n >= 3, area, 0.0)


@jax.jit
def boxes_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) exact BEV overlap areas (reference: boxes_overlap_bev_gpu)."""
    return jax.vmap(lambda a: jax.vmap(lambda b: _pair_overlap_bev(a, b))(boxes_b))(
        boxes_a
    )


@jax.jit
def boxes_aligned_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N,) row-aligned BEV overlap (reference: boxes_aligned_overlap_bev_gpu)."""
    return jax.vmap(_pair_overlap_bev)(boxes_a, boxes_b)


def _height_overlap(za, ha, zb, hb):
    top = jnp.minimum(za + ha / 2, zb + hb / 2)
    bot = jnp.maximum(za - ha / 2, zb - hb / 2)
    return jnp.clip(top - bot, min=0.0)


@jax.jit
def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) 3-D IoU (reference: iou3d_nms_utils.boxes_iou3d_gpu)."""
    bev = boxes_overlap_bev(boxes_a, boxes_b)
    hov = _height_overlap(
        boxes_a[:, None, 2], boxes_a[:, None, 5], boxes_b[None, :, 2], boxes_b[None, :, 5]
    )
    inter = bev * hov
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, min=1e-6)


@jax.jit
def boxes_aligned_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N,) aligned 3-D IoU (reference: boxes_aligned_iou3d_gpu), used as the
    IoU-prediction training target (centerloss.py:82)."""
    bev = boxes_aligned_overlap_bev(boxes_a, boxes_b)
    hov = _height_overlap(boxes_a[:, 2], boxes_a[:, 5], boxes_b[:, 2], boxes_b[:, 5])
    inter = bev * hov
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return inter / jnp.clip(vol_a + vol_b - inter, min=1e-6)


@jax.jit
def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) rotated BEV IoU (reference: boxes_iou_bev_gpu)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    sa = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    sb = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.clip(sa + sb - inter, min=1e-8)


@jax.jit
def bbox3d_overlaps_diou(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Row-aligned closed-form axis-aligned DIoU, identical math to the
    reference (centerloss.py:139-176): yaw is ignored; the BEV extent is the
    unrotated (dx, dy) rectangle; the penalty is center distance over the
    enclosing-box diagonal.  Boxes: (N, 7)."""
    half_p = pred[:, 3:5] / 2
    half_g = gt[:, 3:5] / 2
    p_min, p_max = pred[:, :2] - half_p, pred[:, :2] + half_p
    g_min, g_max = gt[:, :2] - half_g, gt[:, :2] + half_g

    inter_xy = jnp.clip(jnp.minimum(p_max, g_max) - jnp.maximum(p_min, g_min), min=0.0)
    outer_xy = jnp.clip(jnp.maximum(p_max, g_max) - jnp.minimum(p_min, g_min), min=0.0)

    inter_h = _height_overlap(pred[:, 2], pred[:, 5], gt[:, 2], gt[:, 5])
    outer_h = jnp.clip(
        jnp.maximum(pred[:, 2] + pred[:, 5] / 2, gt[:, 2] + gt[:, 5] / 2)
        - jnp.minimum(pred[:, 2] - pred[:, 5] / 2, gt[:, 2] - gt[:, 5] / 2),
        min=0.0,
    )

    vol_p = pred[:, 3] * pred[:, 4] * pred[:, 5]
    vol_g = gt[:, 3] * gt[:, 4] * gt[:, 5]
    vol_inter = inter_xy[:, 0] * inter_xy[:, 1] * inter_h
    vol_union = vol_p + vol_g - vol_inter

    inter_diag = jnp.sum((gt[:, :3] - pred[:, :3]) ** 2, axis=-1)
    outer_diag = outer_xy[:, 0] ** 2 + outer_xy[:, 1] ** 2 + outer_h**2

    diou = vol_inter / vol_union - inter_diag / outer_diag
    return jnp.clip(diou, min=-1.0, max=1.0)
