"""On-device (jittable) rotated-box geometry.

TPU-native replacement for the reference CUDA IoU kernels
(reference: det3d/core/iou3d_nms/src/iou3d_nms_kernel.cu:104-278 and the
host mirror iou3d_cpu.cpp).  The branch-heavy polygon-clip in the reference
is re-derived branch-free: Sutherland–Hodgman with fixed 8-slot vertex
buffers, written as pure *elementwise* arithmetic over broadcastable
components — no sorts, no scatters, no gathers.  The same core therefore
runs three ways:

- broadcast (M, 1) x (1, N) under jit for IoU matrices,
- elementwise (N,) x (N,) for row-aligned IoU.

Numerics match the exact polygon-clip oracle (core/native/geometry.cpp) to
float32 round-off; tests compare against it directly.

A tiled Pallas twin of the IoU matrix (ops/pallas_iou.py, rounds 1-4) was
CUT in round 5 after its on-chip A/B: the XLA form compiles in 121.5 s and
evaluates the full 1000x1000 nuScenes NMS matrix in **1.475 ms**, while
Mosaic compilation of the same ~2k-op clip chain as one kernel was aborted
after 31 minutes (the repo's three other Pallas kernels compile in 1-3 min
— the failure is specific to this kernel's unrolled op count, not the
toolchain).  XLA is the production path and is already far from the
bottleneck (decode+NMS ~3 ms of a ~66 ms frame).

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


def _corners_xy(x, y, dx, dy, yaw):
    """CCW corner component lists ([x0..x3], [y0..y3]) — broadcast arrays."""
    hx, hy = dx * 0.5, dy * 0.5
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = (hx, -hx, -hx, hx)
    ly = (hy, hy, -hy, -hy)
    cx = [lxi * c - lyi * s + x for lxi, lyi in zip(lx, ly)]
    cy = [lxi * s + lyi * c + y for lxi, lyi in zip(lx, ly)]
    return cx, cy


def _clip_by_halfplane(vx, vy, n, q0x, q0y, q1x, q1y):
    """One Sutherland–Hodgman pass in elementwise ("register") form.

    ``vx``/``vy`` are Python lists of _MAX_VERTS coordinate arrays holding a
    compacted ring of ``n`` (array) vertices; the ring is clipped against the
    left half-plane of directed edge q0->q1.  Every op is elementwise over
    the broadcast pair shape, so XLA fuses the whole pass into one kernel
    and Pallas runs it on VMEM tiles.
    """
    v = _MAX_VERTS
    ex, ey = q1x - q0x, q1y - q0y

    s = [ex * (vy[i] - q0y) - ey * (vx[i] - q0x) for i in range(v)]
    inside = [si >= 0 for si in s]

    def nxt(i):
        # (successor insideness is recomputed from the selected s rather than
        # select-ing booleans — Mosaic rejects i1 vector selects)
        if i + 1 < v:
            wrap = n == i + 1
            ns = jnp.where(wrap, s[0], s[i + 1])
            return (
                jnp.where(wrap, vx[0], vx[i + 1]),
                jnp.where(wrap, vy[0], vy[i + 1]),
                ns,
                ns >= 0,
            )
        return vx[0], vy[0], s[0], inside[0]

    emit_x, emit_y, emit_ok = [], [], []
    for i in range(v):
        active = n > i
        nx_, ny_, ns_, nin_ = nxt(i)
        denom = s[i] - ns_
        # clamp to the segment: with near-collinear edges (e.g. identical
        # boxes) fp noise can fake a crossing with a ~0 denominator; the
        # intersection must lie between the endpoints regardless
        t = jnp.clip(
            s[i] / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom), 0.0, 1.0
        )
        ix = vx[i] + t * (nx_ - vx[i])
        iy = vy[i] + t * (ny_ - vy[i])
        emit_x += [vx[i], ix]
        emit_y += [vy[i], iy]
        emit_ok += [active & inside[i], active & (inside[i] != nin_)]

    # order-preserving compaction: emitted slot i lands at position
    # pos_i = #emitted before i; out[j] = select_i [ok_i & pos_i == j] pt_i
    pos = []
    run = None
    for ok in emit_ok:
        pos.append(run if run is not None else jnp.zeros_like(ok, jnp.int32))
        inc = ok.astype(jnp.int32)
        run = inc if run is None else run + inc
    out_x, out_y = [], []
    zero = jnp.zeros_like(vx[0])
    for j in range(v):
        ox, oy = zero, zero
        for i in range(2 * v):
            hit = emit_ok[i] & (pos[i] == j)
            ox = jnp.where(hit, emit_x[i], ox)
            oy = jnp.where(hit, emit_y[i], oy)
        out_x.append(ox)
        out_y.append(oy)
    return out_x, out_y, run


def overlap_core_clip(ax, ay, adx, ady, ayaw, bx, by, bdx, bdy, byaw):
    """Sutherland–Hodgman reference formulation (kept for cross-checks)."""
    cax, cay = _corners_xy(ax, ay, adx, ady, ayaw)
    cbx, cby = _corners_xy(bx, by, bdx, bdy, byaw)

    shape = jnp.broadcast_shapes(
        *(jnp.shape(c) for c in (cax[0], cbx[0]))
    )
    zero = jnp.zeros(shape, cax[0].dtype if hasattr(cax[0], "dtype") else jnp.float32)
    vx = [jnp.broadcast_to(c, shape) for c in cax] + [zero] * (_MAX_VERTS - 4)
    vy = [jnp.broadcast_to(c, shape) for c in cay] + [zero] * (_MAX_VERTS - 4)
    n = jnp.full(shape, 4, jnp.int32)
    for k in range(4):
        k2 = (k + 1) % 4
        vx, vy, n = _clip_by_halfplane(vx, vy, n, cbx[k], cby[k], cbx[k2], cby[k2])

    # shoelace fan from vertex 0; slot i contributes while i+1 < n
    area = zero
    for i in range(1, _MAX_VERTS - 1):
        tri = (vx[i] - vx[0]) * (vy[i + 1] - vy[0]) - (vy[i] - vy[0]) * (
            vx[i + 1] - vx[0]
        )
        area = area + jnp.where(n > i + 1, tri, 0.0)
    return jnp.where(n >= 3, 0.5 * jnp.abs(area), 0.0)


_EPS_DIST = 1e-5  # on-boundary margin, in meters of point-to-edge distance


def _boundary_integral(px, py, qx, qy, inclusive):
    """Sum of line integrals ∮(x dy - y dx) of polygon P's edges restricted
    to polygon Q's interior, via per-edge t-interval clipping.

    px/py, qx/qy: lists of 4 CCW corner arrays.  ``inclusive`` decides how
    edges lying exactly ON Q's boundary count (True: inside; False: outside)
    — the asymmetry prevents double-counting coincident boundaries.
    """
    # signed "distances": s[i][k] = cross(Qedge_k, P_i - Qcorner_k)
    ex = [qx[(k + 1) % 4] - qx[k] for k in range(4)]
    ey = [qy[(k + 1) % 4] - qy[k] for k in range(4)]
    scale = [jnp.abs(ex[k]) + jnp.abs(ey[k]) + 1e-12 for k in range(4)]
    s = [
        [ex[k] * (py[i] - qy[k]) - ey[k] * (px[i] - qx[k]) for k in range(4)]
        for i in range(4)
    ]

    total = None
    for i in range(4):
        j = (i + 1) % 4
        t_lo, t_hi = None, None
        for k in range(4):
            s0, s1 = s[i][k], s[j][k]
            denom = s1 - s0
            # degeneracy must be judged at the coincident-edge noise scale
            # (RELATIVE): identical boxes give s0,s1 ~ fp-noise and denom far
            # above any absolute tiny — an absolute test lets -s0/denom emit
            # garbage interval bounds
            margin = _EPS_DIST * scale[k]
            degen = jnp.abs(denom) < margin
            tc = -s0 / jnp.where(degen, margin, denom)
            if inclusive:
                degen_empty = degen & (s0 < -margin)
            else:
                degen_empty = degen & (s0 < margin)
            lo_k = jnp.where(~degen & (denom > 0), tc, jnp.where(degen_empty, 2.0, 0.0))
            hi_k = jnp.where(~degen & (denom < 0), tc, jnp.where(degen_empty, -1.0, 1.0))
            t_lo = lo_k if t_lo is None else jnp.maximum(t_lo, lo_k)
            t_hi = hi_k if t_hi is None else jnp.minimum(t_hi, hi_k)
        t_lo = jnp.clip(t_lo, 0.0, 1.0)
        t_hi = jnp.clip(t_hi, 0.0, 1.0)
        t_hi = jnp.maximum(t_hi, t_lo)  # empty -> zero-length
        dx, dy = px[j] - px[i], py[j] - py[i]
        x0, y0 = px[i] + t_lo * dx, py[i] + t_lo * dy
        x1, y1 = px[i] + t_hi * dx, py[i] + t_hi * dy
        contrib = x0 * y1 - x1 * y0
        total = contrib if total is None else total + contrib
    return total


def overlap_core(ax, ay, adx, ady, ayaw, bx, by, bdx, bdy, byaw):
    """Exact BEV intersection area of rotated rects; all args broadcastable
    arrays, result has the broadcast shape.

    Green's-theorem formulation: Area(A∩B) = 1/2 ∮_{∂(A∩B)} (x dy - y dx),
    and the boundary consists exactly of A's edges inside B plus B's edges
    inside A — each obtainable by *interval* clipping (pure min/max, no
    vertex compaction).  ~10x fewer ops than polygon clipping, fully
    elementwise (VPU/Pallas friendly).  Coincident boundaries (identical
    boxes) count A-side only via the inclusive/exclusive margin asymmetry.
    """
    cax, cay = _corners_xy(ax, ay, adx, ady, ayaw)
    cbx, cby = _corners_xy(bx, by, bdx, bdy, byaw)
    ia = _boundary_integral(cax, cay, cbx, cby, inclusive=True)
    ib = _boundary_integral(cbx, cby, cax, cay, inclusive=False)
    return jnp.maximum(0.5 * (ia + ib), 0.0)


def _comps(boxes):
    return boxes[..., 0], boxes[..., 1], boxes[..., 3], boxes[..., 4], boxes[..., 6]


@jax.jit
def boxes_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) exact BEV overlap areas (reference: boxes_overlap_bev_gpu)."""
    a = tuple(c[:, None] for c in _comps(boxes_a))
    b = tuple(c[None, :] for c in _comps(boxes_b))
    return overlap_core(*a, *b)


@jax.jit
def boxes_aligned_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N,) row-aligned BEV overlap (reference: boxes_aligned_overlap_bev_gpu)."""
    return overlap_core(*_comps(boxes_a), *_comps(boxes_b))


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
