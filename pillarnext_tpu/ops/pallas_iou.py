"""Pallas TPU kernel: tiled rotated BEV IoU matrix.

The polygon-clip core (core/jax_box_ops.overlap_core) is pure elementwise
arithmetic, so a tile of box pairs maps directly onto the VPU: the kernel
loads a (TM, 7) strip of A-boxes and a (TN, 7) strip of B-boxes into VMEM and
evaluates the whole ~2k-op clip chain on (TM, TN) register/VMEM tiles —
no HBM intermediates at all (the XLA fallback materializes whatever the
fusion heuristics decide to spill).  Output: the (M, N) IoU matrix.

Used by the NMS overlap tests and available as a drop-in for
core.jax_box_ops.boxes_iou_bev on TPU (PNX_USE_PALLAS_IOU=1); runs in
interpreter mode on CPU for the test suite.

DEPLOYMENT STATUS (round 2): Mosaic kernel compilation HANGS through the
remote-TPU (axon) tunnel — including a trivial 2-line elementwise kernel
(tools/pallas_probe.py; >900 s, reproduced twice in round 1 and round 2).
This is an infrastructure limitation of the tunneled compile path, not a
kernel defect: the kernel is interpreter-verified against the XLA
implementation to 1e-3.  On a directly-attached TPU runtime, wire it in
via PNX_USE_PALLAS_IOU and validate with tools/pallas_probe.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pillarnext_tpu.core.jax_box_ops import overlap_core

_TM = 128
_TN = 128


def _iou_kernel(a_ref, b_ref, out_ref):
    a = a_ref[:]  # (TM, 8) padded box rows
    b = b_ref[:]  # (TN, 8)

    def col(arr, i):
        return arr[:, i]

    ax, ay, adx, ady, ayaw = (col(a, 0), col(a, 1), col(a, 3), col(a, 4), col(a, 6))
    bx, by, bdx, bdy, byaw = (col(b, 0), col(b, 1), col(b, 3), col(b, 4), col(b, 6))

    inter = overlap_core(
        ax[:, None], ay[:, None], adx[:, None], ady[:, None], ayaw[:, None],
        bx[None, :], by[None, :], bdx[None, :], bdy[None, :], byaw[None, :],
    )
    sa = (adx * ady)[:, None]
    sb = (bdx * bdy)[None, :]
    out_ref[:] = inter / jnp.maximum(sa + sb - inter, 1e-8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def boxes_iou_bev_pallas(
    boxes_a: jnp.ndarray, boxes_b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(M, N) rotated BEV IoU via the tiled Pallas kernel.

    Boxes are (.., 7) [x, y, z, dx, dy, dz, yaw]; rows are padded to tile
    multiples (degenerate zero boxes produce IoU 0 against everything).
    """
    m, n = boxes_a.shape[0], boxes_b.shape[0]
    mp = -(-m // _TM) * _TM
    np_ = -(-n // _TN) * _TN

    def pad(x, rows):
        out = jnp.zeros((rows, 8), jnp.float32)
        return out.at[: x.shape[0], :7].set(x[:, :7].astype(jnp.float32))

    a = pad(boxes_a, mp)
    b = pad(boxes_b, np_)

    out = pl.pallas_call(
        _iou_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid=(mp // _TM, np_ // _TN),
        in_specs=[
            pl.BlockSpec((_TM, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((_TN, 8), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((_TM, _TN), lambda i, j: (i, j)),
        interpret=interpret,
    )(a, b)
    return out[:m, :n]
