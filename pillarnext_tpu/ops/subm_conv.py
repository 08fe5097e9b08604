"""Submanifold sparse convolution as gather + MXU matmul.

The TPU-native equivalent of spconv's ``SubMConv2d`` (reference
det3d/models/utils/sparse_conv.py:16-63, used by SparseResNet's stride-1
stages, sparse_resnet.py:50-59): outputs are computed ONLY at active sites;
inactive neighbors contribute zeros.  On the nuScenes 1344x1344 pillar grid
~4% of cells are active, so this is ~13x fewer FLOPs than a dense conv — and
it reproduces the reference's active-set semantics exactly (a dense conv +
BN would bleed a nonzero constant into empty cells; SubM never does).

Layout: active sites live in a fixed-capacity compact table ``(cap + 1, C)``
whose last row is an all-zero dump row (built by ops/compact.py).  A
neighbor-index table ``(cap, K)`` — slot index of each kernel-tap neighbor,
``cap`` where the neighbor is inactive/out-of-range — is built once per
frame from the dense->slot map and reused by every conv in the stage.

The convolution is then a K*Cin gather followed by one MXU matmul:

    y[s] = concat_k x[nbr[s, k]] @ W        W: (K*Cin, Cout)

Backward (custom VJP; autodiff would emit a serializing scatter-add):
  - dx = SubM conv of dy with the spatially mirrored, transposed kernel —
    exact because the active set is closed under neighborhood mirroring:
    nbr[s, k] = j  <=>  nbr[j, K-1-k] = s  for active s, j (offsets are
    symmetric around 0 and both lookups go through the same dense map).
  - dW[k] = x_gathered^T @ dy — one matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def subm_offsets_2d(kernel_size: int = 3) -> np.ndarray:
    """Row-major (dy, dx) offsets, centered; K = kernel_size**2."""
    r = kernel_size // 2
    return np.array(
        [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)],
        np.int32,
    )


def subm_offsets_3d(kernel_size: int = 3) -> np.ndarray:
    """Row-major (dz, dy, dx) offsets, centered; K = kernel_size**3."""
    r = kernel_size // 2
    return np.array(
        [
            (dz, dy, dx)
            for dz in range(-r, r + 1)
            for dy in range(-r, r + 1)
            for dx in range(-r, r + 1)
        ],
        np.int32,
    )


def build_neighbor_table(
    slot_of_dense: jnp.ndarray,
    slot_id: jnp.ndarray,
    spatial: tuple[int, ...],
    offsets: np.ndarray,
    cap: int,
) -> jnp.ndarray:
    """Neighbor slot indices for every active slot.

    Args:
        slot_of_dense: (B * prod(spatial),) int32 dense-position -> slot,
            ``cap`` where the cell is empty.
        slot_id: (cap,) int32 dense position of each slot (row-major over
            (B, *spatial)); unused slots hold an out-of-range id.
        spatial: the dense grid shape, e.g. (H, W) or (D, H, W).
        offsets: (K, len(spatial)) int32 kernel-tap offsets.
        cap: table capacity (dump slot index).

    Returns:
        (cap, K) int32 — neighbor slot per tap, ``cap`` when inactive.
    """
    ndim = len(spatial)
    sizes = np.asarray(spatial, np.int64)
    strides = np.concatenate([np.cumprod(sizes[::-1])[::-1][1:], [1]]).astype(np.int32)
    cell = int(np.prod(sizes))

    d = slot_id.astype(jnp.int32)
    in_table = d < slot_of_dense.shape[0]
    d_safe = jnp.where(in_table, d, 0)
    rem = d_safe % cell
    coords = []
    for i in range(ndim):
        coords.append(rem // int(strides[i]))
        rem = rem % int(strides[i])

    ar = jnp.arange(d.shape[0], dtype=jnp.int32)
    nbrs = []
    for k in range(offsets.shape[0]):
        off = tuple(int(o) for o in offsets[k])
        if all(o == 0 for o in off[:-1]) and abs(off[-1]) <= 1:
            # Same-dense-row taps at |dx| <= 1 need NO dense-map gather:
            # compact slots are assigned in ascending dense-id order
            # (ops/compact.py), so if cell d+1 is active its slot is exactly
            # s+1 (no dense id lies between) — a roll + compare on slot_id.
            # Saves 3 of 9 gather sweeps per 3x3 build (measured
            # tools/table_probe.py; same invariant as _inline_tap_masks).
            dx = off[-1]
            if dx == 0:
                nbrs.append(jnp.where(in_table, ar, cap))
                continue
            cand = ar + dx
            nid = jnp.roll(d, -dx)  # slot_id[s + dx] (wrap rows fail the ==)
            ok = (
                in_table
                & (cand >= 0)
                & (cand < d.shape[0])
                & (coords[-1] + dx >= 0)
                & (coords[-1] + dx < int(sizes[-1]))
                & (nid == d + dx)
            )
            nbrs.append(jnp.where(ok, cand, cap))
            continue
        nd = d_safe
        ok = in_table
        for i in range(ndim):
            ci = coords[i] + off[i]
            ok = ok & (ci >= 0) & (ci < int(sizes[i]))
            nd = nd + off[i] * int(strides[i])
        nd = jnp.where(ok, nd, 0)
        nbrs.append(jnp.where(ok, slot_of_dense[nd], cap))
    return jnp.stack(nbrs, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def subm_conv(table: jnp.ndarray, nbr: jnp.ndarray, kernel: jnp.ndarray, precision=None):
    """SubM conv over a compact active-site table.

    Args:
        table: (cap + 1, Cin); row ``cap`` MUST be all-zero (dump row).
        nbr: (cap, K) int32 neighbor slots (``cap`` = inactive).
        kernel: (K, Cin, Cout).

    Returns:
        (cap, Cout) — same active set (append a zero row before chaining).
    """
    return _subm_fwd_impl(table, nbr, kernel, precision)


def _inline_tap_masks(nbr, cap):
    """Validity masks for the dx=+-1 taps of the center spatial row.

    Because compact slots are assigned in ascending dense row-major order
    (ops/compact.py:47-62), the dense cell one column to the right of slot
    ``j``'s cell — IF active — is always slot ``j + 1`` (no dense id lies
    between d and d+1).  So the (.,0,+1) tap is a roll instead of a gather;
    the mask checks the neighbor table agrees (it is ``cap`` at grid edges
    and where the cell is empty).
    """
    k = nbr.shape[1]
    c = k // 2
    ar = jnp.arange(cap, dtype=nbr.dtype)
    mr = (nbr[:, c + 1] == ar + 1) & (ar + 1 < cap)
    ml = nbr[:, c - 1] == ar - 1
    # center tap: self-reference iff the slot is real (cap for unused slots)
    # — masking keeps outputs/grads exactly zero at unused rows even when
    # the input's unused rows are nonzero (e.g. cotangents in the VJP)
    mc = nbr[:, c] == ar
    return mr[:, None], ml[:, None], mc[:, None]


def _subm_fwd_impl(table, nbr, kernel, precision):
    """Tap-decomposed SubM conv: 3 of K taps need no gather.

    XLA's row gather runs at a fixed ~230M rows/s descriptor rate (measured
    tools/pallas_gather_probe.py lineage); gathering all K taps costs
    ~2.9 ms/conv at the flagship stage-0 shape.  The center tap is the
    identity and the two dx=+-1 taps of the center row are rolls of the
    slot-ordered table, so only K-3 taps are gathered: 1.67 ms/conv
    measured — same math, bit-exact.
    """
    cap, k = nbr.shape
    cin = table.shape[-1]
    c = k // 2
    kern = kernel.reshape(k, cin, -1).astype(table.dtype)
    xa = table[:cap]
    if k == 1:  # 1x1 SubM conv: center tap only
        ar = jnp.arange(cap, dtype=nbr.dtype)
        mc = (nbr[:, 0] == ar)[:, None].astype(table.dtype)
        return jax.lax.dot(xa * mc, kern[0], precision=precision)
    mr, ml, mc = _inline_tap_masks(nbr, cap)
    y = jax.lax.dot(xa * mc.astype(table.dtype), kern[c], precision=precision)
    y = y + jax.lax.dot(
        jnp.roll(xa, -1, 0) * mr.astype(table.dtype), kern[c + 1], precision=precision
    )
    y = y + jax.lax.dot(
        jnp.roll(xa, 1, 0) * ml.astype(table.dtype), kern[c - 1], precision=precision
    )
    rest = [t for t in range(k) if t not in (c - 1, c, c + 1)]
    x = table[nbr[:, jnp.array(rest)].reshape(-1)].reshape(cap, len(rest) * cin)
    y = y + jax.lax.dot(
        x,
        kernel[jnp.array(rest)].reshape(len(rest) * cin, -1).astype(table.dtype),
        precision=precision,
    )
    return y


def _subm_fwd(table, nbr, kernel, precision):
    return _subm_fwd_impl(table, nbr, kernel, precision), (table, nbr, kernel)


def _subm_bwd(precision, res, g):
    """Shared-gather backward: ONE cotangent gather sweep feeds BOTH pulls.

    By the mirror bijection (nbr[j, k] = i  <=>  nbr[i, K-1-k] = j for
    active i, j), the gathered cotangent taps H_m = g[nbr[:, m]] give

        dx[i] = sum_m H_m[i] @ W[K-1-m]^T          (mirrored-transposed conv)
        dW[k] = x^T @ H_{K-1-k}                     (x itself, NOT re-gathered)

    The earlier form re-gathered x for dW — a second (K-3)-tap sweep per
    conv backward at the ~230M-descriptors/s gather floor.  Dropping it cuts
    the backward's gather cost in half (measured tools/train_breakdown.py).
    Operands stay in their storage dtype with f32 ACCUMULATION for dW; dump
    conventions make both forms exact (invalid taps read the zero row either
    way).  Tap-decomposed like the forward: center/roll taps need no gather.
    """
    table, nbr, kernel = res
    cap, k = nbr.shape
    cin = table.shape[-1]
    cout = kernel.shape[-1]
    c = k // 2
    xa = table[:cap]
    w = kernel.astype(g.dtype)

    def _dk(h_tap):  # (cap, Cout) -> (Cin, Cout), f32 accumulation
        return jax.lax.dot_general(
            xa, h_tap, (((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )

    if k == 1:
        ar = jnp.arange(cap, dtype=nbr.dtype)
        mc = (nbr[:, 0] == ar)[:, None].astype(g.dtype)
        h_c = g * mc
        dk = _dk(h_c).reshape(1, cin, cout)
        dx_active = jax.lax.dot(h_c, w[0].T, precision=precision)
    else:
        rest = [t for t in range(k) if t not in (c - 1, c, c + 1)]
        mr, ml, mc = _inline_tap_masks(nbr, cap)
        h_c = g * mc.astype(g.dtype)
        h_r = jnp.roll(g, -1, 0) * mr.astype(g.dtype)  # tap c+1 of g
        h_l = jnp.roll(g, 1, 0) * ml.astype(g.dtype)  # tap c-1 of g
        g_pad = jnp.concatenate([g, jnp.zeros((1, cout), g.dtype)], axis=0)
        h_rest = g_pad[nbr[:, jnp.array(rest)].reshape(-1)].reshape(
            cap, len(rest) * cout
        )

        # dx: H_m paired with the mirrored tap's kernel
        dx_active = jax.lax.dot(h_c, w[c].T, precision=precision)
        dx_active = dx_active + jax.lax.dot(h_r, w[c - 1].T, precision=precision)
        dx_active = dx_active + jax.lax.dot(h_l, w[c + 1].T, precision=precision)
        w_rest_t = jnp.stack([w[k - 1 - m] for m in rest], 0).transpose(
            0, 2, 1
        ).reshape(len(rest) * cout, cin)
        dx_active = dx_active + jax.lax.dot(h_rest, w_rest_t, precision=precision)

        # dW: the SAME H taps, mirrored assignment
        dk = jnp.zeros((k, cin, cout), jnp.float32)
        dk = dk.at[c].set(_dk(h_c))
        dk = dk.at[c - 1].set(_dk(h_r))  # K-1-(c-1) = c+1 -> H_r
        dk = dk.at[c + 1].set(_dk(h_l))
        dk_rest = _dk(h_rest).reshape(cin, len(rest), cout)
        for i, m in enumerate(rest):  # static, 6 (2-D) / 24 (3-D) slices
            dk = dk.at[k - 1 - m].set(dk_rest[:, i, :])

    dx = jnp.concatenate(
        [dx_active, jnp.zeros((1, cin), dx_active.dtype)], axis=0
    )
    return dx.astype(table.dtype), None, dk.astype(kernel.dtype)


subm_conv.defvjp(_subm_fwd, _subm_bwd)
