"""Sparse strided convolution — gather + MXU, active-set dilating.

The TPU-native equivalent of spconv's ``SparseConv2d/3d`` with stride > 1
(reference det3d/models/utils/sparse_conv.py:16-39, 66-81: the downsample
convs of SparseResNet / SparseResNet3D).  Semantics: an OUTPUT site is
active iff its receptive window covers at least one active input site; its
value is the windowed sum over input features (inactive inputs contribute
zero).  On the nuScenes voxel18 grid (~150k active of 72M cells) this is
3-4 orders of magnitude fewer FLOPs than a dense 3-D conv — the dense
volume does not even fit HBM at config resolution.

Pipeline per downsample (all static shapes, one XLA program):

  1. ``downsample_active_set``: the dilated output set = max-pool of the
     input occupancy bitmap; compact slots assigned in dense-id order by one
     prefix-sum (sort-free — the earlier candidate-enumeration + argsort
     formulation dominated the all-sparse backbone's on-chip time).
  2. ``build_down_neighbor_tables``: per output slot the K strided-tap input
     slots (forward), and per input slot the K output slots it feeds
     (reverse, for the custom VJP — autodiff would emit serializing
     scatter-adds).
  3. ``sparse_strided_conv``: K*Cin gather + one MXU matmul; backward is a
     reverse gather + matmul (dx) and x^T @ g (dW).

Convention: kernel tap t (multi-index over kernel_shape, pad p = k//2,
stride s) reads input coord  ic = s*oc + t - p  of output coord oc.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _row_major_strides(sizes: np.ndarray) -> np.ndarray:
    return np.concatenate([np.cumprod(sizes[::-1])[::-1][1:], [1]]).astype(np.int64)


def _decode(ids: jnp.ndarray, batch: int, spatial: tuple[int, ...]):
    """Dense ids over (B, *spatial) -> (in_range, [b, c0, c1, ...])."""
    sizes = np.asarray(spatial, np.int64)
    cell = int(np.prod(sizes))
    rows = batch * cell
    ok = (ids >= 0) & (ids < rows)
    safe = jnp.where(ok, ids, 0)
    coords = [safe // cell]
    rem = safe % cell
    strides = _row_major_strides(sizes)
    for i in range(len(spatial)):
        coords.append(rem // int(strides[i]))
        rem = rem % int(strides[i])
    return ok, coords


def _encode(coords, ok, batch: int, spatial: tuple[int, ...], invalid: int):
    sizes = np.asarray(spatial, np.int64)
    strides = _row_major_strides(sizes)
    cell = int(np.prod(sizes))
    out = coords[0] * cell
    for i in range(len(spatial)):
        ci = coords[i + 1]
        ok = ok & (ci >= 0) & (ci < int(sizes[i]))
        out = out + ci * int(strides[i])
    return jnp.where(ok, out, invalid)


def out_spatial_for(spatial, kernel_shape, stride, padding=None):
    """spconv output size: floor((n + 2p - k) / s) + 1.  ``padding`` per dim
    defaults to k//2 (the stage blocks); the reference's extra z-downsample
    uses padding 0 (SparseConv3d((3,1,1),(2,1,1)) default,
    sparse_resnet3d.py:43-46)."""
    if padding is None:
        padding = tuple(k // 2 for k in kernel_shape)
    return tuple(
        (n + 2 * p - k) // s + 1
        for n, k, s, p in zip(spatial, kernel_shape, stride, padding)
    )


def downsample_active_set(
    slot_of_dense: jnp.ndarray,
    cap_in: int,
    batch: int,
    in_spatial: tuple[int, ...],
    kernel_shape: tuple[int, ...],
    stride: tuple[int, ...],
    cap_out: int,
    padding: tuple[int, ...] | None = None,
):
    """Active OUTPUT set of a strided sparse conv.

    TPU-native formulation (no sort): the dilated output set is exactly a
    max-pool of the input occupancy bitmap (window = kernel, stride =
    stride), and compact slots are assigned in ascending dense-id order by
    one prefix-sum over the pooled bitmap.  The previous formulation
    (enumerate ceil(k/s)^ndim candidate parents per active site, sort, dedup
    — one argsort over 4x the capacity per stage) was the dominant cost of
    the all-sparse backbone on chip.

    Args:
        slot_of_dense: (B * prod(in_spatial),) int32 dense -> slot map of the
            INPUT set (``cap_in`` where empty) — only occupancy is used.
        cap_in: the input table capacity (= the empty marker value).

    Returns (out_slot_id (cap_out,), out_slot_of_dense (B*prod(out_sp),),
    out_valid (cap_out,), out_spatial, n_out) — ``n_out`` is the TRUE dilated
    active count; ``n_out > cap_out`` means sites were silently truncated
    (callers must surface it as overflow telemetry).
    """
    if padding is None:
        padding = tuple(k // 2 for k in kernel_shape)
    out_sp = out_spatial_for(in_spatial, kernel_shape, stride, padding)
    out_rows = batch * int(np.prod(out_sp))

    in_mask = (slot_of_dense < cap_in).astype(jnp.int32).reshape(batch, *in_spatial)
    out_mask = jax.lax.reduce_window(
        in_mask,
        jnp.array(0, jnp.int32),
        jax.lax.max,
        (1, *kernel_shape),
        (1, *stride),
        ((0, 0), *[(p, p) for p in padding]),
    ).reshape(-1)

    slots = jnp.cumsum(out_mask) - 1  # ascending dense-id slot per occupied cell
    n_out = slots[-1] + 1
    occupied = (out_mask > 0) & (slots < cap_out)
    out_sod = jnp.where(occupied, slots, cap_out).astype(jnp.int32)

    # slot -> dense id: scatter (unique indices; overflow/empty rows dropped)
    idx = jnp.where(occupied, slots, cap_out + 1)
    out_slot_id = jnp.full((cap_out + 1,), out_rows, jnp.int32)
    out_slot_id = out_slot_id.at[idx].set(
        jnp.arange(out_rows, dtype=jnp.int32), mode="drop", unique_indices=True
    )[:cap_out]
    out_valid = out_slot_id < out_rows
    return out_slot_id, out_sod, out_valid, out_sp, n_out


def build_down_neighbor_tables(
    in_slot_of_dense: jnp.ndarray,
    out_slot_id: jnp.ndarray,
    out_slot_of_dense: jnp.ndarray,
    in_slot_id: jnp.ndarray,
    batch: int,
    in_spatial: tuple[int, ...],
    kernel_shape: tuple[int, ...],
    stride: tuple[int, ...],
    padding: tuple[int, ...] | None = None,
):
    """(nbr_fwd (cap_out, K) -> input slots, nbr_rev (cap_in, K) -> output
    slots); K = prod(kernel_shape).  Inactive entries hold the respective
    dump index (cap_in / cap_out)."""
    if padding is None:
        padding = tuple(k // 2 for k in kernel_shape)
    out_sp = out_spatial_for(in_spatial, kernel_shape, stride, padding)
    cap_in = in_slot_id.shape[0]
    cap_out = out_slot_id.shape[0]
    in_rows = in_slot_of_dense.shape[0]
    out_rows = out_slot_of_dense.shape[0]

    taps = list(itertools.product(*[range(k) for k in kernel_shape]))

    # forward: out slot -> K input slots
    ok_o, oc = _decode(out_slot_id, batch, out_sp)
    fwd = []
    for t in taps:
        ic = [oc[0]]
        for i, (k, s) in enumerate(zip(kernel_shape, stride)):
            p = padding[i]
            ic.append(oc[i + 1] * s + t[i] - p)
        did = _encode(ic, ok_o, batch, in_spatial, in_rows)
        safe = jnp.where(did < in_rows, did, 0)
        fwd.append(jnp.where(did < in_rows, in_slot_of_dense[safe], cap_in))
    nbr_fwd = jnp.stack(fwd, axis=-1)

    # reverse: in slot -> K output slots.  Adjoint of the forward table —
    # rev[i, t] = o  <=>  fwd[o, t] = i  (tap t reads input i of output o),
    # so ONE unique-index scatter of fwd replaces K gathers over the output
    # dense map + the per-tap divisibility algebra (measured 17.7 -> ~4 ms
    # at the flagship stage-1 train shape, tools/table_probe.py).  Inactive
    # fwd entries (cap_in) route to per-(o,t)-distinct shadow rows past
    # cap_in so the scatter keeps XLA's parallel unique-indices path.
    nk = len(taps)
    o_ids = jnp.arange(cap_out, dtype=jnp.int32)
    shadow = cap_in + 1 + o_ids[:, None]
    target = jnp.where(nbr_fwd < cap_in, nbr_fwd, shadow)
    rev_full = jnp.full((cap_in + 1 + cap_out, nk), cap_out, jnp.int32)
    nbr_rev = rev_full.at[
        target, jnp.arange(nk, dtype=jnp.int32)[None, :]
    ].set(
        jnp.broadcast_to(o_ids[:, None], (cap_out, nk)),
        mode="drop",
        unique_indices=True,
    )[:cap_in]
    return nbr_fwd, nbr_rev


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def sparse_strided_conv(table, nbr_fwd, nbr_rev, kernel, precision=None):
    """Strided sparse conv over compact tables.

    Args:
        table: (cap_in + 1, Cin); row cap_in is the all-zero dump row.
        nbr_fwd: (cap_out, K) int32 input-slot per tap (cap_in = inactive).
        nbr_rev: (cap_in, K) int32 output-slot per tap (cap_out = none).
        kernel: (K, Cin, Cout).

    Returns:
        (cap_out, Cout).
    """
    return _fwd_impl(table, nbr_fwd, kernel, precision)


def _fwd_impl(table, nbr_fwd, kernel, precision):
    cap_out, k = nbr_fwd.shape
    cin = table.shape[-1]
    x = table[nbr_fwd.reshape(-1)].reshape(cap_out, k * cin)
    return jax.lax.dot(
        x, kernel.reshape(k * cin, -1).astype(table.dtype), precision=precision
    )


def _fwd(table, nbr_fwd, nbr_rev, kernel, precision):
    return _fwd_impl(table, nbr_fwd, kernel, precision), (table, nbr_fwd, nbr_rev, kernel)


def _bwd(precision, res, g):
    """Shared-gather backward: the reverse-table cotangent gather feeds BOTH
    pulls.  rev[i, t] = o  <=>  fwd[o, t] = i (the tables are adjoint by
    construction), so with  gr[i, t] = g[rev(i, t)]:

        dx[i] = sum_t gr[i, t] @ W[t]^T
        dW[t] = x^T @ gr[:, t]            (x itself, NOT re-gathered)

    The earlier form re-gathered x over nbr_fwd for dW — a full K-tap sweep
    over cap_out rows at the gather-descriptor floor, now gone.  Dump
    conventions keep both forms exact: fwd taps at cap_in read x's zero row,
    rev taps at cap_out read g_pad's zero row, and the (i, t) <-> (o, t)
    pairing is one-to-one over the real entries.  f32 accumulation for dW.
    """
    table, nbr_fwd, nbr_rev, kernel = res
    k = nbr_fwd.shape[1]
    cin = table.shape[-1]
    cout = kernel.shape[-1]
    cap_in = nbr_rev.shape[0]

    g_pad = jnp.concatenate([g, jnp.zeros((1, cout), g.dtype)], axis=0)
    gr = g_pad[nbr_rev.reshape(-1)].reshape(cap_in, k * cout)

    # dx[i] = sum_t gr[i, t] @ W[t]^T  (one matmul over the gathered taps)
    w_t = kernel.transpose(0, 2, 1).reshape(k * cout, cin)  # (K*Cout, Cin)
    dx_active = jax.lax.dot(gr, w_t.astype(gr.dtype), precision=precision)
    dx = jnp.concatenate([dx_active, jnp.zeros((1, cin), dx_active.dtype)], axis=0)

    # dW from the same gathered taps: (Cin, K*Cout) -> (K, Cin, Cout)
    dk = jax.lax.dot_general(
        table[:cap_in], gr, (((0,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    ).reshape(cin, k, cout).transpose(1, 0, 2)
    return dx.astype(table.dtype), None, None, dk.astype(kernel.dtype)


sparse_strided_conv.defvjp(_fwd, _bwd)
