"""Exact batched top-k by radix select — the TPU-native replacement for the
full-lane sort behind ``jax.lax.top_k``.

The CenterHead predict path needs the top ``nms_pre_max_size`` (1000) of
~113k heatmap scores per (batch x class) NMS lane (reference semantics:
torch ``.topk`` over masked scores, centerhead.py:332-384).  ``lax.top_k``
lowers to a full variadic sort of the lane (O(N log N) bitonic passes);
``approx_max_k`` is fast but drops ~5% of the tail.  This kernel is exact
AND cheap: 4 histogram passes find the k-th largest float's bit pattern
(radix select over the monotone unsigned transform of IEEE-754), then one
prefix-sum compacts the >= k-th elements and one tiny (L, k) sort orders
them.  All passes are branch-free elementwise/reduce ops that XLA fuses —
no (L, N, 256) intermediate is materialized.

Tie semantics match ``lax.top_k``: ascending index among equal scores
(selection scans in index order; the final sort is stable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sortable_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone f32 -> uint32: a > b  <=>  key(a) > key(b) (incl. +-inf)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where(b >> 31 == 1, ~b, b | jnp.uint32(0x80000000))


def exact_top_k(scores: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(L, N) scores -> (values (L, k), indices (L, k)), descending, exact.

    Equivalent to ``jax.lax.top_k(scores, k)`` (same values, same tie
    order) for non-NaN input.
    """
    l, n = scores.shape
    if k >= n:
        return jax.lax.top_k(scores, k)
    keys = _sortable_bits(scores)  # (L, N)

    # --- radix select: find the k-th largest key, 8 bits per pass
    prefix = jnp.zeros((l, 1), jnp.uint32)  # known high bits of the k-th key
    remaining = jnp.full((l, 1), k, jnp.int32)  # rank within the prefix class
    bins = jnp.arange(256, dtype=jnp.uint32)
    for shift in (24, 16, 8, 0):
        high = keys >> jnp.uint32(shift + 8) if shift < 24 else jnp.zeros_like(keys)
        match = high == (prefix >> jnp.uint32(shift + 8) if shift < 24 else prefix)
        digit = (keys >> jnp.uint32(shift)) & jnp.uint32(0xFF)
        # hist[l, d] = #elements in the prefix class with this digit —
        # broadcast-compare fused into the reduction over N
        hist = jnp.sum(
            (digit[:, :, None] == bins[None, None, :]) & match[:, :, None],
            axis=1,
            dtype=jnp.int32,
        )  # (L, 256)
        # descending cumulative count: c[d] = #elements with digit >= d
        c = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1]
        # selected digit = max d with c[d] >= remaining
        ge = c >= remaining
        dsel = jnp.max(jnp.where(ge, bins[None, :].astype(jnp.int32), -1), axis=1)
        dsel = jnp.maximum(dsel, 0).astype(jnp.uint32)[:, None]
        # strictly-greater count = c[dsel + 1] (0 when dsel == 255)
        c_pad = jnp.concatenate([c, jnp.zeros((l, 1), jnp.int32)], axis=1)
        greater = jnp.take_along_axis(c_pad, dsel.astype(jnp.int32) + 1, axis=1)
        remaining = remaining - greater
        prefix = prefix | (dsel << jnp.uint32(shift))

    kth = prefix  # (L, 1) exact bit pattern of the k-th largest

    # --- selection: all > kth, plus the first `remaining` == kth (index order)
    gt = keys > kth
    eq = keys == kth
    eq_rank = jnp.cumsum(eq.astype(jnp.int32), axis=1)
    sel = gt | (eq & (eq_rank <= remaining))

    # compact selected indices into (L, k) slots in index order: the cumsum
    # of the selection mask is monotone, so slot j's index is the first
    # position where it reaches j+1 — a vectorized binary search, not a
    # TPU scatter (the previous .at[slot].set compaction was the dominant
    # cost of the whole select on chip)
    csum = jnp.cumsum(sel.astype(jnp.int32), axis=1)
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)
    idx = jax.vmap(
        lambda c: jnp.searchsorted(c, targets, side="left").astype(jnp.int32)
    )(csum)

    vals = jnp.take_along_axis(scores, idx, axis=1)
    # order by descending score; stable sort keeps ascending-index tie order
    order = jnp.argsort(-vals, axis=1, stable=True)
    return jnp.take_along_axis(vals, order, axis=1), jnp.take_along_axis(
        idx, order, axis=1
    )
