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

    # --- bit bisection: the k-th largest key is the largest threshold T
    # with count(keys >= T) >= k (count is non-increasing in T, so greedy
    # bit-building from the MSB is exact).  33 compare+reduce passes over
    # (L, N) — ~20x less compute than the former per-pass 256-bin
    # histogram, whose (L, N, 256) broadcast-compare dominated the
    # measured predict cost of the exact path.
    kth = jnp.zeros((l, 1), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = kth | jnp.uint32(1 << bit)
        cnt = jnp.sum(keys >= cand, axis=1, dtype=jnp.int32)[:, None]
        kth = jnp.where(cnt >= k, cand, kth)
    # rank of the k-th key among its equals (for lax.top_k tie semantics)
    greater = jnp.sum(keys > kth, axis=1, dtype=jnp.int32)[:, None]
    remaining = jnp.full((l, 1), k, jnp.int32) - greater

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
