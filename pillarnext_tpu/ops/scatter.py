"""Segment reductions over static-shape point buffers.

TPU-native replacement for torch_scatter's ``scatter_max`` / ``scatter_mean``
(reference usage: det3d/models/readers/pillar_encoder.py:43-50,113).  On TPU
these lower to XLA scatter/gather over a fixed-capacity segment table — the
key contract is that *shapes are static*: invalid points are routed to a dump
segment (``num_segments``-th row) that is sliced off.

Gradient semantics: ``segment_max``'s VJP routes the cotangent to the argmax
element (ties split evenly by XLA scatter-max VJP); torch_scatter routes to
the recorded argmax.  Training is insensitive to the tie choice (measure-zero
event in float32); tests pin down the non-tie behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Sum of ``data`` rows per segment; (num_segments, C)."""
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Mean of ``data`` rows per segment (empty segments produce 0)."""
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    count = segment_sum(
        jnp.ones((data.shape[0],), data.dtype),
        segment_ids,
        num_segments,
        indices_are_sorted,
    )
    return total / jnp.maximum(count, 1.0)[:, None]


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Max of ``data`` rows per segment (empty segments produce 0, matching
    torch_scatter's zero-init behavior on float inputs >= 0 after ReLU)."""
    out = jax.ops.segment_max(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    # segment_max initializes empties to -inf; clamp like the reference's
    # zeros-filled dense() view of untouched pillars.
    return jnp.where(jnp.isfinite(out), out, 0.0)
