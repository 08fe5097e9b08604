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


def gather_segments(
    table: jnp.ndarray,
    segment_ids: jnp.ndarray,
    indices_are_sorted: bool = True,
    zero_dump_row: bool = False,
) -> jnp.ndarray:
    """``table[segment_ids]`` with a SORTED segment-sum backward.

    Autodiff of a plain gather emits a generic scatter-add WITHOUT the
    sorted/duplicate hints, which serializes colliding updates on TPU — and
    the pillar pipeline's broadcast-back gathers (``pillar_max[seg_ids]``,
    ``mean_xyz[slot]``) have ~5 colliding points per pillar by construction.
    The custom VJP re-expresses the backward as ``segment_sum`` with
    ``indices_are_sorted`` carried through.

    zero_dump_row: caller asserts the LAST table row is exactly zero and that
        the non-dump ids ascend with every slot in between occupied (the
        compact-pipeline invariant) — enables the windowed Pallas gather on
        TPU (ops/pallas_gather.py), bit-identical under that contract.
    """
    num_segments = table.shape[0]

    @jax.custom_vjp
    def _gather(t):
        from pillarnext_tpu.ops.pallas_gather import monotone_row_gather, pallas_enabled

        if (
            zero_dump_row
            and indices_are_sorted
            and pallas_enabled()
            and t.shape[-1] >= 8
        ):
            return monotone_row_gather(t[: num_segments - 1], segment_ids)
        return jnp.take(t, segment_ids, axis=0, indices_are_sorted=indices_are_sorted)

    def _fwd(t):
        return _gather(t), None

    def _bwd(_, g):
        return (
            jax.ops.segment_sum(
                g,
                segment_ids,
                num_segments=num_segments,
                indices_are_sorted=indices_are_sorted,
            ),
        )

    _gather.defvjp(_fwd, _bwd)
    return _gather(table)


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
