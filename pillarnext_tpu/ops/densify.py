"""Compact-table -> dense-grid gather with a gather-based custom VJP.

Forward: ``dense[i] = table[slot_of_dense[i]]`` — a plain gather.

The autodiff backward of that gather is a scatter-add in which every EMPTY
dense cell (the vast majority: ~1.7M of 1.8M on the nuScenes grid) hits the
single dump row — XLA TPU scatter serializes colliding updates, which turned
the training step into seconds.  But the gather map is (pseudo-)invertible by
construction: every real slot appears at exactly one dense position
(``slot_id``), so

    d table[j] = d dense[slot_id[j]]        (real slots)
    d table[dump] = 0

The dump row's true cotangent (the sum over all empty cells) is provably
dead downstream: the dump row is produced by reductions over points whose
features were zeroed by the validity mask, so its gradient is annihilated at
the mask regardless — dropping it changes nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pillarnext_tpu.ops.pallas_gather import monotone_row_gather, pallas_enabled


def densify(table: jnp.ndarray, slot_of_dense: jnp.ndarray, slot_id: jnp.ndarray) -> jnp.ndarray:
    """Gather (rows, C) = table[slot_of_dense] with an O(cap) backward.

    Args:
        table: (cap + 1, C); row ``cap`` is the all-zero dump row.
        slot_of_dense: (rows,) int32 in [0, cap].
        slot_id: (cap,) int32 — dense position of each slot, or ``rows`` for
            unused slots (they then read the zero pad row in the backward).
    """
    rows = slot_of_dense.shape[0]
    cap = table.shape[0] - 1

    @jax.custom_vjp
    def _gather(t):
        if pallas_enabled() and t.shape[-1] >= 8:
            # slot_of_dense's real (< cap) entries ascend in dense order with
            # per-tile span <= tile rows (ops/compact.py assigns slots in
            # ascending dense-id order); the dump slot ``cap`` is all-zero,
            # identical to the kernel's sentinel-row zeros — bit-exact.
            return monotone_row_gather(t[:cap], slot_of_dense)
        return t[slot_of_dense]

    def _fwd(t):
        return _gather(t), None

    def _bwd(_, g):
        gpad = jnp.concatenate([g, jnp.zeros((1, g.shape[-1]), g.dtype)], axis=0)
        d_real = gpad[jnp.clip(slot_id, 0, rows)]
        d_dump = jnp.zeros((1, g.shape[-1]), g.dtype)
        return (jnp.concatenate([d_real, d_dump], axis=0),)

    _gather.defvjp(_fwd, _bwd)
    return _gather(table)
