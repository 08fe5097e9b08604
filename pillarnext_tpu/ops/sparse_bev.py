"""Compact active-site representation of a BEV (or voxel) grid.

The reader emits this instead of a dense image when the backbone can consume
it: ``table`` holds features of the ~4%-occupied cells (fixed capacity,
static shapes), ``slot_of_dense``/``slot_id`` are the two directions of the
dense<->compact index map built by ops/compact.py.  It is the TPU analogue
of spconv's ``SparseConvTensor`` (reference sparse_resnet.py:61-64) — but
with static shapes so the whole model stays one XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from pillarnext_tpu.ops.densify import densify


@struct.dataclass
class SparseBEV:
    table: jnp.ndarray          # (cap + 1, C); row cap is the all-zero dump row
    valid: jnp.ndarray          # (cap,) bool — slot is an occupied cell
    slot_of_dense: jnp.ndarray  # (B * prod(spatial),) int32 -> slot, cap if empty
    slot_id: jnp.ndarray        # (cap,) int32 dense position (B*prod(spatial) if unused)
    batch: int = struct.field(pytree_node=False)
    spatial: tuple = struct.field(pytree_node=False)  # (H, W) or (D, H, W)

    @property
    def capacity(self) -> int:
        return self.valid.shape[0]

    def with_table(self, features: jnp.ndarray) -> "SparseBEV":
        """Replace per-slot features; appends the zero dump row if absent."""
        if features.shape[0] == self.capacity:
            features = jnp.concatenate(
                [features, jnp.zeros((1, features.shape[-1]), features.dtype)], axis=0
            )
        return self.replace(table=features)

    def to_dense(self) -> jnp.ndarray:
        """(B, *spatial, C) via one gather (O(cap) backward, ops/densify.py)."""
        dense = densify(self.table, self.slot_of_dense, self.slot_id)
        return dense.reshape(self.batch, *self.spatial, self.table.shape[-1])
