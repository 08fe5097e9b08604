"""Voxel reader: 3-D dynamic voxelization with mean pooling, TPU-native.

Capability parity with the reference VoxelFeatureNet
(det3d/models/readers/voxel_encoder.py:12-87): per-voxel mean of raw point
features over the 3-D grid.  Like the pillar reader, the ``torch.unique``
scheme is replaced by linearized voxel segment ids + one-sort compaction.

``output='sparse'`` (the production mode for voxel18) emits a compact
SparseBEV over the (D, H, W) grid for the gather+MXU sparse 3-D backbone —
the full nuScenes voxel18 grid is 72M cells at ~0.2% occupancy; the dense
(B, 40, 1344, 1344, C) volume would not even fit HBM.  ``output='dense'``
keeps the dense volume for small grids and oracle tests.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pillarnext_tpu.ops import scatter
from pillarnext_tpu.ops.compact import compactify, invert_slot_map
from pillarnext_tpu.ops.sparse_bev import SparseBEV
from pillarnext_tpu.ops.voxelize import VoxelGrid, voxel_coords, voxel_segment_ids


class VoxelFeatureNet(nn.Module):
    voxel_size: Sequence[float]
    pc_range: Sequence[float]
    num_input_features: int = 5
    output: str = "dense"  # 'dense' (B,D,H,W,C) | 'sparse' (SparseBEV)
    voxel_capacity: int = 262144  # compact slots per sample (sparse mode)
    dtype: jnp.dtype | None = None

    def __call__(self, points, mask, train: bool = False):
        grid = VoxelGrid.create(self.voxel_size, self.pc_range)
        b, n, d = points.shape
        nvox = grid.num_voxels

        xyz = points[..., :3].reshape(-1, 3)
        flat_valid = mask.reshape(-1)
        vx, vy, vz, flat_valid = voxel_coords(grid, xyz, flat_valid)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
        local = voxel_segment_ids(grid, vx, vy, vz, flat_valid)
        seg = jnp.where(flat_valid, batch_idx * nvox + local, b * nvox)

        if self.output == "sparse":
            cap = min(self.voxel_capacity * b, nvox * b)
            order, slot, slot_id, n_vox = compactify(seg, b * nvox, cap)
            if not self.is_initializing():
                self.sow("telemetry", "voxel_active", n_vox)
                self.sow("telemetry", "voxel_overflow", jnp.maximum(n_vox - cap, 0))
            feats = points.reshape(-1, d).astype(jnp.float32)[order]
            valid_s = flat_valid[order]
            table = scatter.segment_mean(
                jnp.where(valid_s[:, None], feats, 0.0),
                slot,
                cap + 1,
                indices_are_sorted=True,
            )
            if self.dtype is not None:
                table = table.astype(self.dtype)
            table = table.at[-1].set(0.0)  # dump row: overflow/invalid points
            slot_of_dense, occupied = invert_slot_map(slot_id, b * nvox, cap)
            return SparseBEV(
                table=table,
                valid=occupied,
                slot_of_dense=slot_of_dense,
                slot_id=slot_id,
                batch=b,
                spatial=(grid.size_z, grid.size_y, grid.size_x),
            )

        feats = jnp.where(
            flat_valid[:, None], points.reshape(-1, d).astype(jnp.float32), 0.0
        )
        table = scatter.segment_mean(feats, seg, b * nvox + 1)[: b * nvox]
        if self.dtype is not None:
            table = table.astype(self.dtype)
        return table.reshape(b, grid.size_z, grid.size_y, grid.size_x, d)
