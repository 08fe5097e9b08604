"""Pillar reader: dynamic voxelization + PFN, TPU-native.

Capability parity with the reference PillarFeatureNet
(det3d/models/readers/pillar_encoder.py:15-182), redesigned for XLA:

- The reference derives pillar membership with ``torch.unique`` (dynamic
  shapes).  Here the segment id of a point IS its linearized dense BEV index
  ``b*H*W + y*W + x`` over a fixed-capacity padded point buffer, so the
  per-pillar reductions are plain ``segment_sum/segment_max`` into a static
  ``(B*H*W+1, C)`` table (dump row for invalid points) and the reference's
  ``SparseConvTensor.dense()`` is a free reshape.
- Decorations match pillar_encoder.py:113-123: raw features (incl. xyz),
  cluster offsets from the per-pillar xyz mean, and center offsets from the
  pillar center (x, y only: +5 channels total).
- PFNLayer semantics match pillar_encoder.py:25-50: Linear(no bias) + BN
  (eps 1e-3, momentum 0.01, over valid points, cross-replica) + ReLU, pillar
  max-pool broadcast back and concatenated unless last layer.

Input: points (B, N, D) with D = [x, y, z, feat...], mask (B, N).
Output: BEV pillar features (B, H, W, C).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pillarnext_tpu.models.layers import MaskedBatchNorm
from pillarnext_tpu.ops import scatter
from pillarnext_tpu.ops.voxelize import VoxelGrid, pillar_coords, pillar_segment_ids


class PFNLayer(nn.Module):
    """One Pillar Feature Net layer (pillar_encoder.py:15-50)."""

    out_channels: int  # full width; halved internally unless last layer
    last_layer: bool = False
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feats, mask, seg_ids, num_segments, train: bool = False):
        units = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(units, use_bias=False, dtype=self.dtype)(feats)
        x = MaskedBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(x, mask, train)
        x = nn.relu(x)
        x = jnp.where(mask[..., None], x, 0.0)

        flat = x.reshape(-1, units)
        pillar_max = scatter.segment_max(flat, seg_ids.reshape(-1), num_segments)
        if self.last_layer:
            return pillar_max  # (num_segments, units)
        x_max = pillar_max[seg_ids.reshape(-1)].reshape(x.shape)
        return jnp.concatenate([x, x_max], axis=-1)


class PillarFeatureNet(nn.Module):
    """Points -> decorated features -> PFN stack -> dense BEV pillar image."""

    num_input_features: int
    num_filters: Sequence[int]
    voxel_size: Sequence[float]
    pc_range: Sequence[float]
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    def setup(self):
        self.grid = VoxelGrid.create(self.voxel_size, self.pc_range)
        layers = []
        for i, width in enumerate(self.num_filters):
            layers.append(
                PFNLayer(
                    width,
                    last_layer=(i == len(self.num_filters) - 1),
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                )
            )
        self.pfn_layers = layers

    def __call__(self, points, mask, train: bool = False):
        grid = self.grid
        b, n, d = points.shape
        assert d == self.num_input_features, (d, self.num_input_features)
        hw = grid.num_pillars
        num_segments = b * hw + 1

        xyz = points[..., :3].reshape(-1, 3)
        flat_valid = mask.reshape(-1)
        px, py, flat_valid = pillar_coords(grid, xyz, flat_valid)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
        local_sid = pillar_segment_ids(grid, px, py, flat_valid)
        seg_ids = jnp.where(flat_valid, batch_idx * hw + local_sid, b * hw)

        # cluster offsets: xyz - per-pillar mean xyz (pillar_encoder.py:113-116)
        xyz_f32 = xyz.astype(jnp.float32)
        mean_xyz = scatter.segment_mean(
            jnp.where(flat_valid[:, None], xyz_f32, 0.0), seg_ids, num_segments
        )
        f_cluster = xyz_f32 - mean_xyz[seg_ids]

        # center offsets from the pillar center (pillar_encoder.py:119-120)
        vs = jnp.asarray(grid.voxel_size[:2], jnp.float32)
        origin = jnp.asarray(grid.pc_range[:2], jnp.float32)
        center = jnp.stack([px, py], axis=-1).astype(jnp.float32) * vs + vs / 2 + origin
        f_center = xyz_f32[:, :2] - center

        feats = jnp.concatenate(
            [points.reshape(-1, d).astype(jnp.float32), f_cluster, f_center], axis=-1
        )
        feats = jnp.where(flat_valid[:, None], feats, 0.0)
        if self.dtype is not None:
            feats = feats.astype(self.dtype)

        feats = feats.reshape(b, n, d + 5)
        mask2d = flat_valid.reshape(b, n)
        for pfn in self.pfn_layers:
            feats = pfn(feats, mask2d, seg_ids.reshape(b, n), num_segments, train)

        # last PFN layer returned the pillar table directly
        table = feats[: b * hw]  # drop dump row
        return table.reshape(b, grid.size_y, grid.size_x, table.shape[-1])

    @property
    def bev_shape(self):
        grid = VoxelGrid.create(self.voxel_size, self.pc_range)
        return grid.bev_shape
