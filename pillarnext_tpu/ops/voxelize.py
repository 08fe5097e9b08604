"""Static-shape dynamic voxelization.

The reference computes pillar/voxel membership with ``torch.unique`` over
per-point integer coords (det3d/models/readers/pillar_encoder.py:98-111,
voxel_encoder.py:36-72) — inherently dynamic shapes.  The TPU-native design
removes ``unique`` entirely: the segment id of a point *is* its linearized
dense grid index, so scatters go straight into a fixed-size pillar table and
the reference's ``SparseConvTensor.dense()`` step becomes a reshape.

Input points are padded to a fixed capacity with a validity mask; out-of-range
and padded points are routed to a dump segment.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class VoxelGrid(NamedTuple):
    """Static grid geometry, precomputed on the host from config."""

    voxel_size: tuple[float, float, float]
    pc_range: tuple[float, float, float, float, float, float]
    size_x: int  # W
    size_y: int  # H
    size_z: int  # D (1 for pillars)

    @classmethod
    def create(cls, voxel_size, pc_range) -> "VoxelGrid":
        vs = np.asarray(voxel_size, np.float64)
        pr = np.asarray(pc_range, np.float64)
        # round-to-nearest like the reference (pillar_encoder.py:88-90)
        gs = np.round((pr[3:] - pr[:3]) / vs).astype(np.int64)
        return cls(tuple(voxel_size), tuple(pc_range), int(gs[0]), int(gs[1]), int(gs[2]))

    @property
    def bev_shape(self) -> tuple[int, int]:
        """(H, W) — rows are y, cols are x (reference returns grid (H, W))."""
        return (self.size_y, self.size_x)

    @property
    def num_pillars(self) -> int:
        return self.size_y * self.size_x

    @property
    def num_voxels(self) -> int:
        return self.size_z * self.size_y * self.size_x


def pillar_coords(
    grid: VoxelGrid, xyz: jnp.ndarray, valid: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Integer pillar coords and validity for (N, 3) points.

    Returns (px, py) int32 coords (clamped into range) and the combined
    validity mask (input mask AND in-range in x/y, matching the reference's
    range filter pillar_encoder.py:98-104 which ignores z).
    """
    vs = jnp.asarray(grid.voxel_size, xyz.dtype)
    origin = jnp.asarray(grid.pc_range[:3], xyz.dtype)
    f = (xyz - origin) / vs
    px = jnp.floor(f[:, 0]).astype(jnp.int32)
    py = jnp.floor(f[:, 1]).astype(jnp.int32)
    in_range = (px >= 0) & (px < grid.size_x) & (py >= 0) & (py < grid.size_y)
    valid = valid & in_range
    return jnp.clip(px, 0, grid.size_x - 1), jnp.clip(py, 0, grid.size_y - 1), valid


def pillar_segment_ids(
    grid: VoxelGrid, px: jnp.ndarray, py: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Per-point segment id ``y * W + x``; invalid points -> dump segment
    ``H * W`` (callers allocate ``H * W + 1`` segments)."""
    sid = py * grid.size_x + px
    return jnp.where(valid, sid, grid.num_pillars)


def voxel_coords(
    grid: VoxelGrid, xyz: jnp.ndarray, valid: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """3-D voxel coords (x, y, z ints) + validity including the z range test
    (reference voxel_encoder.py:50-62 filters z as well)."""
    vs = jnp.asarray(grid.voxel_size, xyz.dtype)
    origin = jnp.asarray(grid.pc_range[:3], xyz.dtype)
    f = (xyz - origin) / vs
    vx = jnp.floor(f[:, 0]).astype(jnp.int32)
    vy = jnp.floor(f[:, 1]).astype(jnp.int32)
    vz = jnp.floor(f[:, 2]).astype(jnp.int32)
    in_range = (
        (vx >= 0) & (vx < grid.size_x)
        & (vy >= 0) & (vy < grid.size_y)
        & (vz >= 0) & (vz < grid.size_z)
    )
    valid = valid & in_range
    return (
        jnp.clip(vx, 0, grid.size_x - 1),
        jnp.clip(vy, 0, grid.size_y - 1),
        jnp.clip(vz, 0, grid.size_z - 1),
        valid,
    )


def voxel_segment_ids(
    grid: VoxelGrid,
    vx: jnp.ndarray,
    vy: jnp.ndarray,
    vz: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Per-point 3-D segment id ``(z * H + y) * W + x``; invalid -> dump."""
    sid = (vz * grid.size_y + vy) * grid.size_x + vx
    return jnp.where(valid, sid, grid.num_voxels)
