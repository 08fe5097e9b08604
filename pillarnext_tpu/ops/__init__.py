"""Compute ops: voxelization, segment reductions, Pallas kernels."""

from pillarnext_tpu.ops import scatter, voxelize

__all__ = ["scatter", "voxelize"]
