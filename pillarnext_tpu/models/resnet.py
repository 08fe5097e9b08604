"""Dense BEV ResNet backbones.

Capability parity with the reference sparse backbones
(det3d/models/backbones/sparse_resnet.py:10-68, sparse_resnet3d.py:9-72),
redesigned dense-first for the TPU MXU: the pillar/voxel grid arrives as a
dense NHWC image (the reader scatters straight into it), so every stage is a
plain strided conv + residual blocks that XLA tiles onto the systolic array.
SubManifold-vs-dense numerics: a dense conv propagates activations into
formerly-empty cells where SubMConv does not; parity targets are metric-level
(BASELINE.md), with PillarNet-style dense BEV backbones as the established
equivalent.

BatchNorm uses the sparse-block constants (eps 1e-3, momentum 0.01 —
sparse_conv.py:30).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pillarnext_tpu.models.layers import (
    BN_EPS_SPARSE,
    BN_MOMENTUM_SPARSE,
    ConvBlock,
    ResidualBlock,
)


class _Stage(nn.Module):
    """One backbone stage: strided ConvBlock + residual blocks."""

    features: int
    stride: int
    kernel_size: int
    num_blocks: int
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(
            self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            bn_eps=BN_EPS_SPARSE,
            bn_momentum=BN_MOMENTUM_SPARSE,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x, train)
        for _ in range(self.num_blocks):
            x = ResidualBlock(
                self.features,
                kernel_size=self.kernel_size,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )(x, train)
        return x


class SparseResNet(nn.Module):
    """4-stage BEV ResNet (dense).  Mirrors SparseResNet's layout: per stage a
    strided ConvBlock then ``layer_nums[i]`` residual BasicBlocks, followed by
    a 1x1 mapping conv to ``out_channels`` (sparse_resnet.py:43-59).

    During training each stage is rematerialized (jax.checkpoint): the
    full-resolution BEV stages would otherwise keep ~GBs of activations for
    the backward pass (the reference leans on spconv sparsity +
    torch.utils.checkpoint on the neck instead)."""

    layer_nums: Sequence[int]
    ds_layer_strides: Sequence[int]
    ds_num_filters: Sequence[int]
    num_input_features: int
    kernel_size: Sequence[int] = (3, 3, 3, 3)
    out_channels: int = 256
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_cls = nn.remat(_Stage, static_argnums=(2,)) if train else _Stage
        for i, num_blocks in enumerate(self.layer_nums):
            x = stage_cls(
                self.ds_num_filters[i],
                self.ds_layer_strides[i],
                self.kernel_size[i],
                num_blocks,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"stage_{i}",
            )(x, train)
        x = ConvBlock(
            self.out_channels,
            kernel_size=1,
            bn_eps=BN_EPS_SPARSE,
            bn_momentum=BN_MOMENTUM_SPARSE,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x, train)
        return x


class SparseResNet3D(nn.Module):
    """3-D voxel ResNet (dense NDHWC), mirroring SparseResNet3D: 4 conv3d
    stages, an extra z-downsample conv (3,1,1)/(2,1,1), a 1x1x1 mapping, then
    the depth axis folds into channels for the BEV output
    (sparse_resnet3d.py:43-72).

    Input: (B, D, H, W, C) voxel features.  Output: (B, H', W', C'*D').
    """

    layer_nums: Sequence[int]
    ds_layer_strides: Sequence[int]
    ds_num_filters: Sequence[int]
    num_input_features: int
    kernel_size: Sequence[int] = (3, 3, 3, 3)
    out_channels: int = 128
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    def _bn_relu(self, x, train):
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM_SPARSE,
            epsilon=BN_EPS_SPARSE,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, num_blocks in enumerate(self.layer_nums):
            k, s = self.kernel_size[i], self.ds_layer_strides[i]
            p = k // 2
            x = nn.Conv(
                self.ds_num_filters[i],
                (k, k, k),
                strides=(s, s, s),
                padding=((p, p),) * 3,  # torch/spconv alignment (see layers.py)
                use_bias=False,
                dtype=self.dtype,
            )(x)
            x = self._bn_relu(x, train)
            for _ in range(num_blocks):
                identity = x
                x = nn.Conv(
                    self.ds_num_filters[i], (k, k, k), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                )(x)
                x = self._bn_relu(x, train)
                x = nn.Conv(
                    self.ds_num_filters[i], (k, k, k), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=BN_MOMENTUM_SPARSE,
                    epsilon=BN_EPS_SPARSE,
                    axis_name=self.axis_name if train else None,
                    dtype=self.dtype,
                )(x)
                x = nn.relu(x + identity)
        # extra z-downsample: kernel (3,1,1) stride (2,1,1) over (D, H, W)
        x = nn.Conv(
            self.ds_num_filters[-1],
            (3, 1, 1),
            strides=(2, 1, 1),
            padding=((1, 1), (0, 0), (0, 0)),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = self._bn_relu(x, train)
        x = nn.Conv(
            self.out_channels, (1, 1, 1), padding="SAME", use_bias=False, dtype=self.dtype
        )(x)
        x = self._bn_relu(x, train)
        # fold depth into channels: (B, D, H, W, C) -> (B, H, W, D*C)
        b, d, h, w, c = x.shape
        return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
