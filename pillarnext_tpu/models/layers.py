"""Shared flax building blocks.

Dense NHWC conv blocks (the TPU-native equivalent of both the reference's
dense blocks, det3d/models/utils/conv.py, and its sparse spconv blocks,
det3d/models/utils/sparse_conv.py — on TPU the BEV grid is kept dense so both
families collapse into one) and a masked, cross-replica BatchNorm for padded
point buffers.

BatchNorm parity: the reference PFN/backbone uses eps=1e-3, momentum=0.01
(pillar_encoder.py:33, sparse_conv.py:30) while neck/head blocks use torch
defaults (conv.py:27, centerhead.py:40).  ``axis_name='data'`` reproduces
SyncBatchNorm (tools/train.py:55-56) inside the compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm momentum m updates running stats as (1-m)*ra + m*batch;
# flax momentum is the decay of the running stats, i.e. flax = 1 - torch.
BN_EPS_SPARSE = 1e-3       # PFN + backbone blocks (pillar_encoder.py:33)
BN_MOMENTUM_SPARSE = 0.99  # torch momentum 0.01
BN_EPS_DENSE = 1e-5        # neck/head blocks use torch defaults (conv.py:27)
BN_MOMENTUM_DENSE = 0.9    # torch momentum 0.1


class _PackedDownConv(nn.Module):
    """Stride-2 3x3 conv evaluated as a dense 2x2 conv over a 2x2-packed
    input (B, H/2, W/2, 4*Cin) with q = (dy*2 + dx)*Cin + c
    (ops/sparse_bev.py:to_dense_packed).

    Tap (a, b) of the 3x3/stride-2 conv reads input row 2y + a - 1, which
    lives in packed row (y-1, dy=1) for a == 0 and (y, dy=a-1) otherwise —
    so the 9 taps fit a 2x2 kernel over 4*Cin channels, padding (1, 0).
    The parameter is the SAME (3, 3, Cin, F) kernel as nn.Conv (checkpoints
    interchange); the rearrangement happens at apply time.  Same sums as the
    strided conv up to f32-accumulation order (bit-equal on the CPU
    equivalence tests).  Motivation and in-situ REFUTATION on v5e flagship
    are recorded at SparseResNet.packed_downsample (ships opt-in, off by
    default)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        k2 = jnp.zeros((2, 2, 4, cin, self.features), kernel.dtype)
        for a in range(3):
            ka, dy = (0, 1) if a == 0 else (1, a - 1)
            for b in range(3):
                kb, dx = (0, 1) if b == 0 else (1, b - 1)
                k2 = k2.at[ka, kb, dy * 2 + dx].set(kernel[a, b])
        k2 = k2.reshape(2, 2, 4 * cin, self.features)
        if self.dtype is not None:
            x, k2 = x.astype(self.dtype), k2.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x, k2, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ConvBlock(nn.Module):
    """Conv2D (no bias) + BN + ReLU over NHWC, 'same' padding.

    ``mask`` (B, H_out, W_out, 1) restricts the block to an active set: BN
    statistics are computed over active cells only and the output is
    re-zeroed outside them — the dense-compute twin of a SubM/Sparse conv
    block (reference sparse_conv.py:16-39; see models/resnet.py).

    ``packed_input=True``: the input is 2x2-packed (B, H/2, W/2, 4*Cin) and
    the conv runs as _PackedDownConv (requires kernel 3, stride 2); the
    parameter tree is unchanged."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    bn_eps: float = BN_EPS_DENSE
    bn_momentum: float = BN_MOMENTUM_DENSE
    packed_input: bool = False
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        # explicit symmetric padding (== torch/spconv padding=k//2): XLA
        # "SAME" pads (0, 1) for stride 2 on even inputs, shifting the grid
        # one pixel vs the reference — fatal for imported weights
        pad = (self.kernel_size // 2) * self.dilation
        if self.packed_input:
            assert self.kernel_size == 3 and self.stride == 2 and self.dilation == 1
            x = _PackedDownConv(self.features, dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                kernel_dilation=(self.dilation, self.dilation),
                padding=((pad, pad), (pad, pad)),
                use_bias=False,
                dtype=self.dtype,
            )(x)
        if mask is not None:
            x = MaskedBatchNorm(
                eps=self.bn_eps,
                momentum=self.bn_momentum,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name="BatchNorm_0",
            )(x, mask[..., 0], train)
            return nn.relu(x) * mask.astype(x.dtype)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    """Sparse-style residual block (reference sparse_conv.py:42-63):
    conv+BN+ReLU -> conv+BN -> +identity -> ReLU (no activation before the
    add in the second branch) — used by the backbones and MVF view towers."""

    features: int
    kernel_size: int = 3
    bn_eps: float = BN_EPS_SPARSE
    bn_momentum: float = BN_MOMENTUM_SPARSE
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        identity = x
        x = ConvBlock(
            self.features,
            self.kernel_size,
            bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x, train, mask)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        if mask is not None:
            x = MaskedBatchNorm(
                eps=self.bn_eps,
                momentum=self.bn_momentum,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name="BatchNorm_0",
            )(x, mask[..., 0], train)
            return nn.relu(x + identity) * mask.astype(x.dtype)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(x)
        return nn.relu(x + identity)


class BasicBlock(nn.Module):
    """Two full ConvBlocks (ReLU in both) with a residual skip — the DENSE
    block used by the ASPP neck (reference conv.py:38-51)."""

    features: int
    kernel_size: int = 3
    bn_eps: float = BN_EPS_DENSE
    bn_momentum: float = BN_MOMENTUM_DENSE
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        for _ in range(2):
            x = ConvBlock(
                self.features,
                self.kernel_size,
                bn_eps=self.bn_eps,
                bn_momentum=self.bn_momentum,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )(x, train)
        return nn.relu(x + identity)


class ConvTransposeBlock(nn.Module):
    """ConvTranspose2D (stride = kernel) + BN + ReLU — the head's ``deblock``
    upsample (reference centerhead.py:25-30)."""

    features: int
    stride: int
    bn_eps: float = BN_EPS_DENSE
    bn_momentum: float = BN_MOMENTUM_DENSE
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features,
            (self.stride, self.stride),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over a padded point buffer (..., C) with validity mask.

    Statistics are computed over valid rows only (padded rows would otherwise
    bias the batch mean toward zero), synchronized over ``axis_name`` — the
    analogue of BatchNorm1d-on-points + SyncBatchNorm in the reference PFN
    (pillar_encoder.py:33-40).
    """

    eps: float = BN_EPS_SPARSE
    momentum: float = BN_MOMENTUM_SPARSE
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            m = mask.astype(jnp.float32)[..., None]
            xf = x.astype(jnp.float32)
            cnt = m.sum()
            total = (xf * m).reshape(-1, c).sum(axis=0)
            total_sq = (jnp.square(xf) * m).reshape(-1, c).sum(axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                total = jax.lax.psum(total, self.axis_name)
                total_sq = jax.lax.psum(total_sq, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = total / cnt
            var = jnp.maximum(total_sq / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                mom = self.momentum
                ra_mean.value = mom * ra_mean.value + (1 - mom) * mean
                ra_var.value = mom * ra_var.value + (1 - mom) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        # fold into per-channel scale/shift and apply in x.dtype: the naive
        # (x - mean) * rsqrt * scale + bias upcasts the whole activation to
        # f32 (mean/var are f32), doubling HBM traffic of every masked block
        # at BEV scale (measured 2x backbone time on-chip at 1344^2)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        shift = bias - mean * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class _ConvParams(nn.Module):
    """Declares nn.Conv's exact param layout (kernel/bias under this module's
    name, same default initializers => same init values for the same scope
    path) WITHOUT applying the convolution — the fused SepHead execution
    reads these tensors and assembles merged convolutions from them."""

    features: int
    kernel_size: int = 3
    bias_init_value: float = 0.0

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (self.kernel_size, self.kernel_size, in_features, self.features),
        )
        bias = self.param(
            "bias", nn.initializers.constant(self.bias_init_value), (self.features,)
        )
        return kernel, bias


class _BNParams(nn.Module):
    """nn.BatchNorm's exact param/batch_stats layout without applying it."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )
        return scale, bias, mean.value, var.value


class MLPHeadParams(nn.Module):
    """MLPHead's exact param tree (num_conv == 2: Conv_0, BatchNorm_0,
    Conv_1) as raw tensors, for merged execution.  Scope paths match
    MLPHead's auto-named submodules, so a SepHead may declare parameters
    through THIS module on one call (fused eval) and through MLPHead on
    another (train) — both resolve to the identical variable tree."""

    out_features: int
    head_conv: int = 64
    final_bias_init: float = 0.0
    kernel_size: int = 3

    @nn.compact
    def __call__(self, in_features: int):
        c0 = _ConvParams(
            self.head_conv, self.kernel_size, name="Conv_0"
        )(in_features)
        bn = _BNParams(self.head_conv, name="BatchNorm_0")()
        c1 = _ConvParams(
            self.out_features,
            self.kernel_size,
            bias_init_value=self.final_bias_init,
            name="Conv_1",
        )(self.head_conv)
        return c0, bn, c1


class MLPHead(nn.Module):
    """(num_conv-1) x [3x3 conv + BN + ReLU] then a final 3x3 conv with bias —
    one output branch of SepHead (reference centerhead.py:32-49)."""

    out_features: int
    num_conv: int
    head_conv: int = 64
    final_bias_init: float = 0.0
    kernel_size: int = 3
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        """``mask`` (broadcastable to x, 1 = real cell): when evaluating on
        gathered patches that extend past the feature-map border, the
        intermediate conv outputs at out-of-map positions must be re-zeroed
        — the dense map's next conv reads ZERO there (SAME padding), not the
        bias+BN+ReLU constant a conv over zeroed inputs produces."""
        for _ in range(self.num_conv - 1):
            x = nn.Conv(
                self.head_conv,
                (self.kernel_size, self.kernel_size),
                padding="SAME",
                use_bias=True,
                dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM_DENSE,
                epsilon=BN_EPS_DENSE,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
            if mask is not None:
                x = x * mask
        x = nn.Conv(
            self.out_features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=True,
            bias_init=nn.initializers.constant(self.final_bias_init),
            dtype=self.dtype,
        )(x)
        return x
