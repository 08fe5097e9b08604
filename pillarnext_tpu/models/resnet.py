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

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from pillarnext_tpu.models.layers import (
    BN_EPS_SPARSE,
    BN_MOMENTUM_SPARSE,
    ConvBlock,
    MaskedBatchNorm,
    ResidualBlock,
)
import numpy as np

from pillarnext_tpu.ops.sparse_bev import SparseBEV
from pillarnext_tpu.ops.sparse_down import (
    build_down_neighbor_tables,
    downsample_active_set,
    out_spatial_for,
    sparse_strided_conv,
)
from pillarnext_tpu.ops.subm_conv import (
    build_neighbor_table,
    subm_conv,
    subm_offsets_2d,
    subm_offsets_3d,
)
from pillarnext_tpu.ops.tile_subm import (
    build_tile_map,
    pack_stack,
    stack_to_dense,
    tile_conv,
    unpack_stack,
)


class _SubMConv(nn.Module):
    """SubM conv parameter holder; kernel stored HWIO (/DHWIO) exactly like
    nn.Conv so dense/sparse checkpoints are interchangeable."""

    features: int
    kernel_size: int = 3
    ndim: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, nbr):
        k, cin = self.kernel_size, x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*(k,) * self.ndim, cin, self.features),
        )
        table = jnp.concatenate([x, jnp.zeros((1, cin), x.dtype)], axis=0)
        kern = kernel.reshape(k**self.ndim, cin, self.features)
        if self.dtype is not None:
            kern = kern.astype(self.dtype)
        # named for the optional save-conv-out remat policy: saving this
        # (cap, Cout) output lets the block's backward replay skip the
        # conv's gather+matmul entirely (the custom VJP needs only the
        # block INPUT, which is a remat residual already)
        return checkpoint_name(subm_conv(table, nbr, kern), "sparse_conv_out")


class _SparseDownConv(nn.Module):
    """Strided sparse conv parameter holder (spconv SparseConv2d/3d); kernel
    stored like nn.Conv (``(*kernel_shape, Cin, Cout)``)."""

    features: int
    kernel_shape: tuple
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, nbr_fwd, nbr_rev):
        cin = x.shape[-1]
        k = int(np.prod(self.kernel_shape))
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_shape, cin, self.features),
        )
        table = jnp.concatenate([x, jnp.zeros((1, cin), x.dtype)], axis=0)
        kern = kernel.reshape(k, cin, self.features)
        if self.dtype is not None:
            kern = kern.astype(self.dtype)
        return checkpoint_name(
            sparse_strided_conv(table, nbr_fwd, nbr_rev, kern), "sparse_conv_out"
        )


class SparseConvBlock(nn.Module):
    """SubM conv + masked BN + ReLU over the compact active-site table —
    stride-1 twin of ConvBlock (reference sparse_conv.py:16-39).  Invalid
    rows are re-zeroed after BN so the dump-row invariant holds for the next
    conv's inactive taps."""

    features: int
    kernel_size: int = 3
    ndim: int = 2
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, valid, nbr, train: bool = False):
        x = _SubMConv(
            self.features, self.kernel_size, self.ndim, self.dtype, name="Conv_0"
        )(x, nbr)
        x = MaskedBatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="BatchNorm_0")(
            x, valid, train
        )
        return jnp.where(valid[:, None], nn.relu(x), 0.0)


class SparseResidualBlock(nn.Module):
    """SubM residual block (reference sparse_conv.py:42-63): conv+BN+ReLU ->
    conv+BN -> +identity -> ReLU, all over the fixed active set."""

    features: int
    kernel_size: int = 3
    ndim: int = 2
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, valid, nbr, train: bool = False):
        identity = x
        x = SparseConvBlock(
            self.features, self.kernel_size, self.ndim, self.axis_name, self.dtype,
            name="ConvBlock_0",
        )(x, valid, nbr, train)
        x = _SubMConv(
            self.features, self.kernel_size, self.ndim, self.dtype, name="Conv_0"
        )(x, nbr)
        x = MaskedBatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="BatchNorm_0")(
            x, valid, train
        )
        return jnp.where(valid[:, None], nn.relu(x + identity), 0.0)


class _SparseStridedConvBlock(nn.Module):
    """Strided sparse conv + masked BN + ReLU over compact tables — the
    sparse twin of a strided ConvBlock (reference SparseConv2d block,
    sparse_conv.py:16-39), with ConvBlock-compatible parameter names so
    dense and sparse checkpoints interchange."""

    features: int
    kernel_size: int = 3
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, out_valid, nbr_fwd, nbr_rev, train: bool = False):
        k = self.kernel_size
        x = _SparseDownConv(
            self.features, (k, k), self.dtype, name="Conv_0"
        )(x, nbr_fwd, nbr_rev)
        x = MaskedBatchNorm(
            axis_name=self.axis_name, dtype=self.dtype, name="BatchNorm_0"
        )(x, out_valid, train)
        return jnp.where(out_valid[:, None], nn.relu(x), 0.0)


def _sparse_remat_policy(save_conv_out: bool):
    """Remat policy for sparse blocks: optionally SAVE the tagged sparse-conv
    outputs so the backward replay skips every forward gather+matmul (the
    conv VJPs need only block inputs/params).  Costs one (cap, Cout) buffer
    per conv; with the shared-gather VJPs this leaves exactly ONE gather
    sweep per conv in the whole fwd+bwd (measured tools/perf_probe.py train:
    B=2 560 -> 470 ms, B=4 1200 -> 983 ms at the 73728 train capacity)."""
    if save_conv_out:
        return jax.checkpoint_policies.save_only_these_names("sparse_conv_out")
    return None


class _SparseStridedStage(nn.Module):
    """One strided backbone stage fully over compact tables: set-dilating
    downsample conv then SubM residual blocks at the new resolution.  Param
    tree (down + block_j) matches the dense _Stage."""

    features: int
    kernel_size: int
    num_blocks: int
    axis_name: str | None = None
    dtype: jnp.dtype | None = None
    save_conv_out: bool = False

    @nn.compact
    def __call__(self, x, out_valid, nbr_fwd, nbr_rev, nbr_sub, train: bool = False):
        pol = _sparse_remat_policy(self.save_conv_out)
        down_cls = (
            nn.remat(_SparseStridedConvBlock, static_argnums=(5,), policy=pol)
            if train
            else _SparseStridedConvBlock
        )
        res_cls = (
            nn.remat(SparseResidualBlock, static_argnums=(4,), policy=pol)
            if train
            else SparseResidualBlock
        )
        x = down_cls(
            self.features, self.kernel_size,
            axis_name=self.axis_name, dtype=self.dtype, name="down",
        )(x, out_valid, nbr_fwd, nbr_rev, train)
        for j in range(self.num_blocks):
            x = res_cls(
                self.features, self.kernel_size,
                axis_name=self.axis_name, dtype=self.dtype, name=f"block_{j}",
            )(x, out_valid, nbr_sub, train)
        return x


class _HybridStridedStage(nn.Module):
    """Strided stage for the 'leading+down' eval mode: the set-dilating
    downsample conv runs SPARSE over compact tables (the full-resolution
    image is never materialized), the result is densified at the
    POST-stride grid (4x fewer cells than densifying before the stride),
    and the stage's residual blocks run as masked-dense convs (SubM-exact
    on the dilated set).  Param tree (down + block_j) matches _Stage /
    _SparseStridedStage, so checkpoints interchange."""

    features: int
    kernel_size: int
    num_blocks: int
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self, table, out_valid, nbr_fwd, nbr_rev, out_sod, out_slot_id,
        batch, out_sp, mask, train: bool = False,
    ):
        x = _SparseStridedConvBlock(
            self.features, self.kernel_size,
            axis_name=self.axis_name, dtype=self.dtype, name="down",
        )(table, out_valid, nbr_fwd, nbr_rev, train)
        dense = SparseBEV(
            table=jnp.concatenate(
                [x, jnp.zeros((1, x.shape[-1]), x.dtype)], axis=0
            ),
            valid=out_valid,
            slot_of_dense=out_sod,
            slot_id=out_slot_id,
            batch=batch,
            spatial=tuple(out_sp),
        ).to_dense()
        for j in range(self.num_blocks):
            dense = ResidualBlock(
                self.features, kernel_size=self.kernel_size,
                axis_name=self.axis_name, dtype=self.dtype, name=f"block_{j}",
            )(dense, train, mask)
        return dense


class _SparseStage(nn.Module):
    """One leading stride-1 backbone stage over the compact table, with the
    same param tree (down + block_j) as the dense _Stage."""

    features: int
    kernel_size: int
    num_blocks: int
    axis_name: str | None = None
    dtype: jnp.dtype | None = None
    save_conv_out: bool = False

    @nn.compact
    def __call__(self, x, valid, nbr, train: bool = False):
        # remat per block in training: the compact tables are tiny (MBs) but
        # each conv's backward gathers a (cap, K*C) neighborhood buffer
        # — remat serializes those temps instead of keeping them all live
        pol = _sparse_remat_policy(self.save_conv_out)
        conv_cls = nn.remat(SparseConvBlock, static_argnums=(4,), policy=pol) if train else SparseConvBlock
        res_cls = nn.remat(SparseResidualBlock, static_argnums=(4,), policy=pol) if train else SparseResidualBlock
        x = conv_cls(
            self.features, self.kernel_size,
            axis_name=self.axis_name, dtype=self.dtype, name="down",
        )(x, valid, nbr, train)
        for j in range(self.num_blocks):
            x = res_cls(
                self.features, self.kernel_size,
                axis_name=self.axis_name, dtype=self.dtype, name=f"block_{j}",
            )(x, valid, nbr, train)
        return x


class _TileConv(nn.Module):
    """Tile-stack SubM conv parameter holder; kernel stored HWIO exactly like
    nn.Conv so dense/sparse/tile checkpoints are interchangeable
    (ops/tile_subm.py)."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, stack, nbr):
        cin = stack.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, cin, self.features),
        )
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
        return tile_conv(stack, nbr, kernel)


class TileConvBlock(nn.Module):
    """Tile-stack twin of SparseConvBlock: SubM conv over active tiles +
    masked BN + ReLU, inactive cells re-zeroed (spconv active-set
    semantics; reference sparse_conv.py:16-39)."""

    features: int
    kernel_size: int = 3
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, stack, out_mask, nbr, train: bool = False):
        x = _TileConv(self.features, self.kernel_size, self.dtype, name="Conv_0")(
            stack, nbr
        )
        x = MaskedBatchNorm(
            axis_name=self.axis_name, dtype=self.dtype, name="BatchNorm_0"
        )(x, out_mask, train)
        return jnp.where(out_mask[..., None], nn.relu(x), 0.0)


class TileResidualBlock(nn.Module):
    """Tile-stack twin of SparseResidualBlock (reference sparse_conv.py:42-63)."""

    features: int
    kernel_size: int = 3
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, stack, out_mask, nbr, train: bool = False):
        identity = stack
        x = TileConvBlock(
            self.features, self.kernel_size, self.axis_name, self.dtype,
            name="ConvBlock_0",
        )(stack, out_mask, nbr, train)
        x = _TileConv(self.features, self.kernel_size, self.dtype, name="Conv_0")(
            x, nbr
        )
        x = MaskedBatchNorm(
            axis_name=self.axis_name, dtype=self.dtype, name="BatchNorm_0"
        )(x, out_mask, train)
        return jnp.where(out_mask[..., None], nn.relu(x + identity), 0.0)


class _TileStage(nn.Module):
    """One stride-1 backbone stage over the active-tile stack, with the same
    param tree (down + block_j) as the dense _Stage / sparse _SparseStage."""

    features: int
    kernel_size: int
    num_blocks: int
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, stack, out_mask, nbr, train: bool = False):
        conv_cls = nn.remat(TileConvBlock, static_argnums=(4,)) if train else TileConvBlock
        res_cls = nn.remat(TileResidualBlock, static_argnums=(4,)) if train else TileResidualBlock
        stack = conv_cls(
            self.features, self.kernel_size,
            axis_name=self.axis_name, dtype=self.dtype, name="down",
        )(stack, out_mask, nbr, train)
        for j in range(self.num_blocks):
            stack = res_cls(
                self.features, self.kernel_size,
                axis_name=self.axis_name, dtype=self.dtype, name=f"block_{j}",
            )(stack, out_mask, nbr, train)
        return stack


class _Stage(nn.Module):
    """One backbone stage: strided ConvBlock + residual blocks.

    ``mask`` is the stage's OUTPUT active set (B, H_out, W_out, 1): the
    strided conv dilates the active set like spconv's SparseConv; the
    residual blocks are SubM (set-preserving) — see SparseResNet.

    In training every *block* is rematerialized individually (not the stage
    as a whole): the backward then keeps one block's conv/BN internals live
    at a time instead of the whole stage's — at the 1344x1344 stage-0
    resolution that is the difference between ~0.5 GB and ~5 GB of f32
    backward temps per sample."""

    features: int
    stride: int
    kernel_size: int
    num_blocks: int
    packed_input: bool = False  # input is 2x2-packed (see _PackedDownConv)
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        conv_cls = nn.remat(ConvBlock, static_argnums=(2,)) if train else ConvBlock
        res_cls = nn.remat(ResidualBlock, static_argnums=(2,)) if train else ResidualBlock
        x = conv_cls(
            self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            bn_eps=BN_EPS_SPARSE,
            bn_momentum=BN_MOMENTUM_SPARSE,
            packed_input=self.packed_input,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="down",
        )(x, train, mask)
        for j in range(self.num_blocks):
            x = res_cls(
                self.features,
                kernel_size=self.kernel_size,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"block_{j}",
            )(x, train, mask)
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
    force_dense_train: bool = False  # debug/testing: masked-dense in train too
    # eval: run the leading stride-1 (SubM) stages on the sparse gather+MXU
    # path like training, densifying after — at 1344^2 the gather conv over
    # ~4% active sites beats the masked-dense conv (whose (B,H,W,1)-broadcast
    # mask multiply relayouts the activation around every conv)
    sparse_eval: bool = False
    # eval-only: skip active-set re-masking of the dense TAIL stages
    # (stride-2 and below).  The SubM stage-0 stays exact either way; the
    # tail then bleeds BN constants into empty cells like any dense conv
    # (round-1 semantics from 672^2 down).  ~7 ms/frame cheaper; keep True
    # for bit-exact spconv parity (e.g. scoring imported weights).
    masked_eval: bool = True
    # rematerialize dense stages in training (memory for FLOPs); with the
    # sparse stage-0 the dense tail starts at 672^2 and may fit un-remat'ed
    remat_train: bool = True
    # sparse-stage remat policy: save each tagged sparse-conv output
    # ((cap, Cout) — MBs per conv) so the backward replay skips every
    # forward gather+matmul; with the shared-gather conv VJPs this leaves
    # ONE gather sweep per conv fwd+bwd.  Measured (tools/perf_probe.py
    # train, 73728 caps): B=2 560 -> 470 ms, B=4 1200 -> 983 ms; HBM high
    # -water stays under the B x capacity cliff at B<=4
    remat_save_conv_out: bool = True
    # 'leading': only the stride-1 prefix runs sparse (tail is [masked]
    # dense).  'all': the WHOLE backbone runs over compact tables — strided
    # stages use the set-dilating sparse conv, the image is densified only
    # at the final (H/8) grid; no mask multiplies anywhere, remat'ed tables
    # are MBs, and the train step measures ~23% faster (599 vs 774 ms at
    # B=2 on v5e; the round-3 sort-free dilation widens this).  TRAIN
    # defaults to 'all': a strided stage whose DILATED active set exceeds
    # its stage capacity now FAILS LOUDLY (overflow telemetry sown below;
    # the Trainer raises) instead of silently truncating the scene — size
    # stage_capacity_frac for your data's dilation growth (beam-clustered
    # LiDAR dilates ~1.3x before the 4:1 merge; diffuse clutter up to
    # 2.25x).  EVAL defaults to 'leading': at eval the masked-dense tail's
    # large-grid convs are MXU-bound and beat capacity-sized gather convs
    # (measured 55 vs 96 ms features at B=1 flagship).  Re-A/B'd in r5
    # AFTER the tap-decomposed gathers + table-build cuts: 'leading+down'
    # still loses (features 62 vs 58-59 ms, tools/perf_probe.py feat,
    # PNX_SPARSE_LD=1) — the sparse strided stage's table builds cost more
    # than the full-grid densify + first dense conv they avoid.
    sparse_stages_train: str = "all"
    sparse_stages_eval: str = "leading"
    # eval-only OPT-IN: densify the sparse prefix's output 2x2-packed and run
    # the first strided down conv as a dense 2x2 conv (_PackedDownConv).
    # Motivated by the isolated measurements (the full-res strided conv runs
    # 11.9% MFU on v5e, and interleaved-gather + 2x2 conv beat isolated
    # densify + strided conv 8.5 vs 11.0 ms — tools/stage1_probe.py,
    # tools/packed_probe.py) but REFUTED in situ: flagship features measure
    # 62 ms packed vs 58-59 baseline (tools/perf_probe.py feat) — XLA fuses
    # the production densify+conv chain better than the isolated A/B
    # suggests.  Kept off; same param tree either way (equivalence-tested in
    # tests; may win on other chips / channel widths)
    packed_downsample: bool = False
    # 'tile' stages_mode / tile_stride1: run stride-1 (SubM) stages over the
    # active-TILE stack instead of per-site gather convs (ops/tile_subm.py):
    # the halo gather costs ~9 x n_tiles descriptors per conv instead of
    # ~6 x n_sites, and the stage's dense image is never materialized.
    # 'tile' as stages_mode = tile prefix + [masked-]dense tail;
    # tile_stride1=True = 'all' mode with its stride-1 stages tiled.
    tile_size: int = 8
    tile_capacity: int = 12288  # active-tile slots per sample at full res
    tile_stride1: bool = False
    # per-stage compact capacities for sparse_stages='all' as fractions of
    # the input capacity, clamped to the stage's grid size.  Must cover the
    # DILATED active set (see sparse_stages caveat); defaults assume beam-
    # clustered LiDAR where counts shrink ~2x per stride-2 stage
    stage_capacity_frac: Sequence[float] = (1.0, 1.0, 0.5, 0.25)
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Input: dense (B, H, W, C) image or a SparseBEV.

        With a SparseBEV the backbone is active-set-exact (spconv
        semantics): stride-1 stages are SubM (set-preserving), strided
        stages dilate the set like SparseConv, and every BN/output is
        restricted to the set.  Two compute paths share one param tree:

        - train: leading stride-1 stages run as gather+MXU SubM convs over
          the compact table (stage-0 at 1344^2 would otherwise cost ~7 GB
          of conv-backward temps per sample); densified after.
        - eval: everything runs as dense convs re-masked after every block
          (identical values on the active set, dense-conv speed).
        """
        start = 0
        mask = None
        packed = False
        if isinstance(x, SparseBEV):
            sb = x
            n_sparse = 0
            while (
                n_sparse < len(self.layer_nums)
                and self.ds_layer_strides[n_sparse] == 1
            ):
                n_sparse += 1
            mask = (sb.slot_of_dense < sb.capacity).reshape(
                sb.batch, *sb.spatial, 1
            )
            use_sparse = not self.force_dense_train and (train or self.sparse_eval)
            stages_mode = self.sparse_stages_train if train else self.sparse_stages_eval
            if use_sparse and stages_mode == "all":
                return self._all_sparse(sb, train)
            if use_sparse and stages_mode == "leading+down":
                return self._leading_down(sb, train)
            if n_sparse and use_sparse and stages_mode == "tile":
                x = self._tile_prefix(sb, n_sparse, train)
                start = n_sparse
            elif n_sparse and use_sparse:
                nbr = build_neighbor_table(
                    sb.slot_of_dense,
                    sb.slot_id,
                    sb.spatial,
                    subm_offsets_2d(self.kernel_size[0]),
                    sb.capacity,
                )
                feats = sb.table[:-1]
                for i in range(n_sparse):
                    feats = _SparseStage(
                        self.ds_num_filters[i],
                        self.kernel_size[i],
                        self.layer_nums[i],
                        axis_name=self.axis_name,
                        dtype=self.dtype,
                        save_conv_out=self.remat_save_conv_out,
                        name=f"stage_{i}",
                    )(feats, sb.valid, nbr, train)
                start = n_sparse
                # eval-only: densify straight into the 2x2-packed layout so
                # the next stage's stride-2 down conv runs as a dense 2x2
                # conv (11.9% -> ~60% MFU on the down conv, see
                # _PackedDownConv / tools/stage1_probe.py); same gather
                # descriptor count as the full-res densify
                packed = (
                    not train
                    and self.packed_downsample
                    and start < len(self.layer_nums)
                    and self.ds_layer_strides[start] == 2
                    and self.kernel_size[start] == 3
                    and sb.spatial[0] % 2 == 0
                    and sb.spatial[1] % 2 == 0
                )
                if packed:
                    x = sb.with_table(feats).to_dense_packed()
                else:
                    x = sb.with_table(feats).to_dense()
            else:
                x = sb.to_dense()
            mask = mask.astype(x.dtype)
            if not train and not self.masked_eval:
                mask = None

        stage_cls = (
            nn.remat(_Stage, static_argnums=(2,))
            if train and self.remat_train
            else _Stage
        )
        def full_mask(m, channels):
            # pre-broadcast the (B, H, W, 1) active-set mask to the stage's
            # full channel count, materialized ONCE (optimization_barrier
            # stops XLA re-fusing the broadcast into every conv epilogue):
            # the lane-broadcast multiply of a 1-channel mask relayouts the
            # activation around every conv (~3.6 ms/conv at 1344^2 x 64 on
            # v5e, tools/maskvar_probe.py) while a full-channel multiply is
            # ~free (+0.6 ms across five convs)
            return jax.lax.optimization_barrier(
                jnp.broadcast_to(m, (*m.shape[:-1], channels))
            )

        for i in range(start, len(self.layer_nums)):
            if mask is not None and self.ds_layer_strides[i] > 1:
                # strided SparseConv dilates the active set (output site is
                # active if any input site in its k x k window is)
                s = self.ds_layer_strides[i]
                k = self.kernel_size[i]
                p = k // 2
                mask = jax.lax.reduce_window(
                    mask,
                    jnp.array(0, mask.dtype),
                    jax.lax.max,
                    (1, k, k, 1),
                    (1, s, s, 1),
                    ((0, 0), (p, p), (p, p), (0, 0)),
                )
            x = stage_cls(
                self.ds_num_filters[i],
                self.ds_layer_strides[i],
                self.kernel_size[i],
                self.layer_nums[i],
                packed_input=(packed and i == start),
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"stage_{i}",
            )(x, train, None if mask is None else full_mask(mask, self.ds_num_filters[i]))
        x = ConvBlock(
            self.out_channels,
            kernel_size=1,
            bn_eps=BN_EPS_SPARSE,
            bn_momentum=BN_MOMENTUM_SPARSE,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x, train, None if mask is None else full_mask(mask, self.out_channels))
        return x

    def _tile_map_for(self, sod, slot_id, batch, spatial, site_cap, frac=1.0,
                      tag="prefix"):
        """Build + telemetrize a TileMap at one resolution (overflowed tiles
        drop their sites — the trainer raises on nonzero overflow).

        ``tile_capacity <= 0`` means the FULL tile grid (cannot overflow);
        serving sets this on its largest bucket so overflow repair is
        guaranteed exact for the tile capacity too, and scales the cap
        proportionally on smaller buckets (serving.py)."""
        h, w = spatial
        t = self.tile_size
        n_cells = batch * (h // t) * (w // t)
        if self.tile_capacity <= 0:
            cap = n_cells
        else:
            cap = min(max(int(self.tile_capacity * batch * frac), 256), n_cells)
        tm = build_tile_map(sod, slot_id, batch, spatial, site_cap, t, cap)
        if not self.is_initializing():
            self.sow("telemetry", f"{tag}_tiles{h}_active", tm.n_tiles)
            self.sow(
                "telemetry",
                f"{tag}_tiles{h}_overflow",
                jnp.maximum(tm.n_tiles - cap, 0),
            )
        return tm

    def _tile_prefix(self, sb: SparseBEV, n_sparse: int, train: bool):
        """Run the leading stride-1 stages over the active-tile stack and
        densify once (whole-tile scatter + relayout — no 1.8M-descriptor
        gather)."""
        if len(sb.spatial) != 2 or any(
            self.kernel_size[i] != 3 for i in range(n_sparse)
        ):
            raise ValueError(
                "sparse_stages='tile' requires a 2-D BEV grid and 3x3 "
                f"stride-1 kernels (got spatial={tuple(sb.spatial)}, "
                f"kernel_size={tuple(self.kernel_size[:n_sparse])}); use "
                "sparse_stages='leading' for this configuration"
            )
        tm = self._tile_map_for(
            sb.slot_of_dense, sb.slot_id, sb.batch, sb.spatial, sb.capacity
        )
        stack = pack_stack(sb.table, tm)
        for i in range(n_sparse):
            stack = _TileStage(
                self.ds_num_filters[i],
                self.kernel_size[i],
                self.layer_nums[i],
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"stage_{i}",
            )(stack, tm.out_mask, tm.nbr, train)
        return stack_to_dense(stack, tm)

    def _all_sparse(self, sb: SparseBEV, train: bool):
        """Whole backbone over compact tables (spconv-exact, no masks):
        SubM stride-1 stages, set-dilating strided downsamples, SubM 1x1
        mapping; densified once at the final (H/8) grid.  Same param tree
        as the dense path (dense/sparse checkpoints interchange)."""
        batch = sb.batch
        spatial = sb.spatial
        table = sb.table[:-1]
        valid, sod, slot_id = sb.valid, sb.slot_of_dense, sb.slot_id
        cap0 = sb.capacity

        for i, num_blocks in enumerate(self.layer_nums):
            k, s, f = self.kernel_size[i], self.ds_layer_strides[i], self.ds_num_filters[i]
            if s == 1:
                if self.tile_stride1 and len(spatial) == 2 and k == 3:
                    tm = self._tile_map_for(
                        sod, slot_id, batch, spatial, valid.shape[0],
                        frac=float(self.stage_capacity_frac[i]),
                        tag=f"stage{i}",
                    )
                    stack = pack_stack(table, tm)
                    stack = _TileStage(
                        f, k, num_blocks,
                        axis_name=self.axis_name, dtype=self.dtype,
                        name=f"stage_{i}",
                    )(stack, tm.out_mask, tm.nbr, train)
                    table = unpack_stack(stack, tm)
                    continue
                nbr = build_neighbor_table(
                    sod, slot_id, spatial, subm_offsets_2d(k), valid.shape[0]
                )
                table = _SparseStage(
                    f, k, num_blocks,
                    axis_name=self.axis_name, dtype=self.dtype,
                    save_conv_out=self.remat_save_conv_out,
                    name=f"stage_{i}",
                )(table, valid, nbr, train)
            else:
                out_hw = (spatial[0] + s - 1) // s * ((spatial[1] + s - 1) // s)
                cap_out = min(
                    max(int(cap0 * float(self.stage_capacity_frac[i])), 4096),
                    batch * out_hw,
                )
                out_slot_id, out_sod, out_valid, out_sp, n_out = downsample_active_set(
                    sod, valid.shape[0], batch, spatial, (k, k), (s, s), cap_out
                )
                if not self.is_initializing():
                    self.sow("telemetry", f"stage{i}_active", n_out)
                    self.sow(
                        "telemetry",
                        f"stage{i}_overflow",
                        jnp.maximum(n_out - cap_out, 0),
                    )
                nbr_fwd, nbr_rev = build_down_neighbor_tables(
                    sod, out_slot_id, out_sod, slot_id, batch, spatial,
                    (k, k), (s, s),
                )
                nbr_sub = build_neighbor_table(
                    out_sod, out_slot_id, out_sp, subm_offsets_2d(k), cap_out
                )
                table = _SparseStridedStage(
                    f, k, num_blocks,
                    axis_name=self.axis_name, dtype=self.dtype,
                    save_conv_out=self.remat_save_conv_out,
                    name=f"stage_{i}",
                )(table, out_valid, nbr_fwd, nbr_rev, nbr_sub, train)
                valid, sod, slot_id, spatial = out_valid, out_sod, out_slot_id, out_sp

        # 1x1 mapping = SubM with self-neighbors (ConvBlock-compatible tree)
        nbr1 = build_neighbor_table(
            sod, slot_id, spatial, np.zeros((1, 2), np.int32), valid.shape[0]
        )
        table = SparseConvBlock(
            self.out_channels, 1,
            axis_name=self.axis_name, dtype=self.dtype, name="ConvBlock_0",
        )(table, valid, nbr1, train)

        return SparseBEV(
            table=jnp.concatenate(
                [table, jnp.zeros((1, table.shape[-1]), table.dtype)], axis=0
            ),
            valid=valid,
            slot_of_dense=sod,
            slot_id=slot_id,
            batch=batch,
            spatial=tuple(spatial),
        ).to_dense()

    def _leading_down(self, sb: SparseBEV, train: bool):
        """'leading+down' mode: the stride-1 prefix AND the first strided
        downsample run sparse, so the dense image is materialized once at
        the POST-stride grid (H/2: 4x fewer cells/bytes than 'leading''s
        full-resolution densify); the rest of the backbone is the
        [masked-]dense tail.  Identical math to 'leading' on the active
        set (the strided SparseConv dilates the set exactly like the dense
        path's reduce_window mask dilation)."""
        n_sparse = 0
        while (
            n_sparse < len(self.layer_nums)
            and self.ds_layer_strides[n_sparse] == 1
        ):
            n_sparse += 1
        assert n_sparse < len(self.layer_nums), "needs a strided stage"
        batch, spatial = sb.batch, sb.spatial
        cap0 = sb.capacity

        nbr = build_neighbor_table(
            sb.slot_of_dense, sb.slot_id, spatial,
            subm_offsets_2d(self.kernel_size[0]), cap0,
        )
        table = sb.table[:-1]
        for i in range(n_sparse):
            table = _SparseStage(
                self.ds_num_filters[i], self.kernel_size[i], self.layer_nums[i],
                axis_name=self.axis_name, dtype=self.dtype,
                save_conv_out=self.remat_save_conv_out, name=f"stage_{i}",
            )(table, sb.valid, nbr, train)

        i = n_sparse
        k, s, f = self.kernel_size[i], self.ds_layer_strides[i], self.ds_num_filters[i]
        out_hw = (spatial[0] + s - 1) // s * ((spatial[1] + s - 1) // s)
        cap_out = min(
            max(int(cap0 * float(self.stage_capacity_frac[i])), 4096),
            batch * out_hw,
        )
        out_slot_id, out_sod, out_valid, out_sp, n_out = downsample_active_set(
            sb.slot_of_dense, cap0, batch, spatial, (k, k), (s, s), cap_out
        )
        if not self.is_initializing():
            self.sow("telemetry", f"stage{i}_active", n_out)
            self.sow("telemetry", f"stage{i}_overflow", jnp.maximum(n_out - cap_out, 0))
        nbr_fwd, nbr_rev = build_down_neighbor_tables(
            sb.slot_of_dense, out_slot_id, out_sod, sb.slot_id, batch, spatial,
            (k, k), (s, s),
        )

        def full_mask(m, channels):
            # pre-broadcast + barrier: see __call__'s dense tail
            return jax.lax.optimization_barrier(
                jnp.broadcast_to(m, (*m.shape[:-1], channels))
            )

        mask = None
        if train or self.masked_eval:
            mask = (out_sod < cap_out).reshape(batch, *out_sp, 1)

        x = _HybridStridedStage(
            f, k, self.layer_nums[i],
            axis_name=self.axis_name, dtype=self.dtype, name=f"stage_{i}",
        )(
            table, out_valid, nbr_fwd, nbr_rev, out_sod, out_slot_id,
            batch, out_sp, None if mask is None else full_mask(
                mask.astype(self.dtype or jnp.float32), f
            ),
            train,
        )
        if mask is not None:
            mask = mask.astype(x.dtype)

        stage_cls = (
            nn.remat(_Stage, static_argnums=(2,))
            if train and self.remat_train
            else _Stage
        )
        for j in range(i + 1, len(self.layer_nums)):
            if mask is not None and self.ds_layer_strides[j] > 1:
                sj, kj, pj = self.ds_layer_strides[j], self.kernel_size[j], self.kernel_size[j] // 2
                mask = jax.lax.reduce_window(
                    mask,
                    jnp.array(0, mask.dtype),
                    jax.lax.max,
                    (1, kj, kj, 1),
                    (1, sj, sj, 1),
                    ((0, 0), (pj, pj), (pj, pj), (0, 0)),
                )
            x = stage_cls(
                self.ds_num_filters[j],
                self.ds_layer_strides[j],
                self.kernel_size[j],
                self.layer_nums[j],
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"stage_{j}",
            )(x, train, None if mask is None else full_mask(mask, self.ds_num_filters[j]))
        x = ConvBlock(
            self.out_channels,
            kernel_size=1,
            bn_eps=BN_EPS_SPARSE,
            bn_momentum=BN_MOMENTUM_SPARSE,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x, train, None if mask is None else full_mask(mask, self.out_channels))
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
    # per-stage compact capacity as a fraction of the reader capacity (sparse
    # path; + one entry for the extra z-downsample).  Every gather conv costs
    # O(capacity) regardless of the active count, so carrying the reader
    # capacity through all stages (the pre-round-3 behavior, = all-1.0) makes
    # the deep wide stages 4-8x more expensive than their active sets need.
    # A strided SparseConv3d first DILATES the set (<= 27x) then merges 8:1
    # cells — and at LiDAR voxel density the dilation WINS at the first
    # strided stage: occupancy replay at both config grids measures the
    # stage-1 active set at ~1.44x the reader count (nusc 140573 -> 197715,
    # waymo 141768 -> 204311; tools/calibrate_capacity.py), shrinking only
    # from stage 2 on.  The old (1.0, 0.625, ...) default undersized
    # stage 1.  Undersized capacities FAIL LOUDLY via the overflow
    # telemetry (the Trainer raises) — never silent truncation; calibrate
    # per dataset with tools/calibrate_capacity.py.
    stage_capacity_frac: Sequence[float] = (1.0, 1.5, 0.9, 0.4, 0.25)
    # save tagged sparse-conv outputs under remat (see SparseResNet)
    remat_save_conv_out: bool = True
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
        if isinstance(x, SparseBEV):
            return self._sparse_forward(x, train)
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
        # extra z-downsample: kernel (3,1,1) stride (2,1,1), padding 0 — the
        # reference SparseConv3d default (sparse_resnet3d.py:43-46); padding
        # 1 here would grow D (e.g. voxel18: 5 -> 3 instead of 2) and break
        # the folded channel count fed to the neck
        x = nn.Conv(
            self.ds_num_filters[-1],
            (3, 1, 1),
            strides=(2, 1, 1),
            padding=((0, 0), (0, 0), (0, 0)),
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

    def _sparse_forward(self, sb: SparseBEV, train: bool):
        """Fully sparse path (gather+MXU): SubM stride-1 stages, strided
        SparseConv downsamples with active-set dilation, extra z-downsample
        (padding 0), SubM 1x1 mapping — all over compact tables; densified
        only at the final (D_f, H/8, W/8) grid for the depth fold.

        The dense 3-D path above cannot run the configured voxel18 grid
        (the (B, 40, 1344, 1344, C) volume alone exceeds HBM); this path is
        O(active sites) in both FLOPs and memory, for train AND eval.
        """
        batch = sb.batch
        spatial = sb.spatial
        table = sb.table[:-1]
        valid, sod, slot_id = sb.valid, sb.slot_of_dense, sb.slot_id
        cap = sb.capacity

        # remat per block in training: each conv backward gathers a
        # (cap, K*C) buffer (243 MB at voxel18 capacity); without remat
        # XLA keeps them all live and the step OOMs at config resolution
        pol = _sparse_remat_policy(self.remat_save_conv_out)
        conv_cls = nn.remat(SparseConvBlock, static_argnums=(4,), policy=pol) if train else SparseConvBlock
        res_cls = nn.remat(SparseResidualBlock, static_argnums=(4,), policy=pol) if train else SparseResidualBlock

        for i, num_blocks in enumerate(self.layer_nums):
            k, s = self.kernel_size[i], self.ds_layer_strides[i]
            f = self.ds_num_filters[i]
            if s > 1:
                cap_out = min(
                    max(int(cap * float(self.stage_capacity_frac[i])), 4096),
                    batch
                    * int(
                        np.prod(out_spatial_for(spatial, (k,) * 3, (s,) * 3))
                    ),
                )
                out_slot_id, out_sod, out_valid, out_sp, n_out = downsample_active_set(
                    sod, valid.shape[0], batch, spatial, (k,) * 3, (s,) * 3, cap_out
                )
                if not self.is_initializing():
                    self.sow("telemetry", f"stage{i}_active", n_out)
                    # vs cap_out, NOT the reader cap: the stage truncates at
                    # ITS table size (a frac<1 overflow was invisible here
                    # before — caught by the parity tools' fail-loud check)
                    self.sow(
                        "telemetry",
                        f"stage{i}_overflow",
                        jnp.maximum(n_out - cap_out, 0),
                    )
                nbr_fwd, nbr_rev = build_down_neighbor_tables(
                    sod, out_slot_id, out_sod, slot_id, batch, spatial,
                    (k,) * 3, (s,) * 3,
                )
                x = _SparseDownConv(f, (k,) * 3, self.dtype, name=f"stage_{i}_down")(
                    table, nbr_fwd, nbr_rev
                )
                x = MaskedBatchNorm(
                    axis_name=self.axis_name, dtype=self.dtype,
                    name=f"stage_{i}_down_bn",
                )(x, out_valid, train)
                table = jnp.where(out_valid[:, None], nn.relu(x), 0.0)
                valid, sod, slot_id, spatial = out_valid, out_sod, out_slot_id, out_sp
            else:
                nbr0 = build_neighbor_table(
                    sod, slot_id, spatial, subm_offsets_3d(k), valid.shape[0]
                )
                table = conv_cls(
                    f, k, ndim=3, axis_name=self.axis_name, dtype=self.dtype,
                    name=f"stage_{i}_down",
                )(table, valid, nbr0, train)
            if num_blocks:
                nbr = build_neighbor_table(
                    sod, slot_id, spatial, subm_offsets_3d(k), valid.shape[0]
                )
                for j in range(num_blocks):
                    table = res_cls(
                        f, k, ndim=3, axis_name=self.axis_name, dtype=self.dtype,
                        name=f"stage_{i}_block_{j}",
                    )(table, valid, nbr, train)

        # extra z-downsample (3,1,1)/(2,1,1), padding 0 (sparse_resnet3d.py:43-46)
        extra_frac = float(
            self.stage_capacity_frac[len(self.layer_nums)]
            if len(self.stage_capacity_frac) > len(self.layer_nums)
            else self.stage_capacity_frac[-1]
        )
        cap_extra = min(
            max(int(cap * extra_frac), 4096),
            batch * int(np.prod(out_spatial_for(spatial, (3, 1, 1), (2, 1, 1), (0, 0, 0)))),
        )
        out_slot_id, out_sod, out_valid, out_sp, n_out = downsample_active_set(
            sod, valid.shape[0], batch, spatial, (3, 1, 1), (2, 1, 1), cap_extra, (0, 0, 0)
        )
        if not self.is_initializing():
            self.sow("telemetry", "extra_active", n_out)
            self.sow(
                "telemetry", "extra_overflow", jnp.maximum(n_out - cap_extra, 0)
            )
        nbr_fwd, nbr_rev = build_down_neighbor_tables(
            sod, out_slot_id, out_sod, slot_id, batch, spatial,
            (3, 1, 1), (2, 1, 1), (0, 0, 0),
        )
        x = _SparseDownConv(
            self.ds_num_filters[-1], (3, 1, 1), self.dtype, name="extra_conv"
        )(table, nbr_fwd, nbr_rev)
        x = MaskedBatchNorm(
            axis_name=self.axis_name, dtype=self.dtype, name="extra_conv_bn"
        )(x, out_valid, train)
        table = jnp.where(out_valid[:, None], nn.relu(x), 0.0)
        valid, sod, slot_id, spatial = out_valid, out_sod, out_slot_id, out_sp

        # SubM 1x1x1 mapping to out_channels (sparse_resnet3d.py:42-43)
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     name="mapping")(table)
        x = MaskedBatchNorm(
            axis_name=self.axis_name, dtype=self.dtype, name="mapping_bn"
        )(x, valid, train)
        table = jnp.where(valid[:, None], nn.relu(x), 0.0)

        # densify at the final grid, fold depth into channels
        out = SparseBEV(
            table=jnp.concatenate(
                [table, jnp.zeros((1, table.shape[-1]), table.dtype)], axis=0
            ),
            valid=valid,
            slot_of_dense=sod,
            slot_id=slot_id,
            batch=batch,
            spatial=tuple(spatial),
        ).to_dense()
        b, d, h, w, c = out.shape
        return jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
