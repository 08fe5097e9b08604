#!/usr/bin/env python
"""Cumulative per-stage timing of the flagship EVAL pipeline on the chip.

Builds partial stacks (reader -> sparse stage0 -> densify -> dense tail
stages -> 1x1 -> neck) out of the same building blocks as SparseResNet and
times each cumulatively; successive differences attribute cost per stage.
Masked vs unmasked tail selectable.

Usage: python tools/eval_breakdown.py [batch] [masked|unmasked]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pillarnext_tpu.models.aspp import ASPPNeck
from pillarnext_tpu.models.layers import BN_EPS_SPARSE, BN_MOMENTUM_SPARSE, ConvBlock
from pillarnext_tpu.models.pillar_encoder import PillarFeatureNet
from pillarnext_tpu.models.resnet import _SparseStage, _Stage
from pillarnext_tpu.ops.subm_conv import build_neighbor_table, subm_offsets_2d
from pillarnext_tpu.utils.synth import lidar_like_points

nums = [a for a in sys.argv[1:] if a.isdigit()]
B = int(nums[0]) if nums else 1
MASKED = "unmasked" not in sys.argv[1:]
N = 200_000
PC = [-50.4, -50.4, -5.0, 50.4, 50.4, 3.0]
FILTERS = (64, 128, 256, 256)
STRIDES = (1, 2, 2, 2)
LAYERS = (2, 2, 2, 2)
DT = jnp.bfloat16


class Partial(nn.Module):
    """Reader + first `upto` pipeline steps of the flagship eval path.

    steps: 0 reader, 1 +stage0(sparse), 2 +densify, 3..5 +dense stages,
    6 +1x1 map, 7 +neck.
    """

    upto: int
    masked: bool

    @nn.compact
    def __call__(self, points, mask):
        sb = PillarFeatureNet(
            num_input_features=5,
            num_filters=[64, 64],
            voxel_size=[0.075, 0.075, 8],
            pc_range=PC,
            pillar_capacity=98304,
            output="sparse",
            dtype=DT,
            name="reader",
        )(points, mask, False)
        if self.upto == 0:
            return jnp.sum(sb.table.astype(jnp.float32))

        nbr = build_neighbor_table(
            sb.slot_of_dense, sb.slot_id, sb.spatial, subm_offsets_2d(3), sb.capacity
        )
        feats = _SparseStage(64, 3, 2, dtype=DT, name="stage_0")(
            sb.table[:-1], sb.valid, nbr, False
        )
        if self.upto == 1:
            return jnp.sum(feats.astype(jnp.float32))

        x = sb.with_table(feats).to_dense()
        m = (sb.slot_of_dense < sb.capacity).reshape(sb.batch, *sb.spatial, 1)
        m = m.astype(x.dtype) if self.masked else None
        if self.upto == 2:
            return jnp.sum(x.astype(jnp.float32))

        for i in range(1, 4):
            if self.upto < 2 + i:
                break
            if m is not None:
                m = jax.lax.reduce_window(
                    m, jnp.array(0, m.dtype), jax.lax.max,
                    (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
                )
            x = _Stage(FILTERS[i], 2, 3, LAYERS[i], dtype=DT, name=f"stage_{i}")(
                x, False, m
            )
        if self.upto <= 5:
            return jnp.sum(x.astype(jnp.float32))

        x = ConvBlock(
            256, kernel_size=1, bn_eps=BN_EPS_SPARSE,
            bn_momentum=BN_MOMENTUM_SPARSE, dtype=DT, name="map",
        )(x, False, m)
        if self.upto == 6:
            return jnp.sum(x.astype(jnp.float32))

        x = ASPPNeck(in_channels=256, dtype=DT, name="neck")(x, False)
        return jnp.sum(x.astype(jnp.float32))


pts, pmask = lidar_like_points(B, N, PC, seed=0)
pts_j, mask_j = jnp.asarray(pts), jnp.asarray(pmask)

names = ["reader", "+stage0", "+densify", "+stage1", "+stage2", "+stage3", "+1x1", "+neck"]
prev = 0.0
for upto, name in enumerate(names):
    mod = Partial(upto=upto, masked=MASKED)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), pts_j, mask_j)
    fn = jax.jit(lambda v, p, m: mod.apply(v, p, m))
    t0 = time.perf_counter()
    float(fn(variables, pts_j, mask_j))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(variables, pts_j, mask_j) for _ in range(20)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / 20 * 1000
    print(
        f"{name:9s} cum {dt:7.2f} ms  (delta {dt - prev:+7.2f}, compile {compile_s:.0f}s)",
        flush=True,
    )
    prev = dt
