#!/usr/bin/env python
"""Why is dense-tail stage1 (1344^2 -> 672^2, 64 -> 128 ch) at 32% MFU when
stage2 (672^2 -> 336^2, 128 -> 256) hits 54%?  (tools/eval_breakdown.py r5:
stage1 9.6 ms vs stage2 5.6 ms at the SAME ~600 GFLOP.)

Times the candidate culprits in isolation on the chip (bf16, NHWC, B=1):
  1. the stride-2 3x3 down conv 64->128 @1344^2 input        (66.6 GF)
  2. same, reformulated space-to-depth: 2x2 conv 256->128    (66.6 GF)
  3. one residual 3x3 conv 128->128 @672^2                   (133 GF)
  4. (3) + full-channel mask multiply (the masked_eval cost)
  5. (3) at 336^2 x 256 (stage2's shape, 133 GF) — the MFU control
  6. full _Stage stage1, masked vs unmasked

Usage: python tools/stage1_probe.py
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

DT = jnp.bfloat16
PEAK = 98.3e12  # v5e bf16 peak FLOP/s (one-chip half of the 197 TF/s pair)


def timed(name, fn, *args, gflop=None, reps=20):
    # every fn returns a device SCALAR (4-byte tunnel fetch, honest fence)
    float(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / reps
    mfu = f"  mfu {gflop * 1e9 / dt / PEAK:5.1%}" if gflop else ""
    print(f"{name:42s} {dt * 1000:7.2f} ms{mfu}", flush=True)


def conv(cout, k, s=1):
    return nn.Conv(cout, (k, k), strides=(s, s), padding=((k // 2, k // 2),) * 2,
                   use_bias=False, dtype=DT)


def main():
    rng = np.random.default_rng(0)
    x1344 = jnp.asarray(rng.normal(size=(1, 1344, 1344, 64)).astype(np.float32), DT)
    x672 = jnp.asarray(rng.normal(size=(1, 672, 672, 128)).astype(np.float32), DT)
    x336 = jnp.asarray(rng.normal(size=(1, 336, 336, 256)).astype(np.float32), DT)
    m672 = jnp.asarray((rng.random((1, 672, 672, 1)) < 0.3).astype(np.float32), DT)
    m672f = jax.lax.optimization_barrier(jnp.broadcast_to(m672, (1, 672, 672, 128)))

    down = conv(128, 3, 2)
    vdown = down.init(jax.random.PRNGKey(0), x1344)
    f_down = jax.jit(lambda v, x: down.apply(v, x))
    f_down_s = jax.jit(lambda v, x: down.apply(v, x).astype(jnp.float32).sum())
    timed("down 3x3 s2 64->128 @1344^2", f_down_s, vdown, x1344, gflop=66.6)

    # space-to-depth reformulation: pack 2x2 spatial into channels, then a
    # 2x2 VALID conv over the packed map with a re-laid-out kernel computes
    # the same stride-2 3x3 conv (tap (2y+a-1, 2x+b-1) lives in packed rows
    # (y-1..y) / cols (x-1..x), channel (a+1)%2 / (b+1)%2)
    kern = np.asarray(vdown["params"]["kernel"], np.float32)  # (3,3,64,128)
    k2 = np.zeros((2, 2, 4 * 64, 128), np.float32)
    for a in range(3):
        for b in range(3):
            py, dy = divmod(a - 1 + 2, 2)  # packed row offset (0..1), sub-row
            px, dx = divmod(b - 1 + 2, 2)
            k2[py - 1 + 1, px - 1 + 1, (dy * 2 + dx) * 64:(dy * 2 + dx + 1) * 64, :] += kern[a, b]
    k2 = jnp.asarray(k2, DT)

    @jax.jit
    def f_s2d(x, k):
        b, h, w, c = x.shape
        p = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        p = p.reshape(b, h // 2, w // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            p, k, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=DT,
        )

    f_s2d_s = jax.jit(lambda x, k: f_s2d(x, k).astype(jnp.float32).sum())

    y_ref = f_down(vdown, x1344)
    y_s2d = f_s2d(x1344, k2)
    print(f"s2d max |delta|: {float(jnp.max(jnp.abs(y_ref.astype(jnp.float32) - y_s2d.astype(jnp.float32)))):.2e}",
          flush=True)
    timed("down via space-to-depth 2x2 256->128", f_s2d_s, x1344, k2, gflop=66.6)

    blk = conv(128, 3)
    vblk = blk.init(jax.random.PRNGKey(1), x672)
    f_blk = jax.jit(lambda v, x: blk.apply(v, x).astype(jnp.float32).sum())
    timed("res conv 3x3 128 @672^2", f_blk, vblk, x672, gflop=133.1)

    f_blkm = jax.jit(lambda v, x, m: (blk.apply(v, x) * m).astype(jnp.float32).sum())
    timed("res conv 3x3 128 @672^2 + full mask", f_blkm, vblk, x672, m672f, gflop=133.1)

    blk2 = conv(256, 3)
    vblk2 = blk2.init(jax.random.PRNGKey(2), x336)
    f_blk2 = jax.jit(lambda v, x: blk2.apply(v, x).astype(jnp.float32).sum())
    timed("res conv 3x3 256 @336^2 (stage2 ctrl)", f_blk2, vblk2, x336, gflop=133.1)

    # f32 accumulate control: does preferred_element_type matter?
    @jax.jit
    def f_blk_pf32(v, x):
        k = v["params"]["kernel"]
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).sum()
    timed("res conv 3x3 128 @672^2 (f32 acc)", f_blk_pf32, vblk, x672, gflop=133.1)

    # the composed stage via the production _Stage module, masked vs not
    from pillarnext_tpu.models.resnet import _Stage

    stage = _Stage(features=128, stride=2, kernel_size=3, num_blocks=2, dtype=DT)
    vs = stage.init(jax.random.PRNGKey(3), x1344, False, None)
    f_stage = jax.jit(lambda v, x: stage.apply(v, x, False, None).astype(jnp.float32).sum())
    timed("_Stage stage1 unmasked (down+2blk)", f_stage, vs, x1344, gflop=599)
    f_stage_m = jax.jit(lambda v, x, m: stage.apply(v, x, False, m).astype(jnp.float32).sum())
    timed("_Stage stage1 masked", f_stage_m, vs, x1344, m672f, gflop=599)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    main()
