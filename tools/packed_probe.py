#!/usr/bin/env python
"""Disambiguate the packed-downsample regression (feat 104 ms vs 58 ms
baseline with to_dense_packed + _PackedDownConv): which piece is slow?

  A. 2x2 conv 256->128 @672^2, asymmetric padding ((1,0),(1,0))  [66.6 GF]
  B. 2x2 conv, zero padding (output 671^2)                        [control]
  C. 3x3 conv 256->128 @672^2 symmetric                           [149.8 GF]
  D. plain densify gather (1.8M rows from 98k x 64)               [baseline]
  E. 4 subgrid gathers + channel concat (= to_dense_packed today)
  F. ONE gather with interleaved indices -> reshape (672,672,256)
  G. D + explicit space-to-depth transpose to (672,672,256)

Usage: python tools/packed_probe.py
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

DT = jnp.bfloat16
PEAK = 98.3e12
H = W = 1344
CAP = 98304
C = 64


def timed(name, fn, *args, gflop=None, reps=20):
    float(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / reps
    mfu = f"  mfu {gflop * 1e9 / dt / PEAK:5.1%}" if gflop else ""
    print(f"{name:46s} {dt * 1000:7.2f} ms{mfu}", flush=True)


def main():
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(1, 672, 672, 256)).astype(np.float32), DT)
    k22 = jnp.asarray(rng.normal(size=(2, 2, 256, 128)).astype(np.float32) * 0.05, DT)
    k33 = jnp.asarray(rng.normal(size=(3, 3, 256, 128)).astype(np.float32) * 0.05, DT)

    def cv(x, k, pad):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    f_a = jax.jit(lambda x, k: cv(x, k, ((1, 0), (1, 0))).astype(jnp.float32).sum())
    timed("A 2x2 conv asym pad ((1,0),(1,0))", f_a, xp, k22, gflop=66.6)
    f_b = jax.jit(lambda x, k: cv(x, k, ((0, 0), (0, 0))).astype(jnp.float32).sum())
    timed("B 2x2 conv no pad (671^2 out)", f_b, xp, k22, gflop=66.4)
    f_c = jax.jit(lambda x, k: cv(x, k, ((1, 1), (1, 1))).astype(jnp.float32).sum())
    timed("C 3x3 conv sym pad", f_c, xp, k33, gflop=149.8)

    # gathers
    n_active = int(H * W * 0.045)
    ids = np.sort(rng.choice(H * W, n_active, replace=False)).astype(np.int32)
    sod_np = np.full(H * W, CAP, np.int32)
    sod_np[ids] = np.arange(n_active, dtype=np.int32)
    sod = jnp.asarray(sod_np)
    table = jnp.asarray(
        rng.normal(size=(CAP + 1, C)).astype(np.float32), DT
    ).at[CAP].set(0)

    f_d = jax.jit(lambda t: t[sod].astype(jnp.float32).sum())
    timed("D plain densify gather 1.8M x 64", f_d, table)

    sod2 = sod.reshape(H, W)

    @jax.jit
    def f_e(t):
        parts = [
            t[sod2[dy::2, dx::2].reshape(-1)].reshape(1, H // 2, W // 2, C)
            for dy in (0, 1) for dx in (0, 1)
        ]
        return jnp.concatenate(parts, axis=-1).astype(jnp.float32).sum()
    timed("E 4 subgrid gathers + concat", f_e, table)

    # interleaved: idx[Y, X, dy*2+dx] = sod[2Y+dy, 2X+dx]
    idx_il = jnp.asarray(
        sod_np.reshape(H // 2, 2, W // 2, 2)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )

    @jax.jit
    def f_f(t):
        g = t[idx_il]  # (1.8M, 64) in packed row order
        return g.reshape(1, H // 2, W // 2, 4 * C).astype(jnp.float32).sum()
    timed("F interleaved gather + reshape", f_f, table)

    @jax.jit
    def f_g(t):
        d = t[sod].reshape(1, H, W, C)
        p = d.reshape(1, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        return p.reshape(1, H // 2, W // 2, 4 * C).astype(jnp.float32).sum()
    timed("G densify + s2d transpose", f_g, table)

    # fused candidates: gather form + the 2x2 conv
    @jax.jit
    def f_fa(t, k):
        g = t[idx_il].reshape(1, H // 2, W // 2, 4 * C)
        return cv(g, k, ((1, 0), (1, 0))).astype(jnp.float32).sum()
    timed("F + A (interleaved gather -> 2x2 conv)", f_fa, table, k22, gflop=66.6)

    @jax.jit
    def f_ga(t, k):
        d = t[sod].reshape(1, H, W, C)
        p = d.reshape(1, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        g = p.reshape(1, H // 2, W // 2, 4 * C)
        return cv(g, k, ((1, 0), (1, 0))).astype(jnp.float32).sum()
    timed("G + A (densify -> s2d -> 2x2 conv)", f_ga, table, k22, gflop=66.6)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    main()
