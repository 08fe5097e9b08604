#!/usr/bin/env python
"""Compile + correctness + timing of the Pallas rotated-IoU tile kernel on
the real chip (round-1 blocker: remote Mosaic compile hung).

Usage: python tools/pallas_probe.py [M] [N]
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

from pillarnext_tpu.core import jax_box_ops
from pillarnext_tpu.ops.pallas_iou import boxes_iou_bev_pallas

nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
M = nums[0] if nums else 1024
N = nums[1] if len(nums) > 1 else M

rng = np.random.default_rng(0)
boxes = np.zeros((max(M, N), 7), np.float32)
boxes[:, :2] = rng.uniform(-50, 50, (max(M, N), 2))
boxes[:, 3:5] = rng.uniform(0.5, 6.0, (max(M, N), 2))
boxes[:, 5] = 1.5
boxes[:, 6] = rng.uniform(-np.pi, np.pi, max(M, N))
a = jnp.asarray(boxes[:M])
b = jnp.asarray(boxes[:N])


def timed(name, fn, reps=30):
    t0 = time.perf_counter()
    out = fn(a, b)
    float(out.sum())
    print(f"{name:8s} compile+1st: {time.perf_counter() - t0:6.1f}s", flush=True)
    t0 = time.perf_counter()
    outs = [fn(a, b) for _ in range(reps)]
    float(outs[-1].sum())
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:8s} {M}x{N}: {dt * 1e3:7.3f} ms", flush=True)
    return out


xla = jax.jit(jax_box_ops.boxes_iou_bev)
pal = jax.jit(lambda a, b: boxes_iou_bev_pallas(a, b))

out_x = timed("xla", xla)
out_p = timed("pallas", pal)
diff = float(jnp.max(jnp.abs(out_x - out_p)))
print(f"max |xla - pallas| = {diff:.2e}", flush=True)
assert diff < 1e-3
print("PALLAS-IOU OK", flush=True)
