#!/usr/bin/env python
"""waymo_det_mvf18_aspp_iou_car forward at CONFIG resolution on the chip
(VERDICT round 1: MVF was only ever exercised at toy scale).

Usage: python tools/mvf_probe.py [batch] [npoints]
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

from pillarnext_tpu.utils import builders
from pillarnext_tpu.utils.config import load_experiment
from pillarnext_tpu.utils.synth import lidar_like_points

nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
B = nums[0] if nums else 1
N = nums[1] if len(nums) > 1 else 180_000

cfg = load_experiment(
    Path(__file__).resolve().parent.parent
    / "pillarnext_tpu/configs/experiments/waymo_det_mvf18_aspp_iou_car.yaml"
)
model = builders.build_model(cfg["model"])
print("reader:", type(model.reader).__name__, flush=True)

pts, mask = lidar_like_points(B, N, cfg["model"]["reader"]["pc_range"], seed=0)
pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)

t0 = time.perf_counter()
variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts_j[:1], mask_j[:1])
jax.block_until_ready(variables)
print(f"init: {time.perf_counter() - t0:.0f}s", flush=True)


@jax.jit
def fwd(v, p, m):
    preds = model.apply(v, p, m)
    return sum(jnp.sum(x.astype(jnp.float32)) for d in preds for x in d.values())


t0 = time.perf_counter()
out = float(fwd(variables, pts_j, mask_j))
print(f"forward compile+1st: {time.perf_counter() - t0:.0f}s (sum={out:.3e})", flush=True)
t0 = time.perf_counter()
outs = [fwd(variables, pts_j, mask_j) for _ in range(10)]
float(outs[-1])
dt = (time.perf_counter() - t0) / 10
print(f"forward B={B}: {dt * 1000:.1f} ms ({B / dt:.2f} fps)", flush=True)
import numpy as np

assert np.isfinite(out)
print("MVF-CONFIG-SCALE OK", flush=True)
