#!/usr/bin/env python
"""On-chip predict throughput for arbitrary eval-config combos.

Usage: python tools/exact_probe.py [B=n] [iters=n] [model.key.path=value ...]
Defaults to the bit-exact configuration (masked tail + exact top-k).
Times the full predict (decode+NMS included), pipelined dispatch with one
fence (the tunnel's block_until_ready does not synchronize).
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

from pillarnext_tpu.utils import builders
from pillarnext_tpu.utils.config import load_experiment
from pillarnext_tpu.utils.synth import lidar_like_points

B, ITERS, N = 1, 20, 200_000
overrides = [
    "model.backbone.masked_eval=true",
    "model.post_processing.approx_topk=false",
]
for a in sys.argv[1:]:
    if a.startswith("B="):
        B = int(a[2:])
    elif a.startswith("iters="):
        ITERS = int(a[6:])
    else:
        overrides.append(a)

cfg = load_experiment(
    Path(__file__).resolve().parent.parent
    / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml",
    overrides,
)
model = builders.build_model(cfg["model"])

pc = cfg["model"]["reader"]["pc_range"]
pts, mask = lidar_like_points(B, N, pc, seed=0)
pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts_j[:1], mask_j[:1])


@jax.jit
def predict(v, p, m):
    return model.apply(v, {"points": p, "points_mask": m}, method=model.predict)


def fetch(out):
    return float(np.asarray(out["scores"]).sum())


t0 = time.perf_counter()
fetch(predict(variables, pts_j, mask_j))
print(f"compile+1st: {time.perf_counter() - t0:.0f}s", flush=True)
fetch(predict(variables, pts_j, mask_j))

t0 = time.perf_counter()
outs = [predict(variables, pts_j, mask_j) for _ in range(ITERS)]
fetch(outs[-1])
dt = (time.perf_counter() - t0) / ITERS
print(
    f"B={B} {' '.join(overrides)}: {dt * 1000:.1f} ms/batch  {B / dt:.2f} fps",
    flush=True,
)
