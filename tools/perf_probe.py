#!/usr/bin/env python
"""Quick stage-timing probe on the real chip.

Usage: python tools/perf_probe.py [reader|feat|forward|predict|train] [batch] [npoints]
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

STAGE = sys.argv[1] if len(sys.argv) > 1 else "predict"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
N = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000

cfg = load_experiment(
    Path(__file__).resolve().parent.parent
    / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"
)
model = builders.build_model(cfg["model"])
rng = np.random.default_rng(0)
pc = cfg["model"]["reader"]["pc_range"]
pts = np.zeros((B, N, 5), np.float32)
pts[..., 0] = rng.uniform(pc[0], pc[3], (B, N))
pts[..., 1] = rng.uniform(pc[1], pc[4], (B, N))
pts[..., 2] = rng.uniform(-3, 1, (B, N))
pts[..., 3] = rng.uniform(0, 1, (B, N))
mask = np.ones((B, N), bool)
pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts_j[:1], mask_j[:1])
jax.block_until_ready(variables)


def run(name, fn, reps=5):
    t0 = time.perf_counter()
    float(fn(variables, pts_j, mask_j))
    print(f"{name} compile+1st: {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(variables, pts_j, mask_j))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name} B={B}: {dt * 1000:.0f} ms  ({B / dt:.2f} fps)", flush=True)


if STAGE == "reader":
    @jax.jit
    def fn(v, p, m):
        return model.apply(v, p, m, method=lambda mdl, pp, mm: mdl.reader(pp, mm, False)).sum()
    run("reader", fn)
elif STAGE == "feat":
    @jax.jit
    def fn(v, p, m):
        return model.apply(v, p, m, method=lambda mdl, pp, mm: mdl.extract_feat(pp, mm, False)).sum()
    run("feat", fn)
elif STAGE == "forward":
    @jax.jit
    def fn(v, p, m):
        preds = model.apply(v, p, m)
        return sum(jnp.sum(x) for d in preds for x in d.values())
    run("forward", fn)
elif STAGE == "predict":
    @jax.jit
    def fn(v, p, m):
        out = model.apply(v, {"points": p, "points_mask": m}, method=model.predict)
        return out["scores"].sum()
    run("predict", fn)
else:
    raise SystemExit(f"unknown stage {STAGE}")
