#!/usr/bin/env python
"""Compile/run probe for the candidate-sparse head predict program.

Times init, predict-compile, and steady-state predict with
candidate_sparse_head on vs off.  Usage: python tools/cs_head_probe.py [on|off|both]
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

REPO = Path(__file__).resolve().parent.parent
mode = sys.argv[1] if len(sys.argv) > 1 else "both"

cfg = load_experiment(
    REPO / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"
)
pc = cfg["model"]["reader"]["pc_range"]
pts, mask = lidar_like_points(1, 200_000, pc, seed=0)
pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)

model = builders.build_model(cfg["model"])
t0 = time.perf_counter()
variables = model.init(jax.random.PRNGKey(0), pts_j, mask_j)
jax.block_until_ready(variables)
print(f"init: {time.perf_counter()-t0:.1f}s", flush=True)

for flag in ([True, False] if mode == "both" else [mode == "on"]):
    import copy

    mcfg = copy.deepcopy(cfg["model"])
    mcfg["post_processing"]["candidate_sparse_head"] = flag
    m = builders.build_model(mcfg)

    @jax.jit
    def predict(v, p, pm):
        return m.apply(v, {"points": p, "points_mask": pm}, method=m.predict)

    t0 = time.perf_counter()
    out = predict(variables, pts_j, mask_j)
    jax.block_until_ready(out)
    print(f"candidate_sparse={flag} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    outs = [predict(variables, pts_j, mask_j) for _ in range(10)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / 10
    print(f"candidate_sparse={flag}: {dt*1000:.1f} ms/frame = {1/dt:.2f} fps", flush=True)
