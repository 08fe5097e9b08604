#!/usr/bin/env python
"""On-chip A/B + exactness check of the fused PFN kernel (ops/pallas_pfn.py)
against the XLA PillarFeatureNet path at flagship shapes.

Usage: python tools/pallas_pfn_probe.py [batch] [npoints]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pillarnext_tpu.models.pillar_encoder import PillarFeatureNet
from pillarnext_tpu.utils.synth import lidar_like_points

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
PC = (-50.4, -50.4, -5.0, 50.4, 50.4, 3.0)
VS = (0.075, 0.075, 8.0)
CAP = 98304


def fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def bench(fn, *args, reps=20):
    fence(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    fence(outs[-1])
    return (time.perf_counter() - t0) / reps


net = PillarFeatureNet(
    num_input_features=5, num_filters=(64, 64), voxel_size=VS, pc_range=PC,
    pillar_capacity=CAP, dtype=jnp.bfloat16, output="sparse",
)
pts, mask = lidar_like_points(B, N, PC, seed=0)
pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
variables = jax.jit(net.init)(jax.random.PRNGKey(0), pts_j, mask_j)

run = jax.jit(lambda v, p, m: net.apply(v, p, m).table)
os.environ["PNX_PALLAS_PFN"] = "0"
run_xla = jax.jit(lambda v, p, m: net.apply(v, p, m).table)
t_x = np.asarray(run_xla(variables, pts_j, mask_j), np.float32)
os.environ["PNX_PALLAS_PFN"] = "auto"
t_f = np.asarray(run(variables, pts_j, mask_j), np.float32)
ne = int((t_f != t_x).sum())
print(f"table {t_f.shape}: {ne} differing elements, maxdiff "
      f"{np.abs(t_f - t_x).max():.3e}", flush=True)

# timing variants fetch ONE scalar (the tunnel fetch of the 12.6 MB table
# would otherwise dominate); two interleaved rounds expose drift
os.environ["PNX_PALLAS_PFN"] = "0"
runs_xla = jax.jit(lambda v, p, m: jnp.sum(
    net.apply(v, p, m).table.astype(jnp.float32)))
fence(runs_xla(variables, pts_j, mask_j))  # trace under env=0
os.environ["PNX_PALLAS_PFN"] = "auto"
runs = jax.jit(lambda v, p, m: jnp.sum(
    net.apply(v, p, m).table.astype(jnp.float32)))
for rnd in range(2):
    dt_f = bench(runs, variables, pts_j, mask_j)
    dt_x = bench(runs_xla, variables, pts_j, mask_j)
    print(f"round {rnd}: reader->table fused {dt_f*1e3:7.2f} ms | "
          f"xla {dt_x*1e3:7.2f} ms (B={B}, N={N})", flush=True)
