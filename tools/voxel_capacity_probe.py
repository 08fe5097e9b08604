#!/usr/bin/env python
"""Measured per-stage active-site counts of the sparse 3-D backbone at config
resolution — grounds SparseResNet3D.stage_capacity_frac.

Usage: python tools/voxel_capacity_probe.py [batch] [npoints]
Prints reader voxel_active and each stage's dilated active count vs its
capacity.
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
N = int(sys.argv[2]) if len(sys.argv) > 2 else 260_000

cfg = load_experiment(
    Path(__file__).resolve().parent.parent
    / "pillarnext_tpu/configs/experiments/nusc_det_voxel18_aspp_iou_sp.yaml"
)
model = builders.build_model(cfg["model"])

rng = np.random.default_rng(0)
r = np.minimum(np.abs(rng.gamma(2.0, 9.0, (B, N))), 50.0)
theta = rng.uniform(-np.pi, np.pi, (B, N))
pts = np.zeros((B, N, 5), np.float32)
pts[..., 0] = r * np.cos(theta)
pts[..., 1] = r * np.sin(theta)
pts[..., 2] = np.clip(rng.normal(-1.2, 0.8, (B, N)), -4.9, 2.9)
pts[..., 3] = rng.uniform(0, 1, (B, N))
pts_j = jnp.asarray(pts)
mask_j = jnp.ones((B, N), bool)

variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts_j[:1], mask_j[:1])


@jax.jit
def feat(v, p, m):
    out, tele = model.apply(
        v, p, m,
        method=lambda mdl, pp, mm: mdl.extract_feat(pp, mm, False),
        mutable=["telemetry"],
    )
    return tele, jnp.sum(out.astype(jnp.float32))


t0 = time.perf_counter()
tele, _ = feat(variables, pts_j, mask_j)
tele = jax.tree.map(lambda x: np.asarray(x), tele)
print(f"compile+run: {time.perf_counter() - t0:.0f}s", flush=True)
for path, leaf in jax.tree_util.tree_leaves_with_path(tele):
    print(jax.tree_util.keystr(path), int(np.max(leaf)))
