#!/usr/bin/env python
"""On-chip A/B of the tile-stack SubM backbone (ops/tile_subm.py) at
flagship scale: eval e2e predict (default masked-dense vs 'tile' mode) and
the B=2 train step ('all' vs 'all'+tile_stride1).

Usage: python tools/tile_probe.py [eval|train|both] [tile_capacity]
"""

from __future__ import annotations

import copy
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
TCAP = int(sys.argv[2]) if len(sys.argv) > 2 else 12288

cfg = load_experiment(
    REPO / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"
)
pc = cfg["model"]["reader"]["pc_range"]


def _fence(out):
    # axon tunnel: block_until_ready does NOT fence; fetch a scalar leaf
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def bench(fn, *args, reps=10):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    _fence(outs[-1])
    return (time.perf_counter() - t0) / reps, out


if mode in ("eval", "both"):
    pts, mask = lidar_like_points(1, 200_000, pc, seed=0)
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    variables = None
    for label, bb_over in [
        ("default (masked-dense)", {}),
        ("tile", {"sparse_eval": True, "sparse_stages_eval": "tile", "tile_capacity": TCAP}),
    ]:
        mcfg = copy.deepcopy(cfg["model"])
        mcfg["backbone"].update(bb_over)
        m = builders.build_model(mcfg)
        if variables is None:
            variables = m.init(jax.random.PRNGKey(0), pts_j, mask_j)

        @jax.jit
        def predict(v, p, pm, m=m):
            out, tel = m.apply(
                v, {"points": p, "points_mask": pm}, method=m.predict,
                mutable="telemetry",
            )
            return out, tel

        t0 = time.perf_counter()
        dt, (out, tel) = bench(predict, variables, pts_j, mask_j)
        comp = time.perf_counter() - t0
        ov = {
            jax.tree_util.keystr(p): int(np.asarray(l).ravel()[0])
            for p, l in jax.tree_util.tree_flatten_with_path(tel)[0]
            if "tiles" in jax.tree_util.keystr(p)
        }
        print(
            f"eval {label:26s} {dt*1000:7.2f} ms = {1/dt:6.2f} fps "
            f"(compile+10 {comp:.0f}s) {ov}",
            flush=True,
        )

# train A/B: PNX_TILE=1 python tools/perf_probe.py train 2  (vs without)
