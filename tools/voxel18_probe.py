#!/usr/bin/env python
"""nusc voxel18 at CONFIG resolution on the chip: eval forward+predict and
one train step (loss+grads) through the sparse 3-D path.

Usage: python tools/voxel18_probe.py [batch] [npoints] [eval|train ...]
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
import optax

from pillarnext_tpu.utils import builders
from pillarnext_tpu.utils.config import load_experiment

args = [a for a in sys.argv[1:] if not a.isdigit()]
nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
B = nums[0] if nums else 1
N = nums[1] if len(nums) > 1 else 260_000
MODES = args or ["eval"]

cfg = load_experiment(
    Path(__file__).resolve().parent.parent
    / "pillarnext_tpu/configs/experiments/nusc_det_voxel18_aspp_iou_sp.yaml"
)
model = builders.build_model(cfg["model"])
print("reader:", type(model.reader).__name__, model.reader.output, flush=True)

rng = np.random.default_rng(0)
r = np.minimum(np.abs(rng.gamma(2.0, 9.0, (B, N))), 50.0)
theta = rng.uniform(-np.pi, np.pi, (B, N))
pts = np.zeros((B, N, 5), np.float32)
pts[..., 0] = r * np.cos(theta)
pts[..., 1] = r * np.sin(theta)
pts[..., 2] = np.clip(rng.normal(-1.2, 0.8, (B, N)), -4.9, 2.9)
pts[..., 3] = rng.uniform(0, 1, (B, N))
pts[..., 4] = rng.uniform(0, 0.5, (B, N))
pts_j = jnp.asarray(pts)
mask_j = jnp.ones((B, N), bool)

t0 = time.perf_counter()
variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts_j[:1], mask_j[:1])
jax.block_until_ready(variables)
print(f"init: {time.perf_counter() - t0:.0f}s", flush=True)


def timed(name, fn, *a, reps=10):
    t0 = time.perf_counter()
    float(fn(*a))
    print(f"{name:8s} compile+1st: {time.perf_counter() - t0:5.0f}s", flush=True)
    t0 = time.perf_counter()
    outs = [fn(*a) for _ in range(reps)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:8s} B={B}: {dt * 1000:7.1f} ms ({B / dt:5.2f} fps)", flush=True)


if "eval" in MODES:
    @jax.jit
    def fwd(v, p, m):
        preds = model.apply(v, p, m)
        return sum(jnp.sum(x.astype(jnp.float32)) for d in preds for x in d.values())
    timed("forward", fwd, variables, pts_j, mask_j)

if "train" in MODES:
    # synthetic targets at head resolution
    tasks = cfg["model"]["head"]["tasks"]
    osf = cfg["model"]["head"]["out_size_factor"][0]
    pr, vs = cfg["model"]["reader"]["pc_range"], cfg["model"]["reader"]["voxel_size"]
    gw = int(round((pr[3] - pr[0]) / vs[0])) // osf
    max_objs = 50
    ex = {"points": pts_j, "points_mask": mask_j, "hm": [], "ind": [], "mask": [],
          "cat": [], "anno_box": [], "gt_boxes": []}
    for t in tasks:
        ex["hm"].append(jnp.zeros((B, gw, gw, len(t)), jnp.float32)
                        .at[:, gw // 2, gw // 2, 0].set(1.0))
        ex["ind"].append(jnp.full((B, max_objs), gw // 2 * gw + gw // 2, jnp.int32))
        m = jnp.zeros((B, max_objs), bool).at[:, 0].set(True)
        ex["mask"].append(m)
        ex["cat"].append(jnp.zeros((B, max_objs), jnp.int32))
        ab = jnp.zeros((B, max_objs, 10), jnp.float32).at[:, 0].set(
            jnp.asarray([0.5, 0.5, 0.0, 1.2, 0.6, 0.5, 0.0, 0.0, 0.0, 1.0]))
        ex["anno_box"].append(ab)
        gb = jnp.zeros((B, max_objs, 7), jnp.float32).at[:, 0].set(
            jnp.asarray([0.0, 0.0, 0.0, 3.0, 1.5, 1.5, 0.0]))
        ex["gt_boxes"].append(gb)

    tx = optax.adamw(1e-4)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, stats, opt, ex):
        def lossfn(p):
            (loss, logs), mut = model.apply(
                {"params": p, "batch_stats": stats}, ex,
                method=model.loss, mutable=["batch_stats"], train=True)
            return loss, mut["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(lossfn, has_aux=True)(params)
        upd, opt2 = tx.update(grads, opt, params)
        import optax as _o
        return _o.apply_updates(params, upd), new_stats, opt2, loss

    params, stats = variables["params"], variables["batch_stats"]

    def one(params=params, stats=stats, opt=opt):
        p2, s2, o2, loss = step(params, stats, opt, ex)
        return loss

    timed("train", one, reps=5)
