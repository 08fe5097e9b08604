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

# ---- config-scale predict + train step (VERDICT r2 item 6) ---------------
from pillarnext_tpu.data.assign import AssignLabel
from pillarnext_tpu.data.collate import collate
from pillarnext_tpu.parallel import mesh as mesh_lib
from pillarnext_tpu.train import train_state as ts_lib


@jax.jit
def predict(v, p, m):
    return model.apply(v, {"points": p, "points_mask": m}, method=model.predict)


t0 = time.perf_counter()
dets = predict(variables, pts_j, mask_j)
s = float(jnp.sum(dets["scores"]))
print(f"predict compile+1st: {time.perf_counter() - t0:.0f}s", flush=True)
t0 = time.perf_counter()
outs = [predict(variables, pts_j, mask_j) for _ in range(10)]
float(jnp.sum(outs[-1]["scores"]))
dt = (time.perf_counter() - t0) / 10
print(f"predict B={B}: {dt * 1000:.1f} ms ({B / dt:.2f} fps), "
      f"dets valid={int(np.asarray(dets['valid']).sum())}", flush=True)

# one labeled synthetic batch through the real assigner, then timed train steps
pl = cfg["data"]["train_dataset"]["prepare_label"]["centermap"]
assigner = AssignLabel(
    tasks=pl["tasks"], gaussian_overlap=pl["gaussian_overlap"], max_objs=500,
    min_radius=pl["min_radius"], pc_range=cfg["model"]["reader"]["pc_range"],
    voxel_size=cfg["model"]["reader"]["voxel_size"],
    out_size_factor=pl["out_size_factor"],
)
rng = np.random.default_rng(0)
samples = []
for b in range(B):
    nb = 24
    gt = np.zeros((nb, 9), np.float32)
    gt[:, :2] = rng.uniform(-70, 70, (nb, 2))
    gt[:, 2] = -1.0
    gt[:, 3:6] = [4.8, 2.1, 1.8]
    gt[:, 8] = rng.uniform(-np.pi, np.pi, nb)
    names = np.array(["vehicle"] * nb)
    res = assigner({
        "token": f"t{b}",
        "points": pts[b][mask[b]],
        "annotations": {"gt_boxes": gt, "gt_names": names},
    })
    del res["annotations"]
    samples.append(res)
batch = collate(samples, max_points=N)
example = jax.tree.map(jnp.asarray, {k: v for k, v in batch.items() if k != "token"})

mesh = mesh_lib.make_mesh(jax.devices()[:1])
tx, _ = ts_lib.make_optimizer(max_lr=1e-3, total_steps=100, pct_start=0.2)
state = ts_lib.create_train_state(model, example, jax.random.PRNGKey(0), tx)
step = ts_lib.make_train_step(model, tx, mesh)

t0 = time.perf_counter()
state, (scalars, _) = step(state, example)
l0 = float(scalars["loss"])
print(f"train step compile+1st: {time.perf_counter() - t0:.0f}s "
      f"(loss {l0:.2f})", flush=True)
t0 = time.perf_counter()
REPS = 5
for _ in range(REPS):
    state, (scalars, _) = step(state, example)
lN = float(scalars["loss"])
dt = (time.perf_counter() - t0) / REPS
print(f"train step B={B}: {dt * 1000:.0f} ms ({dt / B:.3f} s/frame), "
      f"loss {l0:.2f} -> {lN:.2f}", flush=True)
assert np.isfinite(lN) and lN < l0
print("MVF-TRAIN-CONFIG-SCALE OK", flush=True)
