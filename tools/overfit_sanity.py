#!/usr/bin/env python
"""End-to-end learning sanity on the real chip: overfit a full config-scale
model (flagship PillarNeXt-B at the 1344^2 grid by default; --config voxel18
runs the fully sparse 3-D backbone at the 72M-cell grid) on one synthetic
scene and verify the detector finds the planted objects.

    python tools/overfit_sanity.py [steps] [--config flagship|voxel18|PATH]
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

from pillarnext_tpu.data.assign import AssignLabel
from pillarnext_tpu.data.collate import collate
from pillarnext_tpu.parallel import mesh as mesh_lib
from pillarnext_tpu.train import train_state as ts_lib
from pillarnext_tpu.utils import builders
from pillarnext_tpu.utils.config import load_experiment

# NOTE: eval mode uses BN *running* stats (torch momentum 0.01 parity =>
# 0.99 decay); they need a few hundred steps to converge to the overfit
# batch stats, so don't run this with fewer than ~250 steps.
_args = [a for a in sys.argv[1:]]
STEPS = int(_args[0]) if _args and _args[0].isdigit() else 300
_cfg_name = "flagship"
if "--config" in _args:
    _cfg_name = _args[_args.index("--config") + 1]
_CFG_FILES = {
    "flagship": "nusc_det_pp18_aspp_iou_sp.yaml",
    "voxel18": "nusc_det_voxel18_aspp_iou_sp.yaml",
}
_cfg_path = (
    Path(__file__).resolve().parent.parent
    / "pillarnext_tpu/configs/experiments"
    / _CFG_FILES.get(_cfg_name, _cfg_name)
)
print(f"config: {_cfg_path.name}, steps: {STEPS}", flush=True)

cfg = load_experiment(_cfg_path)
model = builders.build_model(cfg["model"])

# --- one synthetic scene: 6 cars + 4 pedestrians with dense point clusters
rng = np.random.default_rng(0)
N = 60_000
gt = np.zeros((10, 9), np.float32)
gt[:6, :2] = rng.uniform(-30, 30, (6, 2))
gt[:6, 2] = -1.0
gt[:6, 3:6] = [4.5, 1.9, 1.6]
gt[:6, 8] = rng.uniform(-np.pi, np.pi, 6)
gt[6:, :2] = rng.uniform(-20, 20, (4, 2))
gt[6:, 2] = -0.9
gt[6:, 3:6] = [0.7, 0.7, 1.7]
names = np.array(["car"] * 6 + ["pedestrian"] * 4)

pts = np.zeros((N, 5), np.float32)
# ground clutter
pts[:, 0] = rng.uniform(-50, 50, N)
pts[:, 1] = rng.uniform(-50, 50, N)
pts[:, 2] = rng.normal(-1.8, 0.05, N)
# object clusters: 600 points each
for i, box in enumerate(gt):
    sl = slice(i * 600, (i + 1) * 600)
    local = rng.uniform(-0.5, 0.5, (600, 3)) * box[3:6]
    c, s = np.cos(box[8]), np.sin(box[8])
    pts[sl, 0] = box[0] + local[:, 0] * c - local[:, 1] * s
    pts[sl, 1] = box[1] + local[:, 0] * s + local[:, 1] * c
    pts[sl, 2] = box[2] + local[:, 2]
pts[:, 3] = rng.uniform(0, 1, N)

pl = cfg["data"]["train_dataset"]["prepare_label"]["centermap"]
assigner = AssignLabel(
    tasks=pl["tasks"], gaussian_overlap=pl["gaussian_overlap"], max_objs=500,
    min_radius=pl["min_radius"], pc_range=cfg["model"]["reader"]["pc_range"],
    voxel_size=cfg["model"]["reader"]["voxel_size"],
    out_size_factor=pl["out_size_factor"],
)
res = assigner({"token": "t", "points": pts,
                "annotations": {"gt_boxes": gt, "gt_names": names}})
del res["annotations"]
batch = collate([res], max_points=N)
example = jax.tree.map(jnp.asarray, {k: v for k, v in batch.items() if k != "token"})

mesh = mesh_lib.make_mesh(jax.devices()[:1])
tx, _ = ts_lib.make_optimizer(max_lr=1.5e-3, total_steps=STEPS, pct_start=0.2)
state = ts_lib.create_train_state(model, example, jax.random.PRNGKey(0), tx)
step = ts_lib.make_train_step(model, tx, mesh)

t0 = time.perf_counter()
losses = []
for i in range(STEPS):
    state, (scalars, _) = step(state, example)
    if i % 5 == 0 or i == STEPS - 1:
        losses.append(float(scalars["loss"]))
        print(f"step {i}: loss {losses[-1]:.3f}", flush=True)
print(f"{STEPS} steps in {time.perf_counter() - t0:.0f}s")
assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

# --- predict with the overfit weights.
# NOTE: single-batch overfitting is the worst case for BatchNorm eval mode
# (the net freely exploits batch statistics; running averages lag) — torch
# behaves identically.  The end-to-end check therefore decodes from
# train-mode features; real multi-epoch training converges the running
# stats and uses the standard eval path (tools/test.py).
variables = {"params": state.params, "batch_stats": state.batch_stats}

@jax.jit
def predict_train_mode(v, e):
    preds, _ = model.apply(
        v, e["points"], e["points_mask"], train=True, mutable=["batch_stats"]
    )
    return model.head.predict(preds, model.post_processing)

dets = predict_train_mode(
    variables, {"points": example["points"], "points_mask": example["points_mask"]}
)
valid = np.asarray(dets["valid"][0])
boxes = np.asarray(dets["box3d_lidar"][0])[valid]
scores = np.asarray(dets["scores"][0])[valid]
labels = np.asarray(dets["label_preds"][0])[valid]
print(f"detections: {valid.sum()} (cars={(labels == 0).sum()}, peds={(labels == 9).sum()})")

order = np.argsort(-scores)
top = boxes[order[:10]]
print("top-10 dets (x, y, score, label):")
for k, i in enumerate(order[:10]):
    b = boxes[i]
    print(f"  {b[0]:7.2f} {b[1]:7.2f}  s={scores[i]:.3f} l={labels[i]}")
print("gt (x, y, cls):")
for g, n in zip(gt, names):
    print(f"  {g[0]:7.2f} {g[1]:7.2f}  {n}")
def _hits(arr):
    if len(arr) == 0:
        return 0
    return sum(float(np.linalg.norm(arr[:, :2] - g[:2], axis=1).min()) < 2.0 for g in gt)

hits_top = _hits(top)
hits_all = _hits(boxes)
print(f"recovered within 2m: top-10 {hits_top}/10, all dets {hits_all}/10")
assert hits_all >= 8, hits_all
print("OVERFIT SANITY PASS")
