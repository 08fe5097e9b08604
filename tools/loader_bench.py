#!/usr/bin/env python
"""Host data-pipeline throughput benchmark.

Generates a synthetic nuScenes-format tree at REALISTIC per-sample cost
(10 sweeps x ~25k points, GT-paste database, full augmentation + flagship
1344^2 target assignment), then measures sustained loader batches/s and
frames/s across worker counts.

The pass criterion (VERDICT round 1, item 6): loader frames/s with workers
must exceed the chip's training rate so a pod stays fed
(reference: 16 torch workers/GPU, configs/dataloader/default.yaml:4).

Usage: python tools/loader_bench.py [n_samples] [workers ...]
"""

from __future__ import annotations

import functools
import pickle
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pillarnext_tpu.data.assign import AssignLabel
from pillarnext_tpu.data.augmentation import Flip, Rotation, Scaling, Translation
from pillarnext_tpu.data.datasets import NuScenesDataset
from pillarnext_tpu.data.loader import DataLoader
from pillarnext_tpu.data.sampler import DataBaseSampler, DBFilterByMinNumPoint

TASKS = [
    ["car"],
    ["truck", "construction_vehicle"],
    ["bus", "trailer"],
    ["barrier"],
    ["motorcycle", "bicycle"],
    ["pedestrian", "traffic_cone"],
]
CLASSES = [c for t in TASKS for c in t]
PC_RANGE = [-50.4, -50.4, -5.0, 50.4, 50.4, 3.0]
VOXEL = [0.075, 0.075, 8.0]


def make_synthetic_nusc(root: Path, n_samples: int, pts_per_sweep=25_000, seed=0):
    rng = np.random.default_rng(seed)
    (root / "samples").mkdir(parents=True, exist_ok=True)
    (root / "gtdb").mkdir(exist_ok=True)

    def scan(n):
        p = np.zeros((n, 5), np.float32)
        r = np.minimum(np.abs(rng.gamma(2.0, 9.0, n)), 50.0)
        th = rng.uniform(-np.pi, np.pi, n)
        p[:, 0], p[:, 1] = r * np.cos(th), r * np.sin(th)
        p[:, 2] = rng.normal(-1.2, 0.8, n)
        p[:, 3] = rng.uniform(0, 255, n)
        return p

    infos = []
    for i in range(n_samples):
        path = f"samples/lidar_{i}.bin"
        scan(pts_per_sweep).tofile(root / path)
        sweeps = []
        for s in range(9):
            sp = f"samples/sweep_{i}_{s}.bin"
            scan(pts_per_sweep).tofile(root / sp)
            tm = np.eye(4)
            tm[:2, 3] = rng.normal(0, 0.3, 2)
            sweeps.append(
                {"lidar_path": sp, "transform_matrix": tm, "time_lag": 0.05 * (s + 1)}
            )
        nb = 40
        boxes = np.zeros((nb, 9))
        boxes[:, :2] = rng.uniform(-45, 45, (nb, 2))
        boxes[:, 2] = rng.uniform(-1.5, 0.5, nb)
        boxes[:, 3:6] = rng.uniform(0.5, 6.0, (nb, 3))
        boxes[:, 6:8] = rng.uniform(-3, 3, (nb, 2))
        boxes[:, 8] = rng.uniform(-np.pi, np.pi, nb)
        infos.append(
            {
                "lidar_path": path,
                "token": f"token_{i}",
                "sweeps": sweeps,
                "timestamp": float(i),
                "gt_boxes": boxes,
                "gt_names": rng.choice(CLASSES, nb),
            }
        )
    with open(root / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    db = {c: [] for c in CLASSES}
    for c in CLASSES:
        for j in range(32):
            crop = (rng.normal(0, 0.8, (200, 5))).astype(np.float32)
            p = f"gtdb/{c}_{j}.bin"
            crop.tofile(root / p)
            box = np.zeros(9, np.float32)
            box[:2] = rng.uniform(-40, 40, 2)
            box[3:6] = rng.uniform(0.5, 5.0, 3)
            box[8] = rng.uniform(-np.pi, np.pi)
            db[c].append(
                {
                    "name": c,
                    "path": p,
                    "box3d_lidar": box,
                    "num_points_in_gt": 200,
                    "difficulty": 0,
                }
            )
    with open(root / "dbinfos.pkl", "wb") as f:
        pickle.dump(db, f)


def make_dataset(root: Path) -> NuScenesDataset:
    sampler = functools.partial(
        DataBaseSampler,
        root_path=str(root),
        dbinfo_path="dbinfos.pkl",
        groups=[
            {"car": 2},
            {"truck": 3, "construction_vehicle": 7},
            {"bus": 4, "trailer": 6},
            {"barrier": 2},
            {"motorcycle": 6, "bicycle": 6},
            {"pedestrian": 2, "traffic_cone": 2},
        ],
        db_prepor={"filter": DBFilterByMinNumPoint({c: 5 for c in CLASSES})},
        rate=1.0,
        gt_drop_percentage=0.0,
        gt_drop_max_keep_points=-1,
        point_dim=5,
    )
    assigner = AssignLabel(
        tasks=TASKS,
        gaussian_overlap=0.1,
        max_objs=500,
        min_radius=2,
        pc_range=PC_RANGE,
        voxel_size=VOXEL,
        out_size_factor=[4] * len(TASKS),
    )
    return NuScenesDataset(
        info_path="infos.pkl",
        root_path=str(root),
        nsweeps=10,
        class_names=TASKS,
        resampling=False,
        use_gt_sampling=True,
        sampler=sampler,
        loading_pipelines=["load_pointcloud", "load_box3d"],
        augmentation={
            "rotation": Rotation([-0.785, 0.785]),
            "scaling": Scaling([0.9, 1.1]),
            "translation": Translation(0.5),
            "flip": Flip([0.5, 0.5]),
        },
        prepare_label={"centermap": assigner},
    )


def main():
    nums = [int(a) for a in sys.argv[1:]]
    n_samples = nums[0] if nums else 32
    worker_counts = nums[1:] or [0, 2, 4, 8]
    batch_size = 4
    max_points = 200_000

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        t0 = time.perf_counter()
        make_synthetic_nusc(root, n_samples)
        print(f"synthetic tree ({n_samples} samples, 10x25k pts): "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        ds = make_dataset(root)

        for w in worker_counts:
            loader = DataLoader(
                ds, batch_size=batch_size, max_points=max_points,
                shuffle=True, seed=0, num_workers=w,
            )
            # warm one batch (forks, page cache), then time the epoch
            it = iter(loader)
            next(it)
            t0 = time.perf_counter()
            n = 0
            for _ in it:
                n += 1
            dt = time.perf_counter() - t0
            fps = n * batch_size / dt
            print(
                f"workers={w}: {n} batches in {dt:5.1f}s -> "
                f"{n / dt:5.2f} batches/s, {fps:6.2f} frames/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
