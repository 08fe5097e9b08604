#!/usr/bin/env python
"""GT-database builder for copy-paste augmentation.

Capability parity with the reference tools/create_gt_database.py:9-149:
iterate the train dataset with ``create_database=True`` (raw annotations kept,
no augmentation/GT-paste), crop the points inside each GT box with the native
point-in-rotated-box kernel, recenter them to the box origin, write one
``.bin`` per object plus a ``dbinfos_*.pkl`` index.  Waymo class subsampling
(keep 1/4 vehicles, 1/2 pedestrians) matches :73-83.

    python tools/create_gt_database.py nuscenes --root-path /data/nuscenes \
        [--nsweeps 10] [--info-path infos_train_10sweeps_withvelo_filterZero.pkl]
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np

from pillarnext_tpu.core import box_ops


def create_groundtruth_database(
    dataset_type: str,
    root_path: str,
    info_path: str,
    nsweeps: int = 1,
    db_path: str | None = None,
    dbinfo_path: str | None = None,
):
    from pillarnext_tpu.data.datasets import NuScenesDataset, WaymoDataset

    root = Path(root_path)
    if db_path is None:
        db_path = root / f"gt_database_{nsweeps}sweeps_withvelo"
    if dbinfo_path is None:
        dbinfo_path = root / f"dbinfos_train_{nsweeps}sweeps_withvelo.pkl"
    db_path = Path(db_path)
    db_path.mkdir(parents=True, exist_ok=True)

    if dataset_type == "nuscenes":
        dataset = NuScenesDataset(
            info_path=info_path,
            root_path=root_path,
            nsweeps=nsweeps,
            loading_pipelines=["load_pointcloud", "load_box3d"],
            create_database=True,
            use_gt_sampling=False,
        )
    elif dataset_type == "waymo":
        dataset = WaymoDataset(
            info_path=info_path,
            root_path=root_path,
            nsweeps=nsweeps,
            loading_pipelines=["load_pointcloud", "load_box3d"],
            create_database=True,
            use_gt_sampling=False,
        )
    else:
        raise ValueError(dataset_type)

    db_infos: dict[str, list] = {}
    rng = np.random.default_rng(0)
    for index in range(len(dataset)):
        sample = dataset[index]
        points = sample["points"]
        ann = sample["annotations"]
        boxes = np.asarray(ann["gt_boxes"], np.float64)
        names = np.asarray(ann["gt_names"])
        if boxes.shape[0] == 0:
            continue

        inside = box_ops.points_in_rbbox(points, boxes)
        for i in range(boxes.shape[0]):
            name = str(names[i])
            # Waymo class subsampling (create_gt_database.py:73-83)
            if dataset_type == "waymo":
                if name == "vehicle" and rng.uniform() > 0.25:
                    continue
                if name == "pedestrian" and rng.uniform() > 0.5:
                    continue

            crop = points[inside[:, i]].copy()
            crop[:, :3] -= boxes[i, :3]  # recenter (:105)
            filename = f"{index}_{name}_{i}.bin"
            crop.astype(np.float32).tofile(db_path / filename)

            db_infos.setdefault(name, []).append(
                {
                    "name": name,
                    "path": str(Path(db_path.name) / filename),
                    "image_idx": index,
                    "gt_idx": i,
                    "box3d_lidar": boxes[i].astype(np.float32),
                    "num_points_in_gt": int(crop.shape[0]),
                    "difficulty": 0,
                }
            )
        if index % 500 == 0:
            print(f"{index}/{len(dataset)}", flush=True)

    for k, v in db_infos.items():
        print(f"{k}: {len(v)} crops")
    with open(dbinfo_path, "wb") as f:
        pickle.dump(db_infos, f)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", choices=["nuscenes", "waymo"])
    parser.add_argument("--root-path", required=True)
    parser.add_argument("--info-path", required=True)
    parser.add_argument("--nsweeps", type=int, default=1)
    args = parser.parse_args()
    create_groundtruth_database(
        args.dataset, args.root_path, args.info_path, args.nsweeps
    )


if __name__ == "__main__":
    main()
