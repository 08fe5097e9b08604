"""Waymo data-layer tests over a synthetic on-disk tree (reference waymo.py
semantics: NLZ filtering, pose-relative sweep transforms, num_points mask,
eval export)."""

import pickle

import numpy as np

from pillarnext_tpu.data.datasets import WaymoDataset
from pillarnext_tpu.data.waymo_eval import export_detections, label_to_type


def make_mini_waymo(root, n_frames=3, n_points=500, seed=0):
    rng = np.random.default_rng(seed)
    (root / "lidar_point").mkdir(parents=True, exist_ok=True)
    infos = []
    poses = []
    for i in range(n_frames):
        token = f"ctx-{1000 + i}"
        pts = np.zeros((n_points, 6), np.float32)
        pts[:, :2] = rng.uniform(-30, 30, (n_points, 2))
        pts[:, 2] = rng.uniform(-1, 3, n_points)
        pts[:, 3] = rng.uniform(0, 1, n_points)           # intensity
        pts[:, 4] = rng.uniform(0, 1, n_points)           # elongation
        pts[:, 5] = -1.0                                   # outside NLZ
        pts[n_points // 2 :, 5] = 1.0                      # half inside NLZ
        pts.tofile(root / "lidar_point" / f"{token}.bin")

        pose = np.eye(4)
        pose[0, 3] = i * 2.0  # ego moves +x 2m per frame
        poses.append(pose)

        objects = [
            {
                "id": f"obj{i}",
                "label": "vehicle",
                "box": np.array([5, 0, 1, 4, 2, 1.5, 1, 0, 0.2], np.float32),
                "num_points": 25,
            },
            {
                "id": f"empty{i}",
                "label": "pedestrian",
                "box": np.array([-5, 2, 1, 1, 1, 1.7, 0, 0, 0.0], np.float32),
                "num_points": 0,  # must be filtered (waymo.py:71-76)
            },
        ]
        sweeps = []
        for j in range(i):
            sweeps.append(
                {"token": f"ctx-{1000 + j}", "pose": poses[j], "timestamp": 0.1 * (i - j)}
            )
        infos.append(
            {"token": token, "pose": pose, "timestamp": float(i) * 0.1,
             "objects": objects, "sweeps": sweeps[::-1]}
        )
    with open(root / "waymo_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    return infos


class TestWaymoDataset:
    def test_nlz_filter_and_feature_layout(self, tmp_path):
        make_mini_waymo(tmp_path)
        ds = WaymoDataset(
            info_path="waymo_infos_train.pkl",
            root_path=str(tmp_path),
            nsweeps=1,
            loading_pipelines=["load_pointcloud", "load_box3d"],
            create_database=True,
            use_gt_sampling=False,
        )
        s = ds[0]
        # only NLZ==-1 points survive; columns are [x, y, z, intensity, t]
        assert s["points"].shape == (250, 5)
        assert (s["points"][:, 4] == 0).all()  # current frame timestamp 0
        # zero-point GT filtered
        assert len(s["annotations"]["gt_names"]) == 1
        assert s["annotations"]["gt_names"][0] == "vehicle"

    def test_sweep_pose_compensation(self, tmp_path):
        make_mini_waymo(tmp_path / "w2")
        ds = WaymoDataset(
            info_path="waymo_infos_train.pkl",
            root_path=str(tmp_path / "w2"),
            nsweeps=3,
            drop_frames=0,
            loading_pipelines=["load_pointcloud"],
            use_gt_sampling=False,
        )
        s = ds[2]  # frame 2 has sweeps 1 and 0
        pts = s["points"]
        assert pts.shape[0] == 3 * 250
        # sweep j's points must be shifted by the relative ego motion
        # rel = inv(pose2) @ pose1 -> x shift of -2 per frame gap
        cur = pts[:250]
        prev1 = pts[250:500]
        # prev1 raw x equals cur raw x distribution shifted by -2
        assert np.isclose(np.median(prev1[:, 0]) - np.median(cur[:, 0]), -2.0, atol=0.5)
        assert (prev1[:, 4] > 0).all()  # timestamp channel carries the lag

    def test_eval_export_npz_fallback(self, tmp_path):
        dets = {
            "ctx-1000": {
                "box3d_lidar": np.array([[1, 2, 3, 4, 2, 1.5, 0.5, 0.1, 0.3]], np.float32),
                "scores": np.array([0.9], np.float32),
                "label_preds": np.array([0]),
            }
        }
        out = export_detections(dets, tmp_path / "res")
        assert "waymo" in out
        produced = list((tmp_path / "res").iterdir())
        names = {p.name for p in produced}
        assert "waymo_preds.bin" in names or "waymo_preds.npz" in names

    def test_label_to_type(self):
        assert label_to_type(0) == 1  # vehicle
        assert label_to_type(1) == 2  # pedestrian
        assert label_to_type(2) == 4  # cyclist
