"""Data-layer tests over a synthetic on-disk mini-dataset."""

import pickle

import numpy as np
import pytest

from pillarnext_tpu.data.assign import AssignLabel
from pillarnext_tpu.data.augmentation import Flip, Rotation, Scaling, Translation
from pillarnext_tpu.data.datasets import NuScenesDataset
from pillarnext_tpu.data.loader import DataLoader
from pillarnext_tpu.data.sampler import DataBaseSampler, DBFilterByMinNumPoint
from pillarnext_tpu.data import nuscenes_eval

TASKS = [["car"], ["pedestrian"]]


def make_mini_nuscenes(root, n_samples=6, n_points=800, seed=0):
    """Synthetic nuScenes-format tree: .bin sweeps, infos pickle, GT db."""
    rng = np.random.default_rng(seed)
    root.mkdir(parents=True, exist_ok=True)
    (root / "samples").mkdir(exist_ok=True)
    infos = []
    for i in range(n_samples):
        pts = np.zeros((n_points, 5), np.float32)
        pts[:, :2] = rng.uniform(-20, 20, (n_points, 2))
        pts[:, 2] = rng.uniform(-2, 1, n_points)
        pts[:, 3] = rng.uniform(0, 255, n_points)
        path = f"samples/lidar_{i}.bin"
        pts.tofile(root / path)

        n_boxes = 3
        boxes = np.zeros((n_boxes, 9), np.float64)
        boxes[:, :2] = rng.uniform(-15, 15, (n_boxes, 2))
        boxes[:, 2] = rng.uniform(-1, 0.5, n_boxes)
        boxes[:, 3:6] = rng.uniform(1, 4, (n_boxes, 3))
        boxes[:, 6:8] = rng.uniform(-2, 2, (n_boxes, 2))
        boxes[:, 8] = rng.uniform(-np.pi, np.pi, n_boxes)
        names = np.array(["car", "pedestrian", "car"])

        # one prior sweep with identity transform
        sweep_path = f"samples/sweep_{i}.bin"
        pts2 = pts.copy()
        pts2[:, :2] += 0.05
        pts2.tofile(root / sweep_path)

        infos.append(
            {
                "lidar_path": path,
                "token": f"token_{i}",
                "sweeps": [
                    {
                        "lidar_path": sweep_path,
                        "transform_matrix": np.eye(4),
                        "time_lag": 0.05,
                    }
                ],
                "ref_from_car": np.eye(4),
                "car_from_global": np.eye(4),
                "timestamp": float(i),
                "gt_boxes": boxes,
                "gt_names": names,
            }
        )
    with open(root / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    # GT database: a few crops per class
    (root / "gtdb").mkdir(exist_ok=True)
    db_infos = {"car": [], "pedestrian": []}
    for name, count in (("car", 8), ("pedestrian", 8)):
        for j in range(count):
            crop = rng.uniform(-1, 1, (30, 5)).astype(np.float32)
            p = f"gtdb/{name}_{j}.bin"
            crop.tofile(root / p)
            box = np.zeros(9, np.float32)
            box[:2] = rng.uniform(-18, 18, 2)
            box[3:6] = [3.0, 1.5, 1.5]
            box[8] = rng.uniform(-np.pi, np.pi)
            db_infos[name].append(
                {
                    "name": name,
                    "path": p,
                    "box3d_lidar": box,
                    "num_points_in_gt": 30,
                    "difficulty": 0,
                }
            )
    with open(root / "dbinfos.pkl", "wb") as f:
        pickle.dump(db_infos, f)
    return infos


def make_dataset(root, use_gt_sampling=True):
    import functools

    sampler = functools.partial(
        DataBaseSampler,
        root_path=str(root),
        dbinfo_path="dbinfos.pkl",
        groups=[{"car": 4, "pedestrian": 4}],
        db_prepor={"filter": DBFilterByMinNumPoint({"car": 5, "pedestrian": 5})},
        rate=1.0,
        gt_drop_percentage=0,
        gt_drop_max_keep_points=-1,
        point_dim=5,
    )
    assigner = AssignLabel(
        tasks=TASKS,
        gaussian_overlap=0.1,
        max_objs=20,
        min_radius=2,
        pc_range=[-25.6, -25.6, -5, 25.6, 25.6, 3],
        voxel_size=[0.2, 0.2, 8],
        out_size_factor=[4, 4],
    )
    return NuScenesDataset(
        info_path="infos.pkl",
        root_path=str(root),
        nsweeps=2,
        sampler=sampler,
        loading_pipelines=["load_pointcloud", "load_box3d"],
        augmentation={
            "rotation": Rotation([-0.785, 0.785]),
            "scaling": Scaling([0.9, 1.1]),
            "translation": Translation(0.5),
            "flip": Flip([0.5, 0.5]),
        },
        prepare_label={"centermap": assigner},
        class_names=TASKS,
        use_gt_sampling=use_gt_sampling,
    )


class TestDatasetPipeline:
    def test_full_sample_pipeline(self, tmp_path):
        make_mini_nuscenes(tmp_path / "nusc")
        ds = make_dataset(tmp_path / "nusc")
        np.random.seed(0)
        sample = ds[0]
        assert "points" in sample and sample["points"].shape[1] == 5
        # 2 sweeps concatenated + pasted crops
        assert sample["points"].shape[0] > 800
        assert len(sample["hm"]) == 2  # one per task group
        assert sample["hm"][0].shape == (64, 64, 1)
        assert sample["mask"][0].sum() > 0  # GT paste added cars
        # raw annotations dropped in training mode
        assert "annotations" not in sample

    def test_gt_paste_respects_collisions(self, tmp_path):
        make_mini_nuscenes(tmp_path / "n2")
        ds = make_dataset(tmp_path / "n2")
        np.random.seed(1)
        # sampled boxes must not collide with each other (BEV)
        from pillarnext_tpu.core import box_ops

        s = ds.sampler.sample_all(
            np.zeros((0, 9), np.float32), np.array([], dtype="<U10")
        )
        assert s is not None
        corners = box_ops.center_to_corner_box2d(s["gt_boxes"][:, [0, 1, 3, 4, 8]])
        coll = box_ops.box_collision_test(corners, corners)
        np.fill_diagonal(coll, False)
        assert not coll.any()

    def test_use_gt_sampling_false(self, tmp_path):
        make_mini_nuscenes(tmp_path / "n3")
        ds = make_dataset(tmp_path / "n3", use_gt_sampling=False)
        assert ds.sampler is None  # faded-strategy switch (base.py:36-39)

    def test_cbgs_resampling_changes_length(self, tmp_path):
        make_mini_nuscenes(tmp_path / "n4")
        ds = make_dataset(tmp_path / "n4")
        n0 = len(ds)
        np.random.seed(0)
        ds.cbgs()
        assert len(ds) > 0 and len(ds) != 0
        # every class still present
        names = set()
        for info in ds.infos:
            names.update(info["gt_names"])
        assert {"car", "pedestrian"} <= names

    def test_cbgs_is_deterministic_across_processes(self, tmp_path):
        """Two independently constructed datasets (as on two hosts) must
        resample to the IDENTICAL infos sequence, or the per-host loader
        shards silently diverge (multi-host contract, data/loader.py)."""
        make_mini_nuscenes(tmp_path / "n4d")
        ds_a = make_dataset(tmp_path / "n4d")
        ds_b = make_dataset(tmp_path / "n4d")
        # simulate different ambient RNG state per process
        np.random.seed(1)
        ds_a.cbgs()
        np.random.seed(999)
        ds_b.cbgs()
        assert [i["token"] for i in ds_a.infos] == [i["token"] for i in ds_b.infos]


class TestLoader:
    def test_shard_partition_and_determinism(self, tmp_path):
        make_mini_nuscenes(tmp_path / "n5", n_samples=8)
        ds = make_dataset(tmp_path / "n5", use_gt_sampling=False)
        loaders = [
            DataLoader(ds, batch_size=2, max_points=2000, shuffle=True, seed=7,
                       num_shards=2, shard_index=i)
            for i in range(2)
        ]
        for ld in loaders:
            ld.set_epoch(3)
        idx0 = np.concatenate(list(loaders[0]._make_batches()))
        idx1 = np.concatenate(list(loaders[1]._make_batches()))
        assert len(np.intersect1d(idx0, idx1)) == 0  # disjoint shards
        # deterministic per epoch
        idx0b = np.concatenate(list(loaders[0]._make_batches()))
        np.testing.assert_array_equal(idx0, idx0b)
        loaders[0].set_epoch(4)
        idx0c = np.concatenate(list(loaders[0]._make_batches()))
        assert not np.array_equal(idx0, idx0c)

    def test_multiprocess_workers_match_inline(self, tmp_path):
        """Forked workers must yield the same ordered batch stream as the
        inline path (per-batch (seed, epoch, index) RNG derivation), and a
        rerun must be identical (prefetch does not reorder)."""
        make_mini_nuscenes(tmp_path / "n7", n_samples=8)
        # no GT-paste: its BatchSampler cursor is per-process state, so the
        # stream there is only deterministic per worker count (like torch)
        ds = make_dataset(tmp_path / "n7", use_gt_sampling=False)
        inline = DataLoader(ds, batch_size=2, max_points=2000, shuffle=True, seed=3)
        mp2 = DataLoader(
            ds, batch_size=2, max_points=2000, shuffle=True, seed=3, num_workers=2
        )
        ref = list(inline)
        got = list(mp2)
        rerun = list(mp2)
        assert len(ref) == len(got) == len(rerun) == 4
        for a, b in zip(got, rerun):
            np.testing.assert_array_equal(a["points"], b["points"])
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a["points"], b["points"])
            for t in range(len(a["hm"])):
                np.testing.assert_array_equal(a["hm"][t], b["hm"][t])

    def test_multiprocess_gt_paste_deterministic(self, tmp_path):
        """With GT-paste, the mp stream must still be reproducible run-to-run
        for a fixed worker count."""
        make_mini_nuscenes(tmp_path / "n7b", n_samples=8)
        ds = make_dataset(tmp_path / "n7b")
        mk = lambda: DataLoader(
            ds, batch_size=2, max_points=2000, shuffle=True, seed=5, num_workers=2
        )
        a, b = list(mk()), list(mk())
        assert len(a) == len(b) == 4
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["points"], y["points"])

    def test_worker_exception_propagates(self, tmp_path):
        make_mini_nuscenes(tmp_path / "n8", n_samples=4)
        ds = make_dataset(tmp_path / "n8", use_gt_sampling=False)

        class Boom:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                if i == 2:
                    raise ValueError("boom")
                return ds[i]

        loader = DataLoader(
            Boom(), batch_size=1, max_points=500, shuffle=False, num_workers=2
        )
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)

    def test_batches_are_static_shape(self, tmp_path):
        make_mini_nuscenes(tmp_path / "n6", n_samples=4)
        ds = make_dataset(tmp_path / "n6", use_gt_sampling=False)
        np.random.seed(0)
        loader = DataLoader(ds, batch_size=2, max_points=2000, shuffle=False)
        shapes = {tuple(b["points"].shape) for b in loader}
        assert shapes == {(2, 2000, 5)}


class TestNuscenesEvalProtocol:
    def _gt_and_perfect_dets(self, n=10, seed=0):
        rng = np.random.default_rng(seed)
        gt_by_token, dets = {}, {}
        for i in range(3):
            boxes = np.zeros((n, 9))
            boxes[:, :2] = rng.uniform(-30, 30, (n, 2))
            boxes[:, 2] = rng.uniform(-1, 1, n)
            boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
            boxes[:, 6:8] = rng.uniform(-3, 3, (n, 2))
            boxes[:, 8] = rng.uniform(-np.pi, np.pi, n)
            names = np.array(["car"] * (n // 2) + ["pedestrian"] * (n - n // 2))
            gt_by_token[f"t{i}"] = {"gt_boxes": boxes, "gt_names": names}
            labels = np.array([0] * (n // 2) + [1] * (n - n // 2))
            dets[f"t{i}"] = {
                "box3d_lidar": boxes.copy(),
                "scores": rng.uniform(0.5, 1.0, n),
                "label_preds": labels,
            }
        return gt_by_token, dets

    def test_perfect_predictions_score_one(self):
        gt, dets = self._gt_and_perfect_dets()
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car", "pedestrian"])
        assert m["mean_ap"] == pytest.approx(1.0, abs=1e-6)
        assert m["tp_errors"]["trans_err"] == pytest.approx(0.0, abs=1e-9)
        assert m["nd_score"] > 0.85

    def test_attribute_error_scored_from_infos(self):
        """With gt_attributes carried in the infos, AttrErr is real: correct
        velocity-rule attributes -> 0, wrong -> 1, absent -> 1.0 prior."""
        from pillarnext_tpu.data.nuscenes_eval import _attr_for

        gt, dets = self._gt_and_perfect_dets()
        # perfect: GT attribute equals what the velocity rules predict
        for token in gt:
            names, boxes = gt[token]["gt_names"], gt[token]["gt_boxes"]
            gt[token]["gt_attributes"] = np.array(
                [_attr_for(n, b[6:8]) for n, b in zip(names, boxes)]
            )
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car", "pedestrian"])
        assert m["tp_errors"]["attr_err"] == pytest.approx(0.0, abs=1e-9)

        # adversarial: every GT attribute contradicts the velocity rules
        wrong = {"car": "vehicle.parked", "pedestrian": "pedestrian.moving"}
        for token in gt:
            names, boxes = gt[token]["gt_names"], gt[token]["gt_boxes"]
            gt[token]["gt_attributes"] = np.array(
                [
                    wrong[n]
                    if wrong[n] != _attr_for(n, b[6:8])
                    else "pedestrian.sitting_down"
                    for n, b in zip(names, boxes)
                ]
            )
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car", "pedestrian"])
        assert m["tp_errors"]["attr_err"] == pytest.approx(1.0, abs=1e-9)

        # absent: falls back to the 1.0 worst-case prior (pre-round-2 infos)
        for token in gt:
            del gt[token]["gt_attributes"]
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car", "pedestrian"])
        assert m["tp_errors"]["attr_err"] == 1.0

    def test_eval_gather_count_mismatch_raises(self, tmp_path):
        make_mini_nuscenes(tmp_path / "n9", n_samples=3)
        ds = make_dataset(tmp_path / "n9", use_gt_sampling=False)
        info = ds.infos[0]
        dets = {
            info["token"]: {
                "box3d_lidar": np.asarray(info["gt_boxes"], np.float32),
                "scores": np.ones(len(info["gt_boxes"])),
                "label_preds": np.zeros(len(info["gt_boxes"]), np.int64),
            }
        }
        with pytest.raises(AssertionError, match="eval gather"):
            ds.evaluation(dets, tmp_path / "out9")

    def test_shifted_predictions_score_lower(self):
        gt, dets = self._gt_and_perfect_dets()
        for d in dets.values():
            d["box3d_lidar"] = d["box3d_lidar"].copy()
            d["box3d_lidar"][:, 0] += 1.5  # > 0.5/1.0 thresholds, < 2/4
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car", "pedestrian"])
        aps = m["label_aps"]["car"]
        assert aps["0.5"] == pytest.approx(0.0, abs=1e-6)
        assert aps["4.0"] == pytest.approx(1.0, abs=1e-6)
        assert 0 < m["mean_ap"] < 1
        assert m["tp_errors"]["trans_err"] == pytest.approx(1.5, abs=1e-6)

    def test_missing_detections_reduce_recall(self):
        gt, dets = self._gt_and_perfect_dets()
        for d in dets.values():
            for k in ("box3d_lidar", "scores", "label_preds"):
                d[k] = d[k][:5]  # drop half (all pedestrians for car split)
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car", "pedestrian"])
        assert m["label_aps"]["pedestrian"]["2.0"] == pytest.approx(0.0, abs=1e-6)
        assert m["label_aps"]["car"]["2.0"] == pytest.approx(1.0, abs=1e-2)

    def test_submission_json_roundtrip(self, tmp_path):
        make_mini_nuscenes(tmp_path / "n7", n_samples=2)
        ds = make_dataset(tmp_path / "n7", use_gt_sampling=False)
        dets = {}
        for info in ds.infos:
            dets[info["token"]] = {
                "box3d_lidar": np.asarray(info["gt_boxes"], np.float32),
                "scores": np.linspace(0.9, 0.5, len(info["gt_boxes"])),
                "label_preds": np.array(
                    [0 if n == "car" else 1 for n in info["gt_names"]]
                ),
            }
        result = ds.evaluation(dets, tmp_path / "out")
        assert (tmp_path / "out" / "results_nusc.json").exists()
        assert result["mean_ap"] == pytest.approx(1.0, abs=1e-6)

        import json

        sub = json.loads((tmp_path / "out" / "results_nusc.json").read_text())
        anno = next(iter(sub["results"].values()))[0]
        assert set(anno) == {
            "sample_token", "translation", "size", "rotation", "velocity",
            "detection_name", "detection_score", "attribute_name",
        }
