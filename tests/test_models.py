"""Model-layer tests on a tiny BEV grid (fast CPU compiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pillarnext_tpu.data.assign import AssignLabel
from pillarnext_tpu.data.collate import collate
from pillarnext_tpu.models import (
    ASPPNeck,
    CenterHead,
    PillarFeatureNet,
    SingleStageDetector,
    SparseResNet,
)
from pillarnext_tpu.ops import scatter
from pillarnext_tpu.ops.voxelize import VoxelGrid, pillar_coords, pillar_segment_ids

PC_RANGE = [-3.2, -3.2, -3.0, 3.2, 3.2, 3.0]
VOXEL = [0.1, 0.1, 6.0]
TASKS = [["car"], ["pedestrian", "cyclist"]]
TEST_CFG = {
    "post_center_limit_range": [-4.0, -4.0, -5.0, 4.0, 4.0, 5.0],
    "nms": {
        "nms_pre_max_size": 64,
        "nms_post_max_size": 16,
        "nms_iou_threshold": [[0.2], [0.25, 0.25]],
    },
    "score_threshold": 0.1,
    "pc_range": PC_RANGE,
    "voxel_size": VOXEL,
    "out_size_factor": [4, 4],
    "nms_type": "iou3d",
}


def tiny_detector(with_iou=False):
    common = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2), "vel": (2, 2)}
    if with_iou:
        common["iou"] = (1, 2)
    return SingleStageDetector(
        reader=PillarFeatureNet(
            num_input_features=5, num_filters=(16, 16), voxel_size=VOXEL, pc_range=PC_RANGE
        ),
        backbone=SparseResNet(
            layer_nums=(1, 1, 1, 1),
            ds_layer_strides=(1, 2, 2, 2),
            ds_num_filters=(16, 16, 32, 32),
            num_input_features=16,
            out_channels=64,
        ),
        neck=ASPPNeck(in_channels=64),
        head=CenterHead(
            in_channels=64,
            tasks=TASKS,
            weight=0.25,
            code_weights=[1.0] * 8 + [0.2, 0.2],
            common_heads=common,
            strides=[2, 2],
            share_conv_channel=32,
            with_reg_iou=True,
            voxel_size=VOXEL,
            pc_range=PC_RANGE,
            out_size_factor=[4, 4],
            rectifier=[[0.5], [0.5, 0.5]],
        ),
        post_processing=TEST_CFG,
    )


def synthetic_batch(batch=2, n_points=512, n_boxes=4, seed=0):
    rng = np.random.default_rng(seed)
    samples = []
    assigner = AssignLabel(
        tasks=TASKS,
        gaussian_overlap=0.1,
        max_objs=10,
        min_radius=2,
        pc_range=PC_RANGE,
        voxel_size=VOXEL,
        out_size_factor=[4, 4],
    )
    names_all = ["car", "pedestrian", "cyclist"]
    for i in range(batch):
        boxes = np.zeros((n_boxes, 9), np.float32)
        boxes[:, :2] = rng.uniform(-2.5, 2.5, (n_boxes, 2))
        boxes[:, 2] = rng.uniform(-1, 1, n_boxes)
        boxes[:, 3:6] = rng.uniform(0.3, 1.2, (n_boxes, 3))
        boxes[:, 6:8] = rng.uniform(-1, 1, (n_boxes, 2))
        boxes[:, 8] = rng.uniform(-np.pi, np.pi, n_boxes)
        names = np.array([names_all[j % 3] for j in range(n_boxes)])
        pts = np.zeros((n_points, 5), np.float32)
        # half the points near boxes, half random
        for j in range(n_points):
            b = boxes[j % n_boxes]
            pts[j, :3] = b[:3] + rng.normal(0, 0.3, 3)
            pts[j, 3] = rng.uniform(0, 1)
        res = {
            "token": f"tok{i}",
            "points": pts,
            "annotations": {"gt_boxes": boxes, "gt_names": names},
        }
        res = assigner(res)
        del res["annotations"]
        samples.append(res)
    return collate(samples, max_points=600, rng=rng)


class TestVoxelize:
    def test_pillar_placement_golden(self):
        grid = VoxelGrid.create(VOXEL, PC_RANGE)
        assert (grid.size_x, grid.size_y) == (64, 64)
        pts = jnp.array(
            [
                [-3.2, -3.2, 0.0],   # min corner -> pillar (0, 0)
                [-3.15, -3.05, 0.0], # -> (0, 1)
                [3.19, 3.19, 0.0],   # max corner -> (63, 63)
                [3.3, 0.0, 0.0],     # out of range
            ]
        )
        valid = jnp.ones(4, bool)
        px, py, v = pillar_coords(grid, pts, valid)
        np.testing.assert_array_equal(np.asarray(v), [True, True, True, False])
        np.testing.assert_array_equal(np.asarray(px)[:3], [0, 0, 63])
        np.testing.assert_array_equal(np.asarray(py)[:3], [0, 1, 63])
        sid = pillar_segment_ids(grid, px, py, v)
        np.testing.assert_array_equal(np.asarray(sid), [0, 64, 63 * 64 + 63, 64 * 64])

    def test_segment_mean_max(self):
        ids = jnp.array([0, 0, 1, 2])
        data = jnp.array([[1.0], [3.0], [5.0], [-2.0]])
        mean = scatter.segment_mean(data, ids, 4)
        np.testing.assert_allclose(np.asarray(mean)[:3, 0], [2.0, 5.0, -2.0])
        assert float(mean[3, 0]) == 0.0  # empty segment
        mx = scatter.segment_max(data, ids, 4)
        np.testing.assert_allclose(np.asarray(mx)[:3, 0], [3.0, 5.0, -2.0])
        assert float(mx[3, 0]) == 0.0  # empty segment clamped to 0


class TestPillarFeatureNet:
    def test_output_shape_and_empty_pillars(self):
        net = PillarFeatureNet(
            num_input_features=5, num_filters=(16, 16), voxel_size=VOXEL, pc_range=PC_RANGE
        )
        pts = np.zeros((1, 32, 5), np.float32)
        pts[0, :, 0] = 1.05  # all points in one pillar: x=1.05 -> px=42
        pts[0, :, 1] = -2.05  # y -> py=11
        pts[0, :, 2] = np.linspace(-1, 1, 32)
        mask = np.ones((1, 32), bool)
        variables = net.init(jax.random.PRNGKey(0), jnp.array(pts), jnp.array(mask))
        out = net.apply(variables, jnp.array(pts), jnp.array(mask))
        assert out.shape == (1, 64, 64, 16)
        occupied = np.asarray((jnp.abs(out[0]).sum(-1) > 0))
        assert occupied.sum() == 1
        iy, ix = np.argwhere(occupied)[0]
        assert (ix, iy) == (42, 11)

    def test_masked_points_ignored(self):
        net = PillarFeatureNet(
            num_input_features=5, num_filters=(8, 8), voxel_size=VOXEL, pc_range=PC_RANGE
        )
        rng = np.random.default_rng(0)
        pts = rng.uniform(-3, 3, (1, 64, 5)).astype(np.float32)
        mask_full = np.ones((1, 64), bool)
        mask_half = mask_full.copy()
        mask_half[0, 32:] = False
        variables = net.init(jax.random.PRNGKey(0), jnp.array(pts), jnp.array(mask_full))
        out_half = net.apply(variables, jnp.array(pts), jnp.array(mask_half))
        # zero out the masked points' data -> same result
        pts2 = pts.copy()
        pts2[0, 32:] = 7.77  # garbage that must not leak
        out_half2 = net.apply(variables, jnp.array(pts2), jnp.array(mask_half))
        np.testing.assert_allclose(
            np.asarray(out_half), np.asarray(out_half2), atol=1e-6
        )


class TestDetectorForward:
    @pytest.fixture(scope="class")
    def model_and_batch(self):
        model = tiny_detector()
        batch = synthetic_batch()
        example = {k: v for k, v in batch.items() if k != "token"}
        example = jax.tree.map(jnp.asarray, example)
        variables = model.init(
            jax.random.PRNGKey(0), example["points"], example["points_mask"]
        )
        return model, variables, example

    def test_head_output_shapes(self, model_and_batch):
        model, variables, example = model_and_batch
        preds = model.apply(variables, example["points"], example["points_mask"])
        assert len(preds) == 2
        # backbone stride 8 on 64 grid -> 8; head deblock stride 2 -> 16
        assert preds[0]["hm"].shape == (2, 16, 16, 1)
        assert preds[1]["hm"].shape == (2, 16, 16, 2)
        assert preds[0]["reg"].shape == (2, 16, 16, 2)
        assert preds[0]["dim"].shape == (2, 16, 16, 3)

    def test_loss_finite_and_grads_flow(self, model_and_batch):
        model, variables, example = model_and_batch

        def loss_fn(params):
            (loss, logs), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                example,
                train=True,
                method=model.loss,
                mutable=["batch_stats"],
            )
            return loss, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        assert np.isfinite(float(loss))
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        # at least some gradient reaches the reader
        reader_norm = sum(
            float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["reader"])
        )
        assert reader_norm > 0
        assert "hm_loss" in logs[0] and "iou_reg_loss" in logs[0]

    def test_nan_velocity_targets_no_nan_grads(self, model_and_batch):
        model, variables, example = model_and_batch
        ex = dict(example)
        anno = [np.array(a) for a in ex["anno_box"]]
        anno[0][:, :, 6:8] = np.nan  # GT-paste crops carry NaN velocity
        ex["anno_box"] = [jnp.asarray(a) for a in anno]

        def loss_fn(params):
            (loss, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                ex,
                train=True,
                method=model.loss,
                mutable=["batch_stats"],
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        assert all(
            np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads)
        )

    def test_predict_fixed_size(self, model_and_batch):
        model, variables, example = model_and_batch
        dets = model.apply(variables, example, method=model.predict)
        # 1 class + 2 classes, post_max 16 -> 48 slots
        assert dets["box3d_lidar"].shape == (2, 48, 9)
        assert dets["scores"].shape == (2, 48)
        assert dets["label_preds"].shape == (2, 48)
        assert dets["valid"].shape == (2, 48)
        labels = np.asarray(dets["label_preds"])
        assert labels.min() >= 0 and labels.max() <= 2

    def test_predict_approx_topk_close_to_exact(self, model_and_batch):
        """post_processing.approx_topk swaps the per-lane candidate sort for
        approx_max_k; on small candidate sets the kept detections should be
        (near-)identical to the exact path."""
        model, variables, example = model_and_batch
        exact = model.apply(variables, example, method=model.predict)
        cfg = dict(model.post_processing)
        cfg["approx_topk"] = True
        approx_model = model.clone(post_processing=cfg)
        approx = approx_model.apply(variables, example, method=model.predict)
        ev, av = np.asarray(exact["valid"]), np.asarray(approx["valid"])
        assert ev.sum() > 0
        # identical detection count and (sorted) score multiset
        assert ev.sum() == av.sum()
        es = np.sort(np.asarray(exact["scores"])[ev])
        as_ = np.sort(np.asarray(approx["scores"])[av])
        np.testing.assert_allclose(es, as_, atol=1e-5)


class TestAssignLabel:
    def test_golden_target(self):
        assigner = AssignLabel(
            tasks=TASKS,
            gaussian_overlap=0.1,
            max_objs=5,
            min_radius=2,
            pc_range=PC_RANGE,
            voxel_size=VOXEL,
            out_size_factor=[4, 4],
        )
        boxes = np.array([[0.45, -1.05, 0.5, 1.0, 0.6, 0.8, 0.3, -0.2, 0.5]], np.float32)
        res = assigner(
            {"annotations": {"gt_boxes": boxes, "gt_names": np.array(["car"])}}
        )
        # label grid 16x16, cell 0.4m: cx = (0.45+3.2)/0.4 = 9.125 -> ix 9
        # cy = (-1.05+3.2)/0.4 = 5.375 -> iy 5
        assert res["mask"][0][0] == 1
        assert res["ind"][0][0] == 5 * 16 + 9
        np.testing.assert_allclose(res["anno_box"][0][0, :2], [0.125, 0.375], atol=1e-5)
        np.testing.assert_allclose(
            res["anno_box"][0][0, 3:6], np.log([1.0, 0.6, 0.8]), atol=1e-6
        )
        np.testing.assert_allclose(
            res["anno_box"][0][0, 8:], [np.sin(0.5), np.cos(0.5)], atol=1e-6
        )
        assert res["hm"][0][5, 9, 0] == pytest.approx(1.0)
        # second task untouched
        assert res["mask"][1].sum() == 0
        assert res["hm"][1].sum() == 0
