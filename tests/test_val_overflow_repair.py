"""val_epoch must never score silently-truncated scenes (VERDICT r3 weak
item 4): an undersized eval capacity either gets repaired bit-exactly
(recompute at a scaled capacity, the val-side analogue of
serving.AdaptivePredictor) or fails loudly — the old behavior was a single
warning line and degraded metrics."""

import numpy as np
import pytest

import jax

from pillarnext_tpu.data.assign import AssignLabel
from pillarnext_tpu.data.collate import collate
from pillarnext_tpu.parallel import mesh as mesh_lib
from pillarnext_tpu.train import train_state as ts_lib
from pillarnext_tpu.train.trainer import Trainer
from pillarnext_tpu.utils import builders

PC_RANGE = [-24.96, -24.96, -5.0, 24.96, 24.96, 3.0]
VOXEL = [0.26, 0.26, 8.0]
TASKS = [["car"], ["pedestrian"]]


def model_cfg(pillar_capacity: int) -> dict:
    return {
        "_target_": "pillarnext_tpu.models.SingleStageDetector",
        "dtype": "float32",
        "reader": {
            "_target_": "pillarnext_tpu.models.PillarFeatureNet",
            "num_input_features": 5,
            "num_filters": [16, 16],
            "voxel_size": VOXEL,
            "pc_range": PC_RANGE,
            "pillar_capacity": pillar_capacity,
        },
        "backbone": {
            "_target_": "pillarnext_tpu.models.SparseResNet",
            "layer_nums": [1, 1],
            "ds_layer_strides": [1, 2],
            "ds_num_filters": [16, 32],
            "kernel_size": [3, 3],
            "num_input_features": 16,
            "out_channels": 32,
            "sparse_stages_train": "all",
            "stage_capacity_frac": [1.0, 0.5],
        },
        "neck": {"_target_": "pillarnext_tpu.models.ASPPNeck", "in_channels": 32},
        "head": {
            "_target_": "pillarnext_tpu.models.CenterHead",
            "in_channels": 32,
            "tasks": TASKS,
            "weight": 0.25,
            "code_weights": [1.0] * 8 + [0.2, 0.2],
            "common_heads": {
                "reg": [2, 2],
                "height": [1, 2],
                "dim": [3, 2],
                "rot": [2, 2],
                "vel": [2, 2],
            },
            "strides": [2, 2],
            "share_conv_channel": 16,
            "with_reg_iou": False,
            "voxel_size": VOXEL,
            "pc_range": PC_RANGE,
            "out_size_factor": [2, 2],
            "rectifier": [[0.5], [0.5]],
        },
        "post_processing": {
            "post_center_limit_range": [-30, -30, -10, 30, 30, 10],
            "max_per_img": 64,
            "nms_type": "iou3d",
            "nms": {
                "nms_pre_max_size": 64,
                "nms_post_max_size": 16,
                "nms_iou_threshold": [[0.2], [0.2]],
            },
            "score_threshold": 0.05,
            "pc_range": PC_RANGE,
            "voxel_size": VOXEL,
            "out_size_factor": [2, 2],
        },
    }


def one_batch(batch=2, n_points=6000, seed=0):
    rng = np.random.default_rng(seed)
    assigner = AssignLabel(
        tasks=TASKS,
        gaussian_overlap=0.1,
        max_objs=10,
        min_radius=2,
        pc_range=PC_RANGE,
        voxel_size=VOXEL,
        out_size_factor=[2, 2],
    )
    samples = []
    for i in range(batch):
        boxes = np.zeros((4, 9), np.float32)
        boxes[:, :2] = rng.uniform(-18, 18, (4, 2))
        boxes[:, 2] = rng.uniform(-1, 1, 4)
        boxes[:, 3:6] = rng.uniform(1.0, 4.0, (4, 3))
        boxes[:, 8] = rng.uniform(-np.pi, np.pi, 4)
        names = np.array(["car", "pedestrian"] * 2)
        theta = rng.uniform(-np.pi, np.pi, n_points)
        r = 2 + 22 * rng.random(n_points) ** 2
        pts = np.zeros((n_points, 5), np.float32)
        pts[:, 0] = r * np.cos(theta)
        pts[:, 1] = r * np.sin(theta)
        pts[:, 2] = rng.uniform(-2, 1, n_points)
        pts[:, 3] = rng.uniform(0, 1, n_points)
        samples.append(
            assigner(
                {
                    "token": f"tok{i}",
                    "points": pts,
                    "annotations": {"gt_boxes": boxes, "gt_names": names},
                }
            )
        )
    out = collate(samples, max_points=n_points)
    return {
        k: v
        for k, v in out.items()
        if k == "token" or getattr(v, "dtype", np.dtype("O")) != np.dtype("O")
    }


class _StubLoader:
    def __init__(self, batch):
        self.batch = batch
        self.dataset = self

    def __len__(self):
        return 1

    def __iter__(self):
        yield dict(self.batch)

    def evaluation(self, results, output_dir):
        self.results = results
        return None


def _run_val(cfg_small, batch, tmp_path, **trainer_kw):
    model = builders.build_model(cfg_small)
    tx, _ = ts_lib.make_optimizer(max_lr=1e-3, total_steps=4)
    loader = _StubLoader(batch)
    tr = Trainer(
        model,
        val_dataloader=loader,
        optimizer=tx,
        work_dir=str(tmp_path),
        mesh=mesh_lib.make_mesh(jax.devices()[:2]),
        **trainer_kw,
    )
    tr.init_state({k: v for k, v in batch.items() if k != "token"})
    tr.val_epoch()
    return tr, loader.results


@pytest.mark.slow
def test_undersized_val_capacity_repairs_bit_exact(tmp_path):
    batch = one_batch()
    cfg_small = model_cfg(1024)  # scene occupies thousands of pillars

    tr, repaired = _run_val(
        cfg_small, batch, tmp_path / "a",
        eval_model_cfg=cfg_small, eval_overflow="repair",
    )
    assert tr.eval_repairs == 1

    # ground truth: the same weights evaluated at an amply-sized capacity
    big = builders.build_eval_model_scaled(cfg_small, 16.0)
    variables = {"params": tr.state.params, "batch_stats": tr.state.batch_stats}
    step = ts_lib.make_eval_step(big, tr.mesh)
    dets, tel = step(variables, {k: v for k, v in batch.items() if k != "token"})
    assert not tr._eval_overflow_of(tel)
    dets = jax.tree.map(np.asarray, dets)
    for bi, token in enumerate(batch["token"]):
        valid = dets["valid"][bi]
        np.testing.assert_array_equal(
            repaired[token]["box3d_lidar"], dets["box3d_lidar"][bi][valid]
        )
        np.testing.assert_array_equal(
            repaired[token]["scores"], dets["scores"][bi][valid]
        )
        np.testing.assert_array_equal(
            repaired[token]["label_preds"], dets["label_preds"][bi][valid]
        )


@pytest.mark.slow
def test_undersized_val_capacity_raises_without_repair(tmp_path):
    batch = one_batch()
    cfg_small = model_cfg(1024)
    with pytest.raises(RuntimeError, match="overflow"):
        _run_val(cfg_small, batch, tmp_path, eval_overflow="raise")
