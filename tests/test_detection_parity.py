"""End-to-end detection-level parity vs the full-pipeline torch mirror.

The strongest parity claim short of real-data metrics: the SAME weights and
the SAME point cloud, pushed through (a) a PyTorch mirror wired exactly like
the reference — dynamic torch.unique voxelization, PFN, dense backbone/neck/
head, reference decode + C++-oracle NMS (centerhead.py:231-384) — and (b) our
jitted ``SingleStageDetector.predict``, must produce the SAME detections:
same count, same boxes, same scores, same labels.

This subsumes per-layer import checks: any wiring divergence (coordinate
convention, decoration order, BN regime, decode offsets, NMS semantics,
label offsetting, score rectification) shows up as a detection mismatch.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pillarnext_tpu.core import native_geometry
from pillarnext_tpu.models import (
    ASPPNeck,
    CenterHead,
    PillarFeatureNet,
    SingleStageDetector,
    SparseResNet,
)
from pillarnext_tpu.utils import torch_import as ti

import torch_mirror as tm

pytestmark = pytest.mark.skipif(
    not native_geometry.available(), reason="native geometry oracle not built"
)

PC_RANGE = [-8.0, -8.0, -5.0, 8.0, 8.0, 3.0]
VOXEL = [0.25, 0.25, 8.0]
NUM_FILTERS = (16, 16)
BB_FILTERS = (16, 32)
BB_STRIDES = (1, 2)
BB_LAYERS = (1, 1)
OUT_CH = 32
TASKS = [["car"], ["pedestrian", "cyclist"]]
COMMON = {
    "reg": (2, 2),
    "height": (1, 2),
    "dim": (3, 2),
    "rot": (2, 2),
    "vel": (2, 2),
    "iou": (1, 2),
}
RECTIFIER = [[0.3], [0.2, 0.4]]
TEST_CFG = {
    "post_center_limit_range": [-10.0, -10.0, -6.0, 10.0, 10.0, 4.0],
    "nms": {
        "nms_pre_max_size": 256,
        "nms_post_max_size": 32,
        "nms_iou_threshold": [[0.2], [0.25, 0.25]],
    },
    "score_threshold": 0.05,
    "pc_range": PC_RANGE,
    "voxel_size": VOXEL,
    # backbone total stride 2, head deblock stride 2 -> head map at grid res
    "out_size_factor": [1, 1],
    "nms_type": "iou3d",
}


def build_torch_model(seed=0, subm=False):
    torch.manual_seed(seed)
    tmodel = tm.TModel(
        num_input_features=5,
        num_filters=NUM_FILTERS,
        voxel_size=VOXEL,
        pc_range=PC_RANGE,
        bb_filters=BB_FILTERS,
        bb_strides=BB_STRIDES,
        bb_layer_nums=BB_LAYERS,
        out_channels=OUT_CH,
        tasks=TASKS,
        common_heads=COMMON,
        head_stride=2,
        subm=subm,
    )
    tmodel.eval()
    tm.randomize_bn_stats(tmodel, np.random.default_rng(seed + 1))
    return tmodel


def build_jax_model(sparse=False):
    return SingleStageDetector(
        reader=PillarFeatureNet(
            num_input_features=5,
            num_filters=NUM_FILTERS,
            voxel_size=VOXEL,
            pc_range=PC_RANGE,
            pillar_capacity=4096,
            output="sparse" if sparse else "dense",
        ),
        backbone=SparseResNet(
            layer_nums=BB_LAYERS,
            ds_layer_strides=BB_STRIDES,
            ds_num_filters=BB_FILTERS,
            num_input_features=NUM_FILTERS[-1],
            out_channels=OUT_CH,
        ),
        neck=ASPPNeck(in_channels=OUT_CH),
        head=CenterHead(
            in_channels=OUT_CH,
            tasks=TASKS,
            weight=0.25,
            code_weights=[1.0] * 10,
            common_heads=COMMON,
            strides=[2, 2],
            rectifier=RECTIFIER,
            voxel_size=VOXEL,
            pc_range=PC_RANGE,
            out_size_factor=TEST_CFG["out_size_factor"],
        ),
        post_processing=TEST_CFG,
    )


def make_points(batch=2, n=4096, seed=3):
    """Clustered synthetic scan: blobs (pillar structure) + diffuse floor +
    out-of-range and padded rows to exercise masking."""
    rng = np.random.default_rng(seed)
    pts = np.zeros((batch, n, 5), np.float32)
    mask = np.ones((batch, n), bool)
    for b in range(batch):
        centers = rng.uniform(-6, 6, (12, 2))
        blob = centers[rng.integers(0, 12, n)] + rng.normal(0, 0.4, (n, 2))
        pts[b, :, :2] = blob
        pts[b, :, 2] = rng.normal(-1.0, 0.5, n)
        pts[b, :, 3] = rng.uniform(0, 1, n)
        pts[b, :, 4] = rng.uniform(0, 0.45, n)
        # plant some out-of-range and invalid rows
        pts[b, : n // 16, 0] = rng.uniform(8.5, 12.0, n // 16)
        mask[b, -n // 16 :] = False
        pts[b, ~mask[b]] = rng.normal(0, 100, (int((~mask[b]).sum()), 5))
    return pts, mask


def import_weights(tmodel):
    sd = {}
    for k, v in tmodel.state_dict().items():
        sd["neck.weight" if k.startswith("neck.weight") else k] = v.detach().numpy()
    return ti.import_pillarnext(
        sd,
        num_filters=NUM_FILTERS,
        layer_nums=BB_LAYERS,
        ds_num_filters=BB_FILTERS,
        num_input_features=NUM_FILTERS[-1],
        out_channels=OUT_CH,
        tasks=TASKS,
        common_heads=COMMON,
    )


class TestDetectionParity:
    @pytest.mark.parametrize(
        "sparse", [False, True], ids=["dense-path", "sparse-submanifold-path"]
    )
    def test_full_pipeline_detections_match(self, sparse):
        """dense: plain dense backbone vs dense mirror.  sparse: the
        PRODUCTION path (compact-table reader, SubM stage-0 + masked-dense
        eval) vs the mirror with exact spconv active-set masking."""
        tmodel = build_torch_model(subm=sparse)
        params, stats = import_weights(tmodel)
        model = build_jax_model(sparse=sparse)

        pts, mask = make_points()
        with torch.no_grad():
            preds_t = tmodel(tm.padded_to_ragged(pts, mask))
        ref_dets = tm.reference_predict(
            [{k: v.numpy() for k, v in pd.items()} for pd in preds_t],
            TEST_CFG,
            RECTIFIER,
            [len(t) for t in TASKS],
        )

        example = {"points": jnp.asarray(pts), "points_mask": jnp.asarray(mask)}
        ours = jax.jit(
            lambda v, e: model.apply(v, e, method=model.predict)
        )({"params": params, "batch_stats": stats}, example)

        for i in range(pts.shape[0]):
            o_valid = np.asarray(ours["valid"][i]).astype(bool)
            o_boxes = np.asarray(ours["box3d_lidar"][i])[o_valid]
            o_scores = np.asarray(ours["scores"][i])[o_valid]
            o_labels = np.asarray(ours["label_preds"][i])[o_valid]
            r_boxes = ref_dets[i]["box3d_lidar"]
            r_scores = ref_dets[i]["scores"]
            r_labels = ref_dets[i]["label_preds"]

            assert len(o_scores) == len(r_scores), (
                f"sample {i}: {len(o_scores)} vs {len(r_scores)} detections"
            )
            # match by (label, score) ordering — both sides sort per class
            o_ord = np.lexsort((-o_scores, o_labels))
            r_ord = np.lexsort((-r_scores, r_labels))
            np.testing.assert_array_equal(o_labels[o_ord], r_labels[r_ord])
            np.testing.assert_allclose(
                o_scores[o_ord], r_scores[r_ord], atol=2e-3, rtol=1e-3
            )
            np.testing.assert_allclose(
                o_boxes[o_ord], r_boxes[r_ord], atol=2e-2, rtol=1e-3,
                err_msg=f"sample {i} box mismatch",
            )

    def test_detections_nonempty(self):
        """Guard against vacuous parity (no detections on either side)."""
        tmodel = build_torch_model()
        pts, mask = make_points()
        with torch.no_grad():
            preds_t = tmodel(tm.padded_to_ragged(pts, mask))
        ref_dets = tm.reference_predict(
            [{k: v.numpy() for k, v in pd.items()} for pd in preds_t],
            TEST_CFG,
            RECTIFIER,
            [len(t) for t in TASKS],
        )
        assert sum(len(d["scores"]) for d in ref_dets) >= 8
