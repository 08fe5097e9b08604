"""AdaptivePredictor: bucketed-capacity serving is exact.

- a bucket that FITS the frame's active set produces bit-identical
  detections to the largest capacity (the compact table holds the same
  rows; only dead slots disappear);
- a bucket that OVERFLOWS is detected via the on-device telemetry and the
  frame is transparently recomputed at the largest bucket, so resolved
  outputs always equal the safe-capacity results.
"""

import jax
import numpy as np

from pillarnext_tpu.models import (
    ASPPNeck,
    CenterHead,
    PillarFeatureNet,
    SingleStageDetector,
    SparseResNet,
)
from pillarnext_tpu.serving import AdaptivePredictor
from tests.test_models import PC_RANGE, TASKS, TEST_CFG, VOXEL, synthetic_batch


def capacity_detector(capacity: int) -> SingleStageDetector:
    common = {
        "reg": (2, 2),
        "height": (1, 2),
        "dim": (3, 2),
        "rot": (2, 2),
        "vel": (2, 2),
    }
    return SingleStageDetector(
        reader=PillarFeatureNet(
            num_input_features=5,
            num_filters=(16, 16),
            voxel_size=VOXEL,
            pc_range=PC_RANGE,
            pillar_capacity=capacity,
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
            voxel_size=VOXEL,
            pc_range=PC_RANGE,
            out_size_factor=[4, 4],
            rectifier=[[0.5], [0.5, 0.5]],
        ),
        post_processing=TEST_CFG,
    )


def occupancy(points, mask):
    """Host-side occupied-pillar count (per batch total)."""
    vs = np.asarray(VOXEL[:2])
    org = np.asarray(PC_RANGE[:2])
    n = 0
    for b in range(points.shape[0]):
        p = np.asarray(points[b][np.asarray(mask[b])])
        ix = np.floor((p[:, :2] - org) / vs).astype(np.int64)
        ok = (ix >= 0).all(1) & (ix < 64).all(1)
        n = max(n, len({(a, c) for a, c in ix[ok]}))
    return n


class TestAdaptivePredictor:
    def setup_method(self):
        batch = synthetic_batch(batch=1, n_points=256)
        self.pts = batch["points"]
        self.mask = batch["points_mask"]
        self.occ = occupancy(self.pts, self.mask)
        assert self.occ > 20  # scene must be non-trivial
        model = capacity_detector(1024)
        self.variables = model.init(jax.random.PRNGKey(0), self.pts, self.mask)
        self.reference = jax.jit(
            lambda v, p, m: model.apply(
                v, {"points": p, "points_mask": m}, method=model.predict
            )
        )(self.variables, self.pts, self.mask)

    def _assert_equal(self, out):
        for k in ("box3d_lidar", "scores", "label_preds", "valid"):
            np.testing.assert_array_equal(
                np.asarray(out[k]), np.asarray(self.reference[k]), err_msg=k
            )

    def test_fitting_bucket_is_bit_identical(self):
        pred = AdaptivePredictor(
            capacity_detector,
            self.variables,
            buckets=(self.occ + 8, 1024),
        )
        outs = pred.resolve([pred(self.pts, self.mask)])
        assert pred.repaired == 0 and pred.level == 0
        self._assert_equal(outs[0])

    def test_overflowing_bucket_is_repaired(self):
        pred = AdaptivePredictor(
            capacity_detector,
            self.variables,
            buckets=(max(8, self.occ // 4), 1024),
        )
        outs = pred.resolve([pred(self.pts, self.mask)])
        assert pred.repaired == 1
        assert pred.level == 1  # subsequent frames go straight to the max
        self._assert_equal(outs[0])
        # next dispatch uses the max bucket and needs no repair
        outs2 = pred.resolve([pred(self.pts, self.mask)])
        assert pred.repaired == 1
        self._assert_equal(outs2[0])

    def test_capacity_tracking_learns_a_tighter_bucket(self):
        # ladder starts generously; after one resolved frame the tracker
        # learns the true requirement and dispatches at the learned bucket
        # (quantized up), with bit-identical outputs
        pred = AdaptivePredictor(
            capacity_detector,
            self.variables,
            buckets=(1024,),
            track_quantum=16,
        )
        assert pred._operating_bucket() == 1024
        outs = pred.resolve([pred(self.pts, self.mask)])
        self._assert_equal(outs[0])
        learned = pred._operating_bucket()
        assert learned < 1024
        assert learned >= self.occ  # margin keeps it safe
        assert pred.peak_required == self.occ
        outs2 = pred.resolve([pred(self.pts, self.mask)])
        assert pred.repaired == 0
        self._assert_equal(outs2[0])

    def test_capacity_tracking_never_worsens_the_ladder(self):
        # a tiny-capacity stream with a big quantum: the learned bucket
        # would quantize far above the fitted ladder bucket — the operating
        # bucket must stay at the ladder's (smaller) choice
        pred = AdaptivePredictor(
            capacity_detector,
            self.variables,
            buckets=(self.occ + 8, 1024),
            track_quantum=4096,
        )
        pred.resolve([pred(self.pts, self.mask)])
        assert pred._operating_bucket() == self.occ + 8
        assert pred.repaired == 0
