"""Golden-value pinning of the self-contained nuScenes scorer.

The official nuscenes-devkit cannot run in this environment, so the
expected values below were produced by an INDEPENDENT scratch
implementation of the detection_cvpr_2019 algorithm written directly from
the devkit's eval/detection/algo.py semantics (accumulate / calc_ap /
calc_tp, including the `+1` exclusion of the min-recall bin, the cummean +
confidence interpolation of TP errors, and np.interp's duplicated-recall
behavior), sharing no code with pillarnext_tpu.  Any numerical drift in
pillarnext_tpu.data.nuscenes_eval — AP bin clipping, TP-error estimator,
matching tie-breaks — fails against these constants.

Fixture design (single class 'car', 3 GT over 2 samples, 5 detections):
  - det .9 matches gt0 at 0.3 m       -> TP at every threshold
  - det .8 is 20+ m from anything     -> FP everywhere
  - det .7 matches gt2 at 1.2 m       -> TP at 2/4 m only
  - det .6 matches gt1 at 1.5 m       -> TP at 2/4 m only; attr mismatch
    (moving pred vs parked GT) exercises AttrErr
  - det .5 is 0.07 m from gt2, but at 2/4 m gt2 is already taken by det .7
    -> FP there, while at 0.5/1 m (where det .7 was an FP) it IS the match
    -> TP: exercises threshold-dependent greedy consumption
"""

import numpy as np

from pillarnext_tpu.data import nuscenes_eval


def _fixture():
    gt = {
        "s0": {
            "gt_boxes": np.array(
                [
                    [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 1.0, 0.0, 0.0],
                    [10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, np.pi / 2],
                ]
            ),
            "gt_names": np.array(["car", "car"]),
            "gt_attributes": np.array(["vehicle.moving", "vehicle.parked"]),
        },
        "s1": {
            "gt_boxes": np.array(
                [[5.0, 5.0, 0.0, 4.0, 2.0, 1.5, 3.0, 0.0, np.pi]]
            ),
            "gt_names": np.array(["car"]),
            "gt_attributes": np.array(["vehicle.moving"]),
        },
    }
    dets = {
        "s0": {
            "box3d_lidar": np.array(
                [
                    [0.3, 0.0, 0.0, 4.4, 1.8, 1.5, 1.4, 0.0, 0.1],
                    [30.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0],
                    [11.5, 0.0, 0.0, 4.0, 2.0, 1.5, 1.0, 0.0, np.pi / 2 - 0.2],
                ]
            ),
            "scores": np.array([0.9, 0.8, 0.6]),
            "label_preds": np.array([0, 0, 0]),
        },
        "s1": {
            "box3d_lidar": np.array(
                [
                    [5.0, 6.2, 0.0, 3.6, 2.2, 1.5, 2.8, 0.4, np.pi + 0.3],
                    [5.05, 5.05, 0.0, 4.2, 2.0, 1.4, 3.1, 0.0, np.pi - 0.15],
                ]
            ),
            "scores": np.array([0.7, 0.5]),
            "label_preds": np.array([0, 0]),
        },
    }
    return gt, dets


# scratch-implementation outputs (12 significant digits)
GOLDEN_APS = {
    "0.5": 0.347222222222,
    "1.0": 0.347222222222,
    "2.0": 0.706141975309,
    "4.0": 0.706141975309,
}
GOLDEN_TP = {
    "trans_err": 0.641444444444,
    "vel_err": 0.452064331060,
    "scale_err": 0.163226979273,
    "orient_err": 0.165277777778,
    "attr_err": 0.063592592593,
}
GOLDEN_MEAN_AP = 0.526682098765
GOLDEN_NDS = 0.614780436868


class TestScorerGolden:
    def test_matches_official_algorithm(self):
        gt, dets = _fixture()
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car"])
        for th, want in GOLDEN_APS.items():
            assert abs(m["label_aps"]["car"][th] - want) < 1e-9, (th, m["label_aps"])
        for k, want in GOLDEN_TP.items():
            assert abs(m["label_tp_errors"]["car"][k] - want) < 1e-9, (
                k, m["label_tp_errors"]["car"],
            )
        assert abs(m["mean_ap"] - GOLDEN_MEAN_AP) < 1e-9
        assert abs(m["nd_score"] - GOLDEN_NDS) < 1e-9

    def test_min_recall_bin_excluded(self):
        """A single perfect detection over 10 GT reaches exactly recall 0.1:
        official AP is 0 because the min-recall bin itself is EXCLUDED
        (calc_ap's +1) and precision is right=0 beyond achieved recall."""
        gt = {
            "s0": {
                "gt_boxes": np.array(
                    [[float(i * 10), 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0]
                     for i in range(10)]
                ),
                "gt_names": np.array(["car"] * 10),
                "gt_attributes": np.array(["vehicle.parked"] * 10),
            }
        }
        dets = {
            "s0": {
                "box3d_lidar": np.array(
                    [[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0]]
                ),
                "scores": np.array([0.9]),
                "label_preds": np.array([0]),
            }
        }
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car"])
        assert m["label_aps"]["car"]["2.0"] == 0.0

    def test_perfect_detection_is_ap_one(self):
        gt, _ = _fixture()
        dets = {}
        for i, (token, g) in enumerate(gt.items()):
            dets[token] = {
                "box3d_lidar": g["gt_boxes"].copy(),
                "scores": np.linspace(0.9, 0.8, len(g["gt_boxes"])),
                "label_preds": np.zeros(len(g["gt_boxes"]), np.int64),
            }
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car"])
        for th in GOLDEN_APS:
            assert abs(m["label_aps"]["car"][th] - 1.0) < 1e-12
        assert m["label_tp_errors"]["car"]["trans_err"] == 0.0
