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


def _two_gt_car_fixture():
    """2 GT cars far apart in one sample (both parked, zero velocity)."""
    return {
        "s0": {
            "gt_boxes": np.array(
                [
                    [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0],
                    [20.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.5],
                ]
            ),
            "gt_names": np.array(["car", "car"]),
            "gt_attributes": np.array(["vehicle.parked", "vehicle.parked"]),
        }
    }


class TestScorerEdgeCases:
    """Adversarial fixtures at the brittle edges of the AP/TP interpolation.

    Golden constants minted (like TestScorerGolden's) from an independent
    scratch transcription of nuscenes-devkit eval/detection/algo.py.  NOTE
    the documented residual risk: the real devkit cannot run in this
    environment, so a shared misreading of algo.py would pass both the
    scratch implementation and pillarnext_tpu (see README "Known limits").
    """

    def test_duplicated_recall_values(self):
        """Consecutive FPs leave recall FLAT — np.interp over an xp array
        with duplicated recall values is exactly the devkit's behavior and
        an easy spot to diverge (e.g. dedup-ing recall first changes AP).
        Sequence: TP(.9, 0.2 m), FP(.8), FP(.7), TP(.6, 0.4 m) over 2 GT."""
        gt = _two_gt_car_fixture()
        dets = {
            "s0": {
                "box3d_lidar": np.array(
                    [
                        [0.2, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.1],
                        [50.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0],
                        [60.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0],
                        [20.0, 0.4, 0.0, 4.4, 1.8, 1.5, 0.0, 0.0, 0.7],
                    ]
                ),
                "scores": np.array([0.9, 0.8, 0.7, 0.6]),
                "label_preds": np.array([0, 0, 0, 0]),
            }
        }
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car"])
        for th in ("0.5", "1.0", "2.0", "4.0"):
            assert abs(m["label_aps"]["car"][th] - 0.632716049383) < 1e-9
        tp = m["label_tp_errors"]["car"]
        assert abs(tp["trans_err"] - 0.247222222222) < 1e-9
        assert abs(tp["scale_err"] - 0.041156982671) < 1e-9
        assert abs(tp["orient_err"] - 0.123611111111) < 1e-9
        assert abs(tp["vel_err"] - 0.0) < 1e-12
        assert abs(tp["attr_err"] - 0.0) < 1e-12

    def test_tied_confidences(self):
        """Two detections share score 0.5 (one FP, one TP): the TP-error
        interpolation's confidence xp then has duplicates too."""
        gt = _two_gt_car_fixture()
        dets = {
            "s0": {
                "box3d_lidar": np.array(
                    [
                        [0.2, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.1],
                        [50.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0],
                        [20.0, 0.4, 0.0, 4.4, 1.8, 1.5, 0.0, 0.0, 0.7],
                    ]
                ),
                "scores": np.array([0.9, 0.5, 0.5]),
                "label_preds": np.array([0, 0, 0]),
            }
        }
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car"])
        assert abs(m["label_aps"]["car"]["2.0"] - 0.737654320988) < 1e-9
        tp = m["label_tp_errors"]["car"]
        assert abs(tp["trans_err"] - 0.256666666667) < 1e-9
        assert abs(tp["scale_err"] - 0.049388379205) < 1e-9
        assert abs(tp["orient_err"] - 0.128333333333) < 1e-9

    def test_precision_never_above_min_precision(self):
        """10 detections, only the lowest-scored is a TP: precision at the
        TP row is exactly 1/10 == MIN_PRECISION, so post-clip AP is exactly
        0 even though recall reaches 1.0; trans_err still averages to the
        TP's 0.1 m over the achieved-recall bins."""
        gt = {
            "s0": {
                "gt_boxes": np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0]]),
                "gt_names": np.array(["car"]),
                "gt_attributes": np.array(["vehicle.parked"]),
            }
        }
        boxes = [[100.0 + i, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0] for i in range(9)]
        boxes.append([0.1, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0])
        dets = {
            "s0": {
                "box3d_lidar": np.array(boxes),
                "scores": np.array([0.9 - 0.05 * i for i in range(9)] + [0.4]),
                "label_preds": np.zeros(10, np.int64),
            }
        }
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car"])
        for th in ("0.5", "1.0", "2.0", "4.0"):
            assert m["label_aps"]["car"][th] == 0.0
        assert abs(m["label_tp_errors"]["car"]["trans_err"] - 0.1) < 1e-9

    def test_zero_gt_class(self):
        """A class with detections but NO ground truth anywhere: AP 0 and
        TP errors pinned at the protocol's worst-case 1.0; mean_ap still
        averages over BOTH classes (0 drags it down)."""
        gt = _two_gt_car_fixture()
        dets = {
            "s0": {
                "box3d_lidar": np.array(
                    [
                        [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0],
                        [20.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.5],
                        [5.0, 5.0, 0.0, 0.5, 0.5, 1.8, 0.0, 0.0, 0.0],
                    ]
                ),
                "scores": np.array([0.9, 0.8, 0.7]),
                "label_preds": np.array([0, 0, 1]),  # last is 'pedestrian'
            }
        }
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car", "pedestrian"])
        for th in ("0.5", "1.0", "2.0", "4.0"):
            assert abs(m["label_aps"]["car"][th] - 1.0) < 1e-12
            assert m["label_aps"]["pedestrian"][th] == 0.0
        assert abs(m["mean_ap"] - 0.5) < 1e-12
        for k, v in m["label_tp_errors"]["pedestrian"].items():
            assert v == 1.0, (k, v)

    def test_all_fp_class(self):
        """GT exists but every detection is > 4 m away: AP 0 at every
        threshold and TP errors 1.0 (the empty-achieved-recall branch of
        calc_tp)."""
        gt = _two_gt_car_fixture()
        dets = {
            "s0": {
                "box3d_lidar": np.array(
                    [
                        [50.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0],
                        [60.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0],
                    ]
                ),
                "scores": np.array([0.9, 0.8]),
                "label_preds": np.array([0, 0]),
            }
        }
        m = nuscenes_eval.evaluate_protocol(gt, dets, ["car"])
        for th in ("0.5", "1.0", "2.0", "4.0"):
            assert m["label_aps"]["car"][th] == 0.0
        for k, v in m["label_tp_errors"]["car"].items():
            assert v == 1.0, (k, v)
        assert m["nd_score"] == 0.0
