"""Golden tests for CenterHead decode + post-processing math
(reference semantics: centerhead.py:247-384)."""

import numpy as np

import jax.numpy as jnp

from pillarnext_tpu.models import CenterHead

HEAD = CenterHead(
    in_channels=8,
    tasks=[["car"]],
    weight=0.25,
    code_weights=[1.0] * 10,
    common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2), "vel": (2, 2)},
    strides=[1],
    rectifier=[[0.5]],
    voxel_size=[0.1, 0.1, 8],
    pc_range=[-0.8, -0.8, -2, 0.8, 0.8, 2],
    out_size_factor=[2],
)

TEST_CFG = {
    "post_center_limit_range": [-10, -10, -10, 10, 10, 10],
    "nms": {"nms_pre_max_size": 16, "nms_post_max_size": 4, "nms_iou_threshold": [[0.2]]},
    "score_threshold": 0.1,
    "pc_range": [-0.8, -0.8, -2, 0.8, 0.8, 2],
    "voxel_size": [0.1, 0.1, 8],
    "out_size_factor": [2],
}


def _preds(h=4, w=4):
    """One hot cell at (row=1, col=2) with known regression values."""
    hm = np.full((1, h, w, 1), -8.0, np.float32)
    hm[0, 1, 2, 0] = 4.0  # sigmoid ~ 0.982
    reg = np.zeros((1, h, w, 2), np.float32)
    reg[0, 1, 2] = [0.25, -0.25]
    height = np.zeros((1, h, w, 1), np.float32)
    height[0, 1, 2] = 0.5
    dim = np.zeros((1, h, w, 3), np.float32)
    dim[0, 1, 2] = np.log([2.0, 1.0, 1.5])
    rot = np.zeros((1, h, w, 2), np.float32)
    rot[0, 1, 2] = [np.sin(0.3), np.cos(0.3)]
    vel = np.zeros((1, h, w, 2), np.float32)
    vel[0, 1, 2] = [1.0, -1.0]
    return {
        "hm": jnp.asarray(hm),
        "reg": jnp.asarray(reg),
        "height": jnp.asarray(height),
        "dim": jnp.asarray(dim),
        "rot": jnp.asarray(rot),
        "vel": jnp.asarray(vel),
    }


class TestDecode:
    def test_golden_box(self):
        dets = HEAD.predict([_preds()], TEST_CFG)
        valid = np.asarray(dets["valid"][0])
        boxes = np.asarray(dets["box3d_lidar"][0])[valid]
        scores = np.asarray(dets["scores"][0])[valid]

        # the peak must be the top detection
        b = boxes[np.argmax(scores)]
        # xs = (col + reg_x) * factor * voxel + xmin = (2 + 0.25)*2*0.1 - 0.8
        np.testing.assert_allclose(b[0], 2.25 * 0.2 - 0.8, atol=1e-5)
        # ys = (row + reg_y) * factor * voxel + ymin = (1 - 0.25)*0.2 - 0.8
        np.testing.assert_allclose(b[1], 0.75 * 0.2 - 0.8, atol=1e-5)
        np.testing.assert_allclose(b[2], 0.5, atol=1e-5)           # height
        np.testing.assert_allclose(b[3:6], [2.0, 1.0, 1.5], rtol=1e-5)  # exp(dim)
        np.testing.assert_allclose(b[6:8], [1.0, -1.0], atol=1e-5)  # velocity
        np.testing.assert_allclose(b[8], 0.3, atol=1e-5)            # atan2(sin, cos)

    def test_rectified_score_default_iou_one(self):
        """Without an iou head, iou=1 so score -> score^(1-r) (r=0.5)."""
        dets = HEAD.predict([_preds()], TEST_CFG)
        valid = np.asarray(dets["valid"][0])
        top = np.asarray(dets["scores"][0])[valid].max()
        raw = 1.0 / (1.0 + np.exp(-4.0))
        np.testing.assert_allclose(top, raw**0.5, atol=1e-5)

    def test_score_threshold_masks(self):
        preds = _preds()
        cfg = dict(TEST_CFG, score_threshold=0.999)
        dets = HEAD.predict([preds], cfg)
        assert int(np.asarray(dets["valid"]).sum()) == 0

    def test_post_center_range_masks(self):
        cfg = dict(TEST_CFG, post_center_limit_range=[5, 5, 5, 6, 6, 6])
        dets = HEAD.predict([_preds()], cfg)
        assert int(np.asarray(dets["valid"]).sum()) == 0


class TestCandidateSparseHead:
    def test_matches_dense_predict(self):
        """candidate_sparse_head=true: dim/rot/vel patch evaluation at the
        selected candidates reproduces the dense predict exactly (same
        branch params, SAME zero padding — incl. map-edge candidates)."""
        import jax

        head = CenterHead(
            in_channels=8,
            tasks=[["car"], ["ped", "cone"]],
            weight=0.25,
            code_weights=[1.0] * 10,
            common_heads={
                "reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                "rot": (2, 2), "vel": (2, 2),
            },
            strides=[2, 2],
            rectifier=[[0.5], [0.5, 0.5]],
            voxel_size=[0.1, 0.1, 8],
            pc_range=[-0.8, -0.8, -2, 0.8, 0.8, 2],
            out_size_factor=[2, 2],
            share_conv_channel=16,
        )
        cfg = {
            "post_center_limit_range": [-10, -10, -10, 10, 10, 10],
            "nms": {
                "nms_pre_max_size": 16,
                "nms_post_max_size": 4,
                # threshold > 1: nothing suppressed, so the selected set is
                # pure score order — identical by construction (scores never
                # touch dim/rot/vel), and the comparison below checks the
                # patch-evaluated regression values themselves rather than
                # NMS decisions that float-noise near a tie could flip
                "nms_iou_threshold": [[2.0], [2.0, 2.0]],
            },
            "score_threshold": 0.0,  # every cell is a candidate (edges too)
            "pc_range": [-0.8, -0.8, -2, 0.8, 0.8, 2],
            "voxel_size": [0.1, 0.1, 8],
            "out_size_factor": [2, 2],
        }
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 8), jnp.float32)
        variables = head.init(jax.random.PRNGKey(0), x)

        preds = head.apply(variables, x, False)
        dense = head.predict(preds, cfg)
        sparse = head.apply(
            variables, x, False, dict(cfg, candidate_sparse_head=True)
        )

        for k in ("box3d_lidar", "scores", "label_preds", "valid"):
            np.testing.assert_allclose(
                np.asarray(dense[k], np.float32),
                np.asarray(sparse[k], np.float32),
                atol=1e-5,
                err_msg=k,
            )
