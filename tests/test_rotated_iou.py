"""On-device rotated IoU / NMS vs. the exact C++ polygon-clip oracle."""

import numpy as np
import pytest

from pillarnext_tpu.core import jax_box_ops, native_geometry, nms

import jax.numpy as jnp


def _rand_boxes(n, rng, span=15.0):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, :2] = rng.uniform(-span, span, (n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n)
    boxes[:, 3:6] = rng.uniform(0.5, 6.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


class TestOverlapGolden:
    def test_identical_boxes(self):
        b = jnp.array([[0, 0, 0, 4, 2, 2, 0.7]], jnp.float32)
        area = jax_box_ops.boxes_overlap_bev(b, b)
        np.testing.assert_allclose(area, [[8.0]], rtol=1e-5)

    def test_axis_aligned_partial(self):
        a = jnp.array([[0, 0, 0, 4, 2, 2, 0.0]], jnp.float32)
        b = jnp.array([[2, 0, 0, 4, 2, 2, 0.0]], jnp.float32)
        area = jax_box_ops.boxes_overlap_bev(a, b)
        np.testing.assert_allclose(area, [[4.0]], rtol=1e-5)

    def test_disjoint(self):
        a = jnp.array([[0, 0, 0, 2, 2, 2, 0.3]], jnp.float32)
        b = jnp.array([[10, 10, 0, 2, 2, 2, 1.0]], jnp.float32)
        np.testing.assert_allclose(jax_box_ops.boxes_overlap_bev(a, b), [[0.0]])

    def test_cross_rotation_45deg(self):
        # unit square vs same square rotated 45deg: intersection = regular
        # octagon with area 8*(sqrt(2)-1) for unit square
        a = jnp.array([[0, 0, 0, 1, 1, 1, 0.0]], jnp.float32)
        b = jnp.array([[0, 0, 0, 1, 1, 1, np.pi / 4]], jnp.float32)
        area = float(jax_box_ops.boxes_overlap_bev(a, b)[0, 0])
        # regular octagon: area = 2*(sqrt(2)-1) for the unit square pair
        assert area == pytest.approx(2 * (np.sqrt(2) - 1), rel=1e-4)
        assert area == pytest.approx(0.82842712, rel=1e-4)

    def test_identity_diagonal_random_yaws(self):
        # identical boxes (collinear clip edges) must give IoU exactly ~1
        rng = np.random.default_rng(9)
        b = jnp.asarray(_rand_boxes(64, rng))
        iou = np.asarray(jax_box_ops.boxes_iou_bev(b, b))
        np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)

    def test_contained_box(self):
        a = jnp.array([[0, 0, 0, 6, 6, 2, 0.2]], jnp.float32)
        b = jnp.array([[0.5, -0.3, 0, 1, 2, 2, 1.2]], jnp.float32)
        np.testing.assert_allclose(
            jax_box_ops.boxes_overlap_bev(a, b), [[2.0]], rtol=1e-4
        )


class TestOverlapVsOracle:
    @pytest.fixture(autouse=True)
    def _need_native(self):
        if not native_geometry.available():
            pytest.skip("native lib not built")

    def test_random_matrix(self):
        rng = np.random.default_rng(7)
        a = _rand_boxes(24, rng)
        b = _rand_boxes(24, rng)
        ours = np.asarray(jax_box_ops.boxes_overlap_bev(jnp.array(a), jnp.array(b)))
        oracle = native_geometry.boxes_overlap_bev(a, b)
        np.testing.assert_allclose(ours, oracle, atol=2e-3)

    def test_clustered_boxes_heavy_overlap(self):
        rng = np.random.default_rng(13)
        a = _rand_boxes(32, rng, span=3.0)
        b = _rand_boxes(32, rng, span=3.0)
        ours = np.asarray(jax_box_ops.boxes_overlap_bev(jnp.array(a), jnp.array(b)))
        oracle = native_geometry.boxes_overlap_bev(a, b)
        np.testing.assert_allclose(ours, oracle, atol=5e-3)

    def test_aligned_iou3d(self):
        rng = np.random.default_rng(3)
        a = _rand_boxes(64, rng, span=4.0)
        b = _rand_boxes(64, rng, span=4.0)
        bev_ours = np.asarray(
            jax_box_ops.boxes_aligned_overlap_bev(jnp.array(a), jnp.array(b))
        )
        bev_oracle = native_geometry.boxes_aligned_iou_bev(a, b)
        # oracle returns IoU; recompose ours
        inter = bev_ours
        union = a[:, 3] * a[:, 4] + b[:, 3] * b[:, 4] - inter
        np.testing.assert_allclose(inter / np.maximum(union, 1e-8), bev_oracle, atol=2e-3)


class TestDiou:
    def test_identical_is_one(self):
        b = jnp.array([[1, 2, 0, 4, 2, 1.5, 0.3]], jnp.float32)
        np.testing.assert_allclose(
            jax_box_ops.bbox3d_overlaps_diou(b, b), [1.0], atol=1e-6
        )

    def test_disjoint_negative(self):
        a = jnp.array([[0, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
        b = jnp.array([[10, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
        diou = float(jax_box_ops.bbox3d_overlaps_diou(a, b)[0])
        assert diou < 0

    def test_golden_half_shift(self):
        a = jnp.array([[0, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
        b = jnp.array([[1, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
        # inter = 1*2*2=4, union = 8+8-4=12, iou=1/3
        # inter_diag = 1; outer: x 3, y 2, h 2 -> 9+4+4=17
        expected = 4 / 12 - 1 / 17
        np.testing.assert_allclose(
            jax_box_ops.bbox3d_overlaps_diou(a, b), [expected], rtol=1e-5
        )


class TestNms:
    def test_suppresses_duplicates_keeps_best(self):
        boxes = jnp.array(
            [
                [0, 0, 0, 4, 2, 2, 0.0],
                [0.1, 0, 0, 4, 2, 2, 0.02],  # near-duplicate of row 0
                [20, 20, 0, 4, 2, 2, 0.5],  # far away
            ],
            jnp.float32,
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        sel, valid = nms.rotated_nms(boxes, scores, 0.2, 3, 3)
        kept = set(np.asarray(sel)[np.asarray(valid)].tolist())
        assert kept == {0, 2}

    def test_matches_oracle_random(self):
        if not native_geometry.available():
            pytest.skip("native lib not built")
        rng = np.random.default_rng(42)
        boxes = _rand_boxes(100, rng, span=10.0)
        scores = rng.uniform(0, 1, 100).astype(np.float32)

        sel, valid = nms.rotated_nms(jnp.array(boxes), jnp.array(scores), 0.3, 100, 100)
        ours = np.asarray(sel)[np.asarray(valid)]

        order = np.argsort(-scores, kind="stable")
        keep_sorted = native_geometry.rotated_nms(boxes[order], 0.3)
        oracle = order[keep_sorted]
        np.testing.assert_array_equal(np.sort(ours), np.sort(oracle))

    def test_matches_oracle_multichunk(self):
        """> 128 candidates forces the streaming chunk loop across kept-set
        boundaries; heavy clustering forces cross-chunk suppression."""
        if not native_geometry.available():
            pytest.skip("native lib not built")
        rng = np.random.default_rng(11)
        boxes = _rand_boxes(400, rng, span=6.0)  # dense -> long chains
        scores = rng.uniform(0, 1, 400).astype(np.float32)

        sel, valid = nms.rotated_nms(jnp.array(boxes), jnp.array(scores), 0.3, 400, 50)
        ours = np.asarray(sel)[np.asarray(valid)]

        order = np.argsort(-scores, kind="stable")
        keep_sorted = native_geometry.rotated_nms(boxes[order], 0.3)
        oracle = order[keep_sorted][:50]
        np.testing.assert_array_equal(np.sort(ours), np.sort(oracle))

    def test_invalid_rows_never_selected(self):
        boxes = jnp.array([[0, 0, 0, 2, 2, 2, 0.0]] * 4, jnp.float32)
        scores = jnp.array([0.9, nms.NEG_INF, nms.NEG_INF, nms.NEG_INF])
        sel, valid = nms.rotated_nms(boxes, scores, 0.5, 4, 4)
        assert int(np.asarray(valid).sum()) == 1

    def test_axis_aligned_nms(self):
        """nms_normal semantics: yaw is IGNORED — two heavily rotated boxes
        at the same center suppress each other by their AABB IoU."""
        boxes = jnp.asarray(
            np.array(
                [
                    [0, 0, 0, 4, 0.5, 1, 0.0],        # kept (highest score)
                    # same dims rotated 90 deg: yaw-blind IoU = 1 ->
                    # suppressed; TRUE rotated IoU ~= 0.07 -> rotated keeps it
                    [0, 0, 0, 4, 0.5, 1, np.pi / 2],
                    [9, 9, 0, 2, 2, 1, 1.2],          # far away -> kept
                    [9.2, 9, 0, 2, 2, 1, 0.0],        # overlaps #2 -> suppressed
                ],
                np.float32,
            )
        )
        scores = jnp.asarray([0.9, 0.8, 0.7, 0.6], jnp.float32)
        sel, valid = nms.axis_aligned_nms(boxes, scores, 0.5, 4, 4)
        kept = sorted(np.asarray(sel)[np.asarray(valid)].tolist())
        assert kept == [0, 2]
        sel_r, valid_r = nms.rotated_nms(boxes, scores, 0.5, 4, 4)
        kept_r = sorted(np.asarray(sel_r)[np.asarray(valid_r)].tolist())
        assert 1 in kept_r

    def test_circle_nms(self):
        centers = jnp.array([[0, 0], [0.5, 0], [5, 5]], jnp.float32)
        scores = jnp.array([0.9, 0.8, 0.85])
        sel, valid = nms.circle_nms(centers, scores, 1.0, 3, 3)
        kept = set(np.asarray(sel)[np.asarray(valid)].tolist())
        assert kept == {0, 2}
