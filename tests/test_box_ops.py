"""Golden tests for host-side box geometry (pillarnext_tpu/core/box_ops.py)."""

import numpy as np
import pytest

from pillarnext_tpu.core import box_ops, native_geometry


def _rand_boxes(n, rng, dim=7, span=20.0):
    boxes = np.zeros((n, dim), dtype=np.float32)
    boxes[:, :2] = rng.uniform(-span, span, (n, 2))
    boxes[:, 2] = rng.uniform(-2, 2, n)
    boxes[:, 3:6] = rng.uniform(0.5, 6.0, (n, 3))
    boxes[:, -1] = rng.uniform(-np.pi, np.pi, n)
    if dim > 7:
        boxes[:, 6:8] = rng.uniform(-5, 5, (n, 2))
    return boxes


class TestFlipRotateScale:
    def test_flip_x_negates_y_yaw_vy(self):
        b = np.array([[1.0, 2.0, 0.5, 4, 2, 1.5, 3.0, -1.0, 0.3]], np.float32)
        out = box_ops.flip(b.copy(), axis="x")
        np.testing.assert_allclose(out[0, :3], [1.0, -2.0, 0.5])
        assert out[0, 8] == pytest.approx(-0.3)
        assert out[0, 7] == pytest.approx(1.0)
        assert out[0, 6] == pytest.approx(3.0)

    def test_flip_y_negates_x_vx_and_mirrors_yaw(self):
        b = np.array([[1.0, 2.0, 0.5, 4, 2, 1.5, 3.0, -1.0, 0.3]], np.float32)
        out = box_ops.flip(b.copy(), axis="y")
        assert out[0, 0] == pytest.approx(-1.0)
        assert out[0, 6] == pytest.approx(-3.0)
        assert out[0, 8] == pytest.approx(np.pi - 0.3)

    def test_yaw_wraps_into_pi_range(self):
        b = np.array([[0, 0, 0, 1, 1, 1, 3.0]], np.float32)
        out = box_ops.flip(b.copy(), axis="y")  # pi - 3.0 stays in range
        assert -np.pi < out[0, -1] <= np.pi
        b2 = np.array([[0, 0, 0, 1, 1, 1, -3.0]], np.float32)
        out2 = box_ops.flip(b2.copy(), axis="y")  # pi + 3.0 wraps
        assert -np.pi <= out2[0, -1] <= np.pi

    def test_rotate_moves_center_velocity_and_heading(self):
        b = np.array([[1.0, 0.0, 0.0, 2, 1, 1, 1.0, 0.0, 0.0]], np.float32)
        out = box_ops.rotate(b.copy(), np.pi / 2)
        np.testing.assert_allclose(out[0, :2], [0.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(out[0, 6:8], [0.0, 1.0], atol=1e-6)
        assert out[0, -1] == pytest.approx(np.pi / 2)

    def test_scaling_spares_yaw(self):
        b = np.array([[1.0, 2.0, 3.0, 4, 2, 1.5, 0.7]], np.float32)
        out = box_ops.scaling(b.copy(), 2.0)
        np.testing.assert_allclose(out[0, :6], [2, 4, 6, 8, 4, 3])
        assert out[0, -1] == pytest.approx(0.7)


class TestCorners:
    def test_axis_aligned_corners(self):
        b = np.array([[0.0, 0.0, 4.0, 2.0, 0.0]], np.float32)  # cx cy dx dy yaw
        corners = box_ops.center_to_corner_box2d(b)
        expected = {(-2, -1), (-2, 1), (2, 1), (2, -1)}
        got = {tuple(np.round(c, 5)) for c in corners[0]}
        assert got == expected

    def test_rotated_corner_positions(self):
        b = np.array([[0.0, 0.0, 4.0, 2.0, np.pi / 2]], np.float32)
        corners = box_ops.center_to_corner_box2d(b)
        got = {tuple(np.round(c, 5)) for c in corners[0]}
        assert got == {(1, -2), (1, 2), (-1, 2), (-1, -2)}

    def test_standup(self):
        b = np.array([[3.0, 4.0, 4.0, 2.0, 0.3]], np.float32)
        su = box_ops.corner_to_standup_nd(box_ops.center_to_corner_box2d(b))
        assert su.shape == (1, 4)
        assert su[0, 0] < 3 < su[0, 2] and su[0, 1] < 4 < su[0, 3]


class TestPointsInRbbox:
    def test_golden_rotated_box(self):
        # 4x2x2 box centered at origin rotated 90deg: extents swap to 2x4
        boxes = np.array([[0, 0, 0, 4, 2, 2, np.pi / 2]], np.float32)
        pts = np.array(
            [[0.0, 1.9, 0], [1.9, 0, 0], [0, 0, 0.9], [0, 0, 1.1], [0.9, 0, 0]],
            np.float32,
        )
        ind = box_ops.points_in_rbbox_np(pts, boxes)[:, 0]
        np.testing.assert_array_equal(ind, [True, False, True, False, True])

    def test_native_matches_numpy(self):
        if not native_geometry.available():
            pytest.skip("native lib not built")
        rng = np.random.default_rng(0)
        pts = rng.uniform(-25, 25, (2000, 5)).astype(np.float32)
        boxes = _rand_boxes(30, rng)
        np.testing.assert_array_equal(
            native_geometry.points_in_rbbox(pts, boxes),
            box_ops.points_in_rbbox_np(pts, boxes),
        )


class TestBoxCollision:
    def test_overlapping_and_disjoint(self):
        a = box_ops.center_to_corner_box2d(
            np.array([[0, 0, 4, 2, 0.0], [10, 10, 2, 2, 0.5]], np.float32)
        )
        b = box_ops.center_to_corner_box2d(
            np.array([[1, 0, 4, 2, 0.3], [0, 0, 0.5, 0.5, 0.0]], np.float32)
        )
        coll = box_ops.box_collision_test_np(a, b)
        assert coll[0, 0]  # overlapping rotated pair
        assert coll[0, 1]  # tiny box fully inside big box
        assert not coll[1, 0] and not coll[1, 1]  # far away box

    def test_native_matches_numpy(self):
        if not native_geometry.available():
            pytest.skip("native lib not built")
        rng = np.random.default_rng(1)
        boxes_a = _rand_boxes(40, rng, span=12.0)
        boxes_b = _rand_boxes(40, rng, span=12.0)
        ca = box_ops.center_to_corner_box2d(boxes_a[:, [0, 1, 3, 4, 6]])
        cb = box_ops.center_to_corner_box2d(boxes_b[:, [0, 1, 3, 4, 6]])
        np.testing.assert_array_equal(
            native_geometry.box_collision_test(ca, cb),
            box_ops.box_collision_test_np(ca, cb),
        )
