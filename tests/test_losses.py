"""Golden tests for the CenterPoint losses (reference centerloss.py math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillarnext_tpu.models import losses


class TestFastFocal:
    def test_perfect_prediction_near_zero(self):
        h = w = 4
        target = np.zeros((1, h, w, 1), np.float32)
        target[0, 2, 1, 0] = 1.0
        out = np.full((1, h, w, 1), 1e-4, np.float32)
        out[0, 2, 1, 0] = 1 - 1e-4
        ind = jnp.array([[2 * w + 1]])
        mask = jnp.array([[1]], jnp.uint8)
        cat = jnp.array([[0]])
        loss = losses.fast_focal_loss(jnp.asarray(out), jnp.asarray(target), ind, mask, cat)
        assert float(loss) < 1e-2

    def test_hand_computed_single_pixel(self):
        # 1x1 map: target 0.5 (gaussian tail), pred 0.3, no positives ->
        # loss = -neg = -(0.3^2 * (1-0.5)^4 * log(0.7))
        target = jnp.full((1, 1, 1, 1), 0.5)
        out = jnp.full((1, 1, 1, 1), 0.3)
        ind = jnp.zeros((1, 1), jnp.int32)
        mask = jnp.zeros((1, 1), jnp.uint8)
        cat = jnp.zeros((1, 1), jnp.int32)
        expected = -(0.3**2) * (0.5**4) * np.log(0.7)
        np.testing.assert_allclose(
            float(losses.fast_focal_loss(out, target, ind, mask, cat)),
            expected,
            rtol=1e-5,
        )

    def test_positive_pixel_normalized_by_num_pos(self):
        # 2 positives -> loss divided by 2 (centerloss.py:29-36)
        h = w = 2
        target = np.zeros((1, h, w, 1), np.float32)
        target[0, 0, 0, 0] = 1.0
        target[0, 1, 1, 0] = 1.0
        out = np.full((1, h, w, 1), 1e-4, np.float32)
        out[0, 0, 0, 0] = 0.6
        out[0, 1, 1, 0] = 0.6
        ind = jnp.array([[0, 3]])
        mask = jnp.array([[1, 1]], jnp.uint8)
        cat = jnp.array([[0, 0]])
        # pos: 2 * log(0.6) * (0.4)^2 ; neg: 2 cells with out=1e-4, target=0
        neg = 2 * (1e-4**2) * np.log(1 - 1e-4)
        pos = 2 * np.log(0.6) * 0.4**2
        expected = -(pos + neg) / 2
        np.testing.assert_allclose(
            float(losses.fast_focal_loss(jnp.asarray(out), jnp.asarray(target), ind, mask, cat)),
            expected,
            rtol=1e-5,
        )


class TestRegLoss:
    def test_masked_l1_per_dim(self):
        h = w = 2
        out = np.zeros((1, h, w, 2), np.float32)
        out[0, 0, 1] = [1.0, 2.0]   # ind 1
        out[0, 1, 0] = [5.0, 5.0]   # ind 2 (masked out)
        ind = jnp.array([[1, 2]])
        mask = jnp.array([[1, 0]], jnp.uint8)
        target = jnp.array([[[0.5, 2.5], [0.0, 0.0]]], jnp.float32)
        loss = losses.reg_loss(jnp.asarray(out), mask, ind, target)
        # |1-0.5| and |2-2.5| over 1 positive -> [0.5, 0.5] / (1 + 1e-4)
        np.testing.assert_allclose(np.asarray(loss), [0.5, 0.5], rtol=1e-3)

    def test_nan_targets_contribute_zero_and_zero_grad(self):
        out = jnp.ones((1, 2, 2, 2), jnp.float32)
        ind = jnp.array([[1]])
        mask = jnp.array([[1]], jnp.uint8)
        target = jnp.array([[[np.nan, 0.0]]], jnp.float32)

        def f(o):
            return losses.reg_loss(o, mask, ind, target).sum()

        loss, grad = jax.value_and_grad(f)(out)
        assert np.isfinite(float(loss))
        # the NaN slot must contribute 0 loss and 0 grad; the real slot |1-0|
        np.testing.assert_allclose(float(loss), 1.0 / (1 + 1e-4), rtol=1e-3)
        assert np.isfinite(np.asarray(grad)).all()
        assert np.asarray(grad)[0, 0, 1, 0] == 0.0  # NaN-target channel
        assert np.asarray(grad)[0, 0, 1, 1] != 0.0


class TestIouLosses:
    def test_iou_pred_loss_target_mapping(self):
        # pred box == gt box -> IoU 1 -> target = 2*1-1 = 1
        box = np.array([[[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3]]], np.float32)
        iou_out = np.zeros((1, 1, 1, 1), np.float32)  # predicts 0
        ind = jnp.array([[0]])
        mask = jnp.array([[1]], jnp.uint8)
        loss = losses.iou_pred_loss(
            jnp.asarray(iou_out), mask, ind, jnp.asarray(box), jnp.asarray(box)
        )
        np.testing.assert_allclose(float(loss), 1.0, atol=1e-3)  # |0 - 1|

    def test_iou_reg_loss_perfect_is_zero(self):
        box = jnp.asarray(np.array([[[0, 0, 0, 2, 2, 2, 0.5]]], np.float32))
        mask = jnp.array([[1]], jnp.uint8)
        loss = losses.iou_reg_loss(box, mask, box)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-4)  # 1 - DIoU(==1)

    def test_empty_mask_zero(self):
        box = jnp.zeros((1, 1, 7), jnp.float32)
        mask = jnp.zeros((1, 1), jnp.uint8)
        assert float(losses.iou_reg_loss(box, mask, box)) == 0.0
        iou_out = jnp.zeros((1, 1, 1, 1), jnp.float32)
        assert float(losses.iou_pred_loss(iou_out, mask, jnp.array([[0]]), box, box)) == 0.0
