"""Pallas IoU tile kernel vs the XLA polygon-clip path (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from pillarnext_tpu.core import jax_box_ops
from pillarnext_tpu.ops.pallas_iou import boxes_iou_bev_pallas


def _rand_boxes(n, rng, span=10.0):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, :2] = rng.uniform(-span, span, (n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n)
    boxes[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


class TestPallasIou:
    def test_matches_xla_path(self):
        rng = np.random.default_rng(5)
        a = _rand_boxes(100, rng)  # non-multiple of the 128 tile -> padding
        b = _rand_boxes(170, rng)
        ours = np.asarray(
            boxes_iou_bev_pallas(jnp.asarray(a), jnp.asarray(b), interpret=True)
        )
        ref = np.asarray(jax_box_ops.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        assert ours.shape == (100, 170)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_identity_diag(self):
        rng = np.random.default_rng(6)
        a = _rand_boxes(32, rng)
        iou = np.asarray(boxes_iou_bev_pallas(jnp.asarray(a), jnp.asarray(a), interpret=True))
        np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)

    def test_padding_rows_zero(self):
        rng = np.random.default_rng(7)
        a = _rand_boxes(3, rng)
        iou = np.asarray(boxes_iou_bev_pallas(jnp.asarray(a), jnp.asarray(a), interpret=True))
        assert iou.shape == (3, 3)
        assert np.isfinite(iou).all()
