"""Fused two-layer PFN Pallas kernel (ops/pallas_pfn.py) vs the XLA
PillarFeatureNet path — interpret mode, CPU.

The kernel replays the decorate -> Dense/BN/ReLU -> pillar-max -> concat ->
Dense/BN/ReLU -> pillar-max chain (reference semantics
det3d/models/readers/pillar_encoder.py:25-50,98-123) on sorted point
streams.  On chip the two paths agree to <= 1 bf16 ulp (0-68 / 6.3M elements
at flagship depending on XLA's compile-time fusion choices,
tools/pallas_pfn_probe.py — XLA's --xla_allow_excess_precision
keeps f32 through the Dense->BN convert where the kernel rounds); under the
CPU interpreter the same class of f32 reassociation noise applies, so these
tests assert a tight elementwise tolerance plus exact structural agreement
(zero rows exactly where the XLA path has them).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pillarnext_tpu.models.pillar_encoder import PillarFeatureNet
from pillarnext_tpu.utils.synth import lidar_like_points

PC = (-25.0, -25.0, -5.0, 25.0, 25.0, 3.0)
VS = (0.4, 0.4, 8.0)


def _tables(net, pts, mask):
    """(fused, xla) compact tables for the same variables/inputs."""
    v = net.init(jax.random.PRNGKey(0), pts, mask)
    os.environ["PNX_PALLAS_PFN"] = "interpret"
    try:
        t_f = np.asarray(net.apply(v, pts, mask).table, np.float32)
    finally:
        os.environ["PNX_PALLAS_PFN"] = "0"
    t_x = np.asarray(net.apply(v, pts, mask).table, np.float32)
    os.environ.pop("PNX_PALLAS_PFN", None)
    return t_f, t_x


def _assert_close(t_f, t_x):
    # structural: active rows (and the dump row) agree exactly
    np.testing.assert_array_equal(
        np.abs(t_f).sum(-1) == 0, np.abs(t_x).sum(-1) == 0
    )
    np.testing.assert_allclose(t_f, t_x, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("batch,npts", [(1, 3000), (2, 5000)])
def test_fused_matches_xla_f32(batch, npts):
    net = PillarFeatureNet(
        num_input_features=5, num_filters=(16, 16), voxel_size=VS,
        pc_range=PC, pillar_capacity=4096, dtype=None, output="sparse",
    )
    pts, mask = lidar_like_points(batch, npts, PC, seed=0)
    t_f, t_x = _tables(net, jnp.asarray(pts), jnp.asarray(mask))
    assert t_f.shape == (4096 * batch + 1, 16)
    _assert_close(t_f, t_x)
    assert np.abs(t_f[-1]).max() == 0.0  # dump row exactly zero


def test_fused_matches_xla_bf16():
    net = PillarFeatureNet(
        num_input_features=5, num_filters=(16, 16), voxel_size=VS,
        pc_range=PC, pillar_capacity=4096, dtype=jnp.bfloat16, output="sparse",
    )
    pts, mask = lidar_like_points(1, 4000, PC, seed=1)
    t_f, t_x = _tables(net, jnp.asarray(pts), jnp.asarray(mask))
    # bf16: agree to 1 ulp of the activation magnitude
    _assert_close(t_f.astype(np.float32), t_x.astype(np.float32))


def test_fused_capacity_overflow_marks_dump():
    """Overflowing pillars (slot == cap) must not corrupt real rows."""
    net = PillarFeatureNet(
        num_input_features=5, num_filters=(16, 16), voxel_size=VS,
        pc_range=PC, pillar_capacity=64, dtype=None, output="sparse",
    )
    pts, mask = lidar_like_points(1, 3000, PC, seed=2)
    t_f, t_x = _tables(net, jnp.asarray(pts), jnp.asarray(mask))
    _assert_close(t_f, t_x)


def test_fused_handles_fully_masked_sample():
    net = PillarFeatureNet(
        num_input_features=5, num_filters=(16, 16), voxel_size=VS,
        pc_range=PC, pillar_capacity=256, dtype=None, output="sparse",
    )
    pts, mask = lidar_like_points(2, 2000, PC, seed=3)
    mask = mask.copy()
    mask[1] = False
    t_f, t_x = _tables(net, jnp.asarray(pts), jnp.asarray(mask))
    _assert_close(t_f, t_x)


def test_env_gate():
    from pillarnext_tpu.ops.pallas_pfn import pallas_pfn_enabled

    os.environ["PNX_PALLAS_PFN"] = "0"
    assert not pallas_pfn_enabled()
    os.environ["PNX_PALLAS_PFN"] = "interpret"
    assert pallas_pfn_enabled()
    os.environ.pop("PNX_PALLAS_PFN", None)
    # auto on CPU: off (kernel is TPU-only outside interpret mode)
    assert not pallas_pfn_enabled()
