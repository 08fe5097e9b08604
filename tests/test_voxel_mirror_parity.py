"""Voxel-family parity: the jax sparse 3-D pipeline (VoxelFeatureNet +
SparseResNet3D._sparse_forward) vs the independent torch CPU mirror
(tests/torch_mirror3d.py — explicit gather-based spconv semantics,
reference det3d sparse_resnet3d.py:9-72 / voxel_encoder.py:12-87) with the
SAME weights via utils.torch_import.export_voxelnext.

This is the small-grid leg of the 3-family trained-weight parity ladder
(flagship pillar parity: tools/flagship_parity.py; voxel at config grid:
tools/voxel_parity.py).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))

from torch_mirror3d import SpT, TBackbone3D, subm_conv3d, t_voxelize_mean

from pillarnext_tpu.models.resnet import SparseResNet3D
from pillarnext_tpu.models.voxel_encoder import VoxelFeatureNet
from pillarnext_tpu.utils.torch_import import export_voxelnext

VOXEL = [0.4, 0.4, 0.25]
PC_RANGE = [-6.4, -6.4, -3.0, 6.4, 6.4, 3.0]  # grid 32 x 32 x 24
GRID = (24, 32, 32)  # (D, H, W)
LAYERS = (1, 1, 1, 1)
STRIDES = (1, 2, 2, 2)
FILTERS = (8, 12, 16, 16)
OUT_CH = 16


def make_points(b=2, n=600, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.zeros((b, n, 5), np.float32)
    pts[..., :2] = rng.uniform(-6, 6, (b, n, 2))
    pts[..., 2] = rng.uniform(-2.8, 2.8, (b, n))
    pts[..., 3:] = rng.uniform(0, 1, (b, n, 2))
    mask = rng.uniform(size=(b, n)) < 0.9
    return pts, mask


def _randomize(variables, seed=1):
    """Random params AND BN running stats (so eval BN is a real transform)."""
    rng = np.random.default_rng(seed)

    def rnd(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if x.ndim == 0:
            return x
        if name.endswith("var"):
            return jnp.asarray(rng.uniform(0.5, 2.0, x.shape).astype(np.float32))
        return jnp.asarray(rng.normal(0, 0.3, x.shape).astype(np.float32))

    return jax.tree_util.tree_map_with_path(rnd, variables)


class TestVoxelMirrorParity:
    def _jax_side(self, pts, mask):
        reader = VoxelFeatureNet(
            voxel_size=VOXEL, pc_range=PC_RANGE, voxel_capacity=2048,
            output="sparse",
        )
        bb = SparseResNet3D(
            layer_nums=LAYERS, ds_layer_strides=STRIDES,
            ds_num_filters=FILTERS, num_input_features=5,
            out_channels=OUT_CH,
        )
        sb = reader.apply({}, jnp.asarray(pts), jnp.asarray(mask))
        variables = _randomize(bb.init(jax.random.PRNGKey(0), sb))
        bev = bb.apply(variables, sb)  # (B, H', W', D'*C)
        return variables, np.asarray(bev)

    def test_reader_mean_vfe_matches(self):
        pts, mask = make_points()
        reader = VoxelFeatureNet(
            voxel_size=VOXEL, pc_range=PC_RANGE, voxel_capacity=2048,
            output="sparse",
        )
        sb = reader.apply({}, jnp.asarray(pts), jnp.asarray(mask))
        d, h, w = GRID
        for b in range(pts.shape[0]):
            ids, feats = t_voxelize_mean(
                pts[b][mask[b]], VOXEL, PC_RANGE, GRID
            )
            sod = np.asarray(sb.slot_of_dense).reshape(pts.shape[0], -1)[b]
            jax_ids = np.nonzero(sod < sb.capacity)[0]
            np.testing.assert_array_equal(ids, jax_ids)
            jax_feats = np.asarray(sb.table)[sod[jax_ids]]
            np.testing.assert_allclose(
                feats.numpy(), jax_feats, rtol=2e-5, atol=2e-5
            )

    def test_backbone_matches_torch_mirror(self):
        pts, mask = make_points()
        variables, bev_jax = self._jax_side(pts, mask)
        sd = export_voxelnext(
            {"backbone": variables["params"]},
            {"backbone": variables["batch_stats"]},
            layer_nums=LAYERS, ds_layer_strides=STRIDES,
        )
        tb = TBackbone3D(5, FILTERS, STRIDES, LAYERS, OUT_CH).eval()
        missing, unexpected = tb.load_state_dict(
            {k[len("backbone."):]: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd.items() if k.startswith("backbone.")},
            strict=False,
        )
        assert not unexpected, unexpected
        assert all("num_batches_tracked" in m for m in missing), missing

        for b in range(pts.shape[0]):
            ids, feats = t_voxelize_mean(pts[b][mask[b]], VOXEL, PC_RANGE, GRID)
            with torch.no_grad():
                bev_t = tb(SpT(ids, feats, GRID))  # (1, D'*C, H', W')
            got = bev_t[0].numpy()
            want = np.transpose(bev_jax[b], (2, 0, 1))
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_subm_matches_dense_conv(self):
        """The mirror's gather SubM == a dense conv masked to the active set
        (offset-convention cross-check, independent of the jax side)."""
        rng = np.random.default_rng(3)
        d, h, w = 5, 9, 9
        n = 40
        ids = np.sort(rng.choice(d * h * w, n, replace=False)).astype(np.int64)
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        wt = rng.normal(size=(6, 4, 3, 3, 3)).astype(np.float32) * 0.3

        out = subm_conv3d(SpT(ids, torch.from_numpy(feats), (d, h, w)),
                          torch.from_numpy(wt))
        dense = np.zeros((1, 4, d, h, w), np.float32)
        z, r = np.divmod(ids, h * w)
        y, x = np.divmod(r, w)
        dense[0, :, z, y, x] = feats
        ref = torch.conv3d(torch.from_numpy(dense), torch.from_numpy(wt),
                           padding=1)[0].numpy()
        np.testing.assert_allclose(
            out.feats.numpy(), ref[:, z, y, x].T, rtol=1e-4, atol=1e-5
        )
