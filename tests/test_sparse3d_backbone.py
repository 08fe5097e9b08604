"""Sparse 3-D backbone (SparseResNet3D over a SparseBEV voxel table) vs a
dense masked oracle driven by the SAME parameters.

The oracle replicates spconv semantics densely (tiny grid): SubM blocks =
dense conv + BN + relu re-masked to the input active set; strided blocks
dilate the set; the extra z-downsample uses padding 0
(reference sparse_resnet3d.py:9-72).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pillarnext_tpu.models.resnet import SparseResNet3D
from pillarnext_tpu.models.voxel_encoder import VoxelFeatureNet

VOXEL = [0.4, 0.4, 0.25]
PC_RANGE = [-6.4, -6.4, -3.0, 6.4, 6.4, 3.0]  # grid 32 x 32 x 24
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
    return jnp.asarray(pts), jnp.asarray(mask)


def _randomize(tree, rng, scale=0.4):
    return jax.tree.map(
        lambda x: jnp.asarray(
            rng.normal(0, scale, x.shape).astype(np.float32)
        )
        if x.ndim > 0
        else x,
        tree,
    )


def _bn_eval(x, p, s, eps=1e-3):
    inv = jax.lax.rsqrt(s["var"] + eps) * p["scale"]
    return x * inv + (p["bias"] - s["mean"] * inv)


def _conv(x, kernel, stride, padding):
    return jax.lax.conv_general_dilated(
        x, kernel, stride, padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _dilate(mask, kshape, stride, pads):
    return jax.lax.reduce_window(
        mask, jnp.array(0.0, mask.dtype), jax.lax.max,
        (1, *kshape, 1), (1, *stride, 1), ((0, 0), *pads, (0, 0)),
    )


def dense_oracle(vol, mask, params, stats):
    """Eval-mode dense replica of SparseResNet3D._sparse_forward."""
    x = vol * mask
    for i, (n, s, f) in enumerate(zip(LAYERS, STRIDES, FILTERS)):
        pads3 = ((1, 1), (1, 1), (1, 1))
        if s > 1:
            kd = params[f"stage_{i}_down"]["kernel"]
            x = _conv(x, kd, (s, s, s), pads3)
            mask = _dilate(mask, (3, 3, 3), (s, s, s), pads3)
            x = _bn_eval(
                x, params[f"stage_{i}_down_bn"], stats[f"stage_{i}_down_bn"]
            )
            x = jax.nn.relu(x) * mask
        else:
            blk = params[f"stage_{i}_down"]
            st = stats[f"stage_{i}_down"]
            x = _conv(x, blk["Conv_0"]["kernel"], (1, 1, 1), pads3)
            x = _bn_eval(x, blk["BatchNorm_0"], st["BatchNorm_0"])
            x = jax.nn.relu(x) * mask
        for j in range(n):
            blk = params[f"stage_{i}_block_{j}"]
            st = stats[f"stage_{i}_block_{j}"]
            idn = x
            t = _conv(x, blk["ConvBlock_0"]["Conv_0"]["kernel"], (1, 1, 1), pads3)
            t = _bn_eval(t, blk["ConvBlock_0"]["BatchNorm_0"], st["ConvBlock_0"]["BatchNorm_0"])
            t = jax.nn.relu(t) * mask
            t = _conv(t, blk["Conv_0"]["kernel"], (1, 1, 1), pads3)
            t = _bn_eval(t, blk["BatchNorm_0"], st["BatchNorm_0"])
            x = jax.nn.relu(t + idn) * mask

    padz0 = ((0, 0), (0, 0), (0, 0))
    x = _conv(x, params["extra_conv"]["kernel"], (2, 1, 1), padz0)
    mask = _dilate(mask, (3, 1, 1), (2, 1, 1), padz0)
    x = _bn_eval(x, params["extra_conv_bn"], stats["extra_conv_bn"])
    x = jax.nn.relu(x) * mask

    x = x @ params["mapping"]["kernel"]
    x = _bn_eval(x, params["mapping_bn"], stats["mapping_bn"])
    x = jax.nn.relu(x) * mask

    b, d, h, w, c = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)


class TestSparse3DBackbone:
    def _build(self):
        reader = VoxelFeatureNet(
            voxel_size=VOXEL, pc_range=PC_RANGE, voxel_capacity=2048,
            output="sparse",
        )
        bb = SparseResNet3D(
            layer_nums=LAYERS,
            ds_layer_strides=STRIDES,
            ds_num_filters=FILTERS,
            num_input_features=5,
            out_channels=OUT_CH,
        )
        return reader, bb

    def test_matches_dense_masked_oracle(self):
        reader, bb = self._build()
        pts, mask = make_points()
        sb = reader.apply({}, pts, mask)
        variables = bb.init(jax.random.PRNGKey(0), sb)

        # perturb BN stats so the oracle is non-trivial (gently: a large
        # running mean with zero bias would relu away every activation)
        rng = np.random.default_rng(7)
        params = variables["params"]

        def perturb(path, x):
            leaf = path[-1].key
            if leaf == "mean":
                return jnp.asarray(rng.normal(0, 0.05, x.shape).astype(np.float32))
            return jnp.asarray(rng.uniform(0.8, 1.3, x.shape).astype(np.float32))

        stats = jax.tree_util.tree_map_with_path(perturb, variables["batch_stats"])
        out = bb.apply({"params": params, "batch_stats": stats}, sb)

        dense_reader = VoxelFeatureNet(
            voxel_size=VOXEL, pc_range=PC_RANGE, output="dense"
        )
        vol = dense_reader.apply({}, pts, mask)
        occ = (jnp.abs(vol) > 0).any(-1, keepdims=True).astype(jnp.float32)
        ref = dense_oracle(vol, occ, params, stats)

        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
        assert float(jnp.abs(out).max()) > 0  # non-vacuous

    def test_train_step_grads_finite(self):
        reader, bb = self._build()
        pts, mask = make_points(seed=3)
        sb = reader.apply({}, pts, mask)
        variables = bb.init(jax.random.PRNGKey(1), sb)

        def loss_fn(p):
            out, mut = bb.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                sb, True, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        val, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(val))
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
