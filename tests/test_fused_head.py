"""Fused head execution (SepHead.fuse_eval) equivalence.

The fused eval path assembles a merged conv1 and a BLOCK-DIAGONAL final
conv from the standard per-branch MLPHead params (models/centerhead.py
SepHead._fused_branches; on-chip A/B in tools/head_bank_probe.py: 7.06 ms
vs 13.31 ms at flagship shapes).  These tests pin:

  1. identical variable trees AND identical init values vs the separate
     path (same scope paths -> same rng folding),
  2. numerical equivalence of every branch output (dense and the
     candidate-sparse only=/patch_mask path),
  3. identical end-to-end CenterHead predict detections.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pillarnext_tpu.models.centerhead import CenterHead, SepHead

HEADS = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2),
         "vel": (2, 2), "hm": (2, 2)}


def _randomized_variables(module, x, seed=1):
    v = module.init(jax.random.PRNGKey(0), x)
    rng = np.random.default_rng(seed)
    # randomize every vector (BN scale/bias/stats + conv biases) so eval BN
    # and biases are nontrivial; keep conv kernels at their init values
    return jax.tree.map(
        lambda a: jnp.asarray(
            (rng.normal(0.2, 0.7, a.shape) ** 2 + 0.1).astype(np.float32)
        )
        if a.ndim == 1
        else a,
        v,
    )


class TestSepHeadFused:
    def test_variable_tree_and_init_identical(self):
        x = jnp.zeros((1, 8, 8, 64), jnp.float32)
        vf = SepHead(HEADS, stride=2, fuse_eval=True).init(jax.random.PRNGKey(0), x)
        vs = SepHead(HEADS, stride=2, fuse_eval=False).init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vs)
        for (kf, af), (ks, as_) in zip(
            jax.tree_util.tree_flatten_with_path(vf)[0],
            jax.tree_util.tree_flatten_with_path(vs)[0],
        ):
            assert kf == ks
            np.testing.assert_array_equal(np.asarray(af), np.asarray(as_),
                                          err_msg=jax.tree_util.keystr(kf))

    def test_dense_outputs_equivalent(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (2, 12, 12, 64)).astype(np.float32))
        sf = SepHead(HEADS, stride=2, fuse_eval=True)
        ss = SepHead(HEADS, stride=2, fuse_eval=False)
        v = _randomized_variables(sf, x)
        of, os_ = sf.apply(v, x), ss.apply(v, x)
        for name in HEADS:
            np.testing.assert_allclose(
                np.asarray(of[name]), np.asarray(os_[name]), atol=2e-5,
                err_msg=name,
            )

    def test_patch_path_equivalent(self):
        """only= + skip_deblock + patch_mask (the candidate-sparse route)."""
        rng = np.random.default_rng(2)
        sf = SepHead(HEADS, stride=2, fuse_eval=True)
        ss = SepHead(HEADS, stride=2, fuse_eval=False)
        v = _randomized_variables(sf, jnp.zeros((1, 8, 8, 64), jnp.float32))
        patches = jnp.asarray(rng.normal(0, 1, (5, 5, 5, 64)).astype(np.float32))
        pm = jnp.asarray((rng.uniform(0, 1, (5, 5, 5, 1)) > 0.3).astype(np.float32))
        only = ("dim", "rot", "vel")
        pf = sf.apply(v, patches, False, only, True, False, pm)
        ps = ss.apply(v, patches, False, only, True, False, pm)
        assert set(pf) == set(only)
        for name in only:
            np.testing.assert_allclose(
                np.asarray(pf[name]), np.asarray(ps[name]), atol=2e-5,
                err_msg=name,
            )


class TestCenterHeadFusedPredict:
    @pytest.mark.parametrize("candidate_sparse", [False, True])
    def test_predict_detections_identical(self, candidate_sparse):
        tasks = [["car"], ["pedestrian", "traffic_cone"]]
        test_cfg = {
            "post_center_limit_range": [-60, -60, -10, 60, 60, 10],
            "max_per_img": 32,
            "nms": {
                "nms_pre_max_size": 64,
                "nms_post_max_size": 16,
                "nms_iou_threshold": [[0.2], [0.2, 0.2]],
            },
            "score_threshold": 0.1,
            "pc_range": [-20, -20],
            "voxel_size": [0.5, 0.5],
            "out_size_factor": [4, 4],
            "candidate_sparse_head": candidate_sparse,
        }
        common = {k: list(v) for k, v in HEADS.items() if k != "hm"}
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 1.5, (2, 10, 10, 32)).astype(np.float32))
        outs = {}
        for fuse in (True, False):
            head = CenterHead(
                in_channels=32, tasks=tasks, weight=0.25,
                code_weights=[1.0] * 10, common_heads=common,
                strides=[2, 2], rectifier=[[0.5], [0.5, 0.5]],
                voxel_size=[0.5, 0.5], pc_range=[-20, -20, -3, 20, 20, 3],
                out_size_factor=[4, 4], fuse_eval=fuse,
            )
            v = head.init(jax.random.PRNGKey(0), x)
            rng2 = np.random.default_rng(7)
            v = jax.tree.map(
                lambda a: jnp.asarray(
                    (rng2.normal(0.3, 0.5, a.shape) ** 2 + 0.05).astype(np.float32)
                )
                if a.ndim == 1
                else a,
                v,
            )
            outs[fuse] = jax.jit(
                lambda v, x, head=head: head.apply(v, x, False, test_cfg)
            )(v, x)
        a, b = outs[True], outs[False]
        np.testing.assert_array_equal(np.asarray(a["valid"]), np.asarray(b["valid"]))
        va = np.asarray(a["valid"])
        np.testing.assert_array_equal(
            np.asarray(a["label_preds"])[va], np.asarray(b["label_preds"])[va]
        )
        np.testing.assert_allclose(
            np.asarray(a["scores"])[va], np.asarray(b["scores"])[va], atol=1e-5
        )
        # rtol term: dims are exp(logit) — a ~2e-5 logit difference scales
        # with the (randomized-BN-inflated) dim value
        np.testing.assert_allclose(
            np.asarray(a["box3d_lidar"])[va], np.asarray(b["box3d_lidar"])[va],
            rtol=1e-4, atol=1e-4,
        )
