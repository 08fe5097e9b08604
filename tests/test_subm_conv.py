"""Submanifold gather+matmul conv (ops/subm_conv.py): equivalence with a
dense conv at active sites, mirror-transpose custom VJP vs autodiff, and
sparse/dense backbone param-tree interchangeability.

Reference semantics: spconv SubMConv2d (det3d/models/utils/sparse_conv.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pillarnext_tpu.ops.compact import compactify
from pillarnext_tpu.ops.subm_conv import (
    build_neighbor_table,
    subm_conv,
    subm_offsets_2d,
    subm_offsets_3d,
)


def _random_scene(rng, b, h, w, cin, n_active, cap):
    """Random active cells on a (b, h, w) grid -> compact table + maps."""
    hw = h * w
    ids = rng.choice(b * hw, size=n_active, replace=False).astype(np.int32)
    pad = np.full((cap - n_active,), b * hw, np.int32)
    all_ids = jnp.asarray(np.concatenate([ids, pad]))
    order, slot, slot_id, _ = compactify(all_ids, b * hw, cap)

    feats = rng.normal(size=(cap, cin)).astype(np.float32)
    valid = np.asarray(slot_id) < b * hw
    feats[~valid] = 0.0

    shadow = b * hw + np.arange(cap, dtype=np.int32)
    target = np.where(valid, np.asarray(slot_id), shadow)
    sod = np.full((b * hw + cap,), cap, np.int32)
    sod[target] = np.arange(cap, dtype=np.int32)
    return (
        jnp.asarray(feats),
        jnp.asarray(valid),
        jnp.asarray(sod[: b * hw]),
        slot_id,
    )


def _dense_of(table_cap, slot_of_dense, b, h, w):
    pad = jnp.concatenate(
        [table_cap, jnp.zeros((1, table_cap.shape[-1]), table_cap.dtype)], axis=0
    )
    return pad[slot_of_dense].reshape(b, h, w, -1)


@pytest.mark.parametrize("b,h,w", [(1, 16, 16), (2, 9, 13)])
def test_subm_conv_matches_dense_conv_at_active_sites(b, h, w):
    rng = np.random.default_rng(0)
    cin, cout, cap = 8, 16, 64
    n_active = 40
    feats, valid, sod, slot_id = _random_scene(rng, b, h, w, cin, n_active, cap)

    nbr = build_neighbor_table(sod, slot_id, (h, w), subm_offsets_2d(3), cap)
    kernel = jnp.asarray(rng.normal(size=(9, cin, cout)).astype(np.float32))

    table = jnp.concatenate([feats, jnp.zeros((1, cin))], axis=0)
    out_sparse = subm_conv(table, nbr, kernel)

    dense_in = _dense_of(feats, sod, b, h, w)
    khwio = kernel.reshape(3, 3, cin, cout)
    out_dense = jax.lax.conv_general_dilated(
        dense_in, khwio, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ).reshape(b * h * w, cout)

    # compare at active sites (SubM computes nothing elsewhere)
    active_rows = np.asarray(slot_id)[np.asarray(valid)]
    got = np.asarray(out_sparse)[np.asarray(valid)]
    want = np.asarray(out_dense)[active_rows]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_subm_conv_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    b, h, w, cin, cout, cap = 1, 12, 12, 6, 10, 48
    feats, valid, sod, slot_id = _random_scene(rng, b, h, w, cin, cap=cap, n_active=30)
    nbr = build_neighbor_table(sod, slot_id, (h, w), subm_offsets_2d(3), cap)
    kernel = jnp.asarray(rng.normal(size=(9, cin, cout)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(cap, cout)).astype(np.float32))

    def naive(table, kern):
        x = table[nbr.reshape(-1)].reshape(cap, 9 * cin)
        return x @ kern.reshape(9 * cin, cout)

    def custom(table, kern):
        return subm_conv(table, nbr, kern)

    table = jnp.concatenate([feats, jnp.zeros((1, cin))], axis=0)
    out_n, vjp_n = jax.vjp(naive, table, kernel)
    out_c, vjp_c = jax.vjp(custom, table, kernel)
    # rtol 1e-4: the tap-decomposed forward sums taps in a different order
    # than the fused (cap, 9*cin) matmul — f32 reassociation noise only
    np.testing.assert_allclose(
        np.asarray(out_n), np.asarray(out_c), rtol=1e-4, atol=1e-6
    )

    dt_n, dk_n = vjp_n(cot)
    dt_c, dk_c = vjp_c(cot)
    np.testing.assert_allclose(np.asarray(dk_n), np.asarray(dk_c), rtol=1e-4, atol=1e-4)
    # table grads agree on real rows; the dump row's cotangent is
    # intentionally dropped (provably dead downstream — see ops/subm_conv.py)
    np.testing.assert_allclose(
        np.asarray(dt_n)[:-1], np.asarray(dt_c)[:-1], rtol=1e-4, atol=1e-4
    )


def _gather_oracle_build(sod, slot_id, spatial, offsets, cap):
    """Pure per-tap dense-map lookup (the pre-optimization formulation):
    the semantic definition the roll-based fast path must reproduce."""
    ndim = len(spatial)
    sizes = np.asarray(spatial, np.int64)
    strides = np.concatenate(
        [np.cumprod(sizes[::-1])[::-1][1:], [1]]
    ).astype(np.int64)
    cell = int(np.prod(sizes))
    sod = np.asarray(sod)
    out = np.full((len(slot_id), len(offsets)), cap, np.int32)
    for s, d in enumerate(np.asarray(slot_id, np.int64)):
        if d >= len(sod):
            continue
        b, rem = divmod(d, cell)
        co = []
        for i in range(ndim):
            co.append(rem // strides[i])
            rem %= strides[i]
        for k, off in enumerate(offsets):
            ci = [co[i] + off[i] for i in range(ndim)]
            if all(0 <= ci[i] < sizes[i] for i in range(ndim)):
                out[s, k] = sod[b * cell + sum(ci[i] * strides[i] for i in range(ndim))]
    return out


@pytest.mark.parametrize(
    "b,h,w,k,n", [(2, 13, 17, 3, 50), (1, 9, 9, 5, 40), (1, 12, 12, 3, 100)]
)
def test_neighbor_table_roll_fast_path_equals_gather_oracle(b, h, w, k, n):
    """The |dx|<=1 same-row taps use rolls on slot_id instead of dense-map
    gathers (ascending-slot invariant); output must equal the pure-gather
    definition exactly, including row/batch boundaries and unused slots."""
    rng = np.random.default_rng(hash((b, h, w, k)) % 2**32)
    cap = max(n + 14, 64)
    _, _, sod, slot_id = _random_scene(rng, b, h, w, 4, n, cap)
    offs = subm_offsets_2d(k)
    got = np.asarray(build_neighbor_table(sod, slot_id, (h, w), offs, cap))
    want = _gather_oracle_build(sod, slot_id, (h, w), offs, cap)
    np.testing.assert_array_equal(got, want)


def test_neighbor_table_3d_center_tap_is_self():
    rng = np.random.default_rng(2)
    d = h = w = 6
    cap = 32
    ids = rng.choice(d * h * w, size=20, replace=False).astype(np.int32)
    all_ids = jnp.asarray(
        np.concatenate([ids, np.full((cap - 20,), d * h * w, np.int32)])
    )
    order, slot, slot_id, _ = compactify(all_ids, d * h * w, cap)
    valid = np.asarray(slot_id) < d * h * w
    shadow = d * h * w + np.arange(cap, dtype=np.int32)
    target = np.where(valid, np.asarray(slot_id), shadow)
    sod = np.full((d * h * w + cap,), cap, np.int32)
    sod[target] = np.arange(cap, dtype=np.int32)

    offs = subm_offsets_3d(3)
    assert offs.shape == (27, 3) and tuple(offs[13]) == (0, 0, 0)
    nbr = build_neighbor_table(
        jnp.asarray(sod[: d * h * w]), slot_id, (d, h, w), offs, cap
    )
    center = np.asarray(nbr)[:, 13]
    np.testing.assert_array_equal(center[valid], np.arange(cap)[valid])
    assert (center[~valid] == cap).all()


def test_sparse_dense_backbone_param_trees_match():
    """output='sparse' and output='dense' flagship models share one param
    tree -> checkpoints are interchangeable between the two compute paths."""
    from pillarnext_tpu.models.pillar_encoder import PillarFeatureNet
    from pillarnext_tpu.models.resnet import SparseResNet

    common = dict(
        num_input_features=5,
        num_filters=[32, 32],
        voxel_size=[1.0, 1.0, 8.0],
        pc_range=[-8.0, -8.0, -5.0, 8.0, 8.0, 3.0],
        pillar_capacity=64,
    )
    bb = SparseResNet(
        layer_nums=[1, 1],
        ds_layer_strides=[1, 2],
        ds_num_filters=[32, 48],
        num_input_features=32,
        kernel_size=(3, 3),
        out_channels=48,
    )
    pts = jnp.asarray(np.random.default_rng(3).normal(size=(1, 128, 5)) * 4)
    mask = jnp.ones((1, 128), bool)

    trees = {}
    for mode in ("dense", "sparse"):
        rd = PillarFeatureNet(output=mode, **common)

        def fwd(points, m):
            import flax.linen as fnn

            class M(fnn.Module):
                @fnn.compact
                def __call__(self, p, q):
                    return bb.copy(name="backbone")(rd.copy(name="reader")(p, q))

            return M()

        v = fwd(pts, mask).init(jax.random.PRNGKey(0), pts, mask)
        trees[mode] = jax.tree.map(lambda x: (x.shape, str(x.dtype)), v)
    assert jax.tree_util.tree_structure(trees["dense"]) == jax.tree_util.tree_structure(
        trees["sparse"]
    )
    assert trees["dense"] == trees["sparse"]


def test_sparse_train_path_equals_masked_dense_path():
    """The gather-based SubM train path and the masked-dense path produce
    identical features on the active set and identical BN stat updates —
    one param tree, two compute paths (models/resnet.py)."""
    from pillarnext_tpu.models.pillar_encoder import PillarFeatureNet
    from pillarnext_tpu.models.resnet import SparseResNet

    rng = np.random.default_rng(7)
    common = dict(
        num_input_features=5,
        num_filters=[16, 16],
        voxel_size=[1.0, 1.0, 8.0],
        pc_range=[-12.0, -12.0, -5.0, 12.0, 12.0, 3.0],
        pillar_capacity=128,
        output="sparse",
    )
    bb_kw = dict(
        layer_nums=[1, 1],
        ds_layer_strides=[1, 2],
        ds_num_filters=[16, 24],
        num_input_features=16,
        kernel_size=(3, 3),
        out_channels=24,
    )
    pts = jnp.asarray(rng.normal(size=(2, 256, 5)).astype(np.float32) * 6)
    mask = jnp.ones((2, 256), bool)

    import flax.linen as fnn

    class M(fnn.Module):
        force: bool

        @fnn.compact
        def __call__(self, p, q, train=False):
            sb = PillarFeatureNet(**common, name="reader")(p, q, train)
            return SparseResNet(
                **bb_kw, force_dense_train=self.force, name="backbone"
            )(sb, train)

    m_sparse, m_dense = M(False), M(True)
    v = m_sparse.init(jax.random.PRNGKey(0), pts, mask)

    out_s, mut_s = m_sparse.apply(v, pts, mask, True, mutable=["batch_stats"])
    out_d, mut_d = m_dense.apply(v, pts, mask, True, mutable=["batch_stats"])

    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_d), rtol=2e-2, atol=2e-2
    )
    for (ks, vs), (kd, vd) in zip(
        jax.tree_util.tree_leaves_with_path(mut_s["batch_stats"]),
        jax.tree_util.tree_leaves_with_path(mut_d["batch_stats"]),
    ):
        assert ks == kd
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vd), rtol=2e-2, atol=2e-2)


def test_all_sparse_backbone_equals_masked_dense():
    """sparse_stages='all' (whole backbone over compact tables, densify at
    the final grid) must equal the masked-dense path on the SAME params:
    spconv-exact values everywhere, zeros off the active set."""
    from pillarnext_tpu.models.pillar_encoder import PillarFeatureNet
    from pillarnext_tpu.models.resnet import SparseResNet

    rng = np.random.default_rng(11)
    common = dict(
        num_input_features=5,
        num_filters=[16, 16],
        voxel_size=[0.5, 0.5, 8.0],
        pc_range=[-12.0, -12.0, -5.0, 12.0, 12.0, 3.0],
        pillar_capacity=256,
        output="sparse",
    )
    bb_kw = dict(
        layer_nums=[1, 1, 1],
        ds_layer_strides=[1, 2, 2],
        ds_num_filters=[16, 24, 32],
        num_input_features=16,
        kernel_size=(3, 3, 3),
        out_channels=32,
    )
    pts = jnp.asarray(rng.normal(size=(2, 300, 5)).astype(np.float32) * 6)
    mask = jnp.ones((2, 300), bool)

    import flax.linen as fnn

    class M(fnn.Module):
        stages: str
        force: bool = False

        @fnn.compact
        def __call__(self, p, q, train=False):
            sb = PillarFeatureNet(**common, name="reader")(p, q, train)
            return SparseResNet(
                **bb_kw,
                sparse_eval=True,
                sparse_stages_train=self.stages,
                sparse_stages_eval=self.stages,
                force_dense_train=self.force,
                name="backbone",
            )(sb, train)

    m_all = M("all")
    m_masked = M("leading", force=True)  # masked dense everywhere
    v = m_all.init(jax.random.PRNGKey(0), pts, mask)

    out_a = m_all.apply(v, pts, mask, False)
    out_m = m_masked.apply(v, pts, mask, False)
    assert out_a.shape == out_m.shape
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_m), rtol=2e-2, atol=2e-2
    )
    assert float(jnp.abs(out_a).max()) > 0

    # train: grads finite, BN stat updates match the masked-dense path
    def loss(params, model):
        out, mut = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            pts, mask, True, mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2), mut["batch_stats"]

    (la, stats_a), ga = jax.value_and_grad(lambda p: loss(p, m_all), has_aux=True)(v["params"])
    (lm, stats_m), gm = jax.value_and_grad(lambda p: loss(p, m_masked), has_aux=True)(v["params"])
    np.testing.assert_allclose(float(la), float(lm), rtol=2e-2)
    for (ka, va_), (km, vm_) in zip(
        jax.tree_util.tree_leaves_with_path(ga),
        jax.tree_util.tree_leaves_with_path(gm),
    ):
        assert ka == km
        np.testing.assert_allclose(
            np.asarray(va_), np.asarray(vm_), rtol=5e-2, atol=5e-2
        )


def test_leading_down_backbone_equals_masked_dense():
    """'leading+down' (sparse prefix + sparse strided downsample, densify at
    the post-stride grid, masked-dense rest) must equal the fully
    masked-dense path on the SAME params — eval mode."""
    from pillarnext_tpu.models.pillar_encoder import PillarFeatureNet
    from pillarnext_tpu.models.resnet import SparseResNet

    rng = np.random.default_rng(12)
    common = dict(
        num_input_features=5,
        num_filters=[16, 16],
        voxel_size=[0.5, 0.5, 8.0],
        pc_range=[-12.0, -12.0, -5.0, 12.0, 12.0, 3.0],
        pillar_capacity=256,
        output="sparse",
    )
    bb_kw = dict(
        layer_nums=[1, 1, 1],
        ds_layer_strides=[1, 2, 2],
        ds_num_filters=[16, 24, 32],
        num_input_features=16,
        kernel_size=(3, 3, 3),
        out_channels=32,
    )
    pts = jnp.asarray(rng.normal(size=(2, 300, 5)).astype(np.float32) * 6)
    mask = jnp.ones((2, 300), bool)

    import flax.linen as fnn

    class M(fnn.Module):
        stages: str
        force: bool = False

        @fnn.compact
        def __call__(self, p, q, train=False):
            sb = PillarFeatureNet(**common, name="reader")(p, q, train)
            return SparseResNet(
                **bb_kw,
                sparse_eval=True,
                sparse_stages_train=self.stages,
                sparse_stages_eval=self.stages,
                force_dense_train=self.force,
                name="backbone",
            )(sb, train)

    m_hyb = M("leading+down")
    m_masked = M("leading", force=True)  # masked dense everywhere
    v = m_hyb.init(jax.random.PRNGKey(0), pts, mask)

    out_h = m_hyb.apply(v, pts, mask, False)
    out_m = m_masked.apply(v, pts, mask, False)
    assert out_h.shape == out_m.shape
    np.testing.assert_allclose(
        np.asarray(out_h), np.asarray(out_m), rtol=2e-2, atol=2e-2
    )
    assert float(jnp.abs(out_h).max()) > 0


def test_save_conv_out_remat_policy_grads_identical():
    """remat_save_conv_out saves the tagged sparse-conv outputs so the
    backward replay skips every forward gather+matmul (models/resnet.py
    _sparse_remat_policy) — it is a pure scheduling choice and must leave
    gradients EXACTLY unchanged vs the save-nothing remat policy."""
    from pillarnext_tpu.models.pillar_encoder import PillarFeatureNet
    from pillarnext_tpu.models.resnet import SparseResNet

    rng = np.random.default_rng(13)
    common = dict(
        num_input_features=5,
        num_filters=[16, 16],
        voxel_size=[1.0, 1.0, 8.0],
        pc_range=[-12.0, -12.0, -5.0, 12.0, 12.0, 3.0],
        pillar_capacity=128,
        output="sparse",
    )
    bb_kw = dict(
        layer_nums=[1, 1],
        ds_layer_strides=[1, 2],
        ds_num_filters=[16, 24],
        num_input_features=16,
        kernel_size=(3, 3),
        out_channels=24,
        sparse_stages_train="all",
    )
    pts = jnp.asarray(rng.normal(size=(2, 256, 5)).astype(np.float32) * 6)
    mask = jnp.ones((2, 256), bool)

    import flax.linen as fnn

    class M(fnn.Module):
        save: bool

        @fnn.compact
        def __call__(self, p, q, train=False):
            sb = PillarFeatureNet(**common, name="reader")(p, q, train)
            return SparseResNet(
                **bb_kw, remat_save_conv_out=self.save, name="backbone"
            )(sb, train)

    m_on, m_off = M(True), M(False)
    v = m_on.init(jax.random.PRNGKey(0), pts, mask)

    def loss(m, p):
        out, _ = m.apply(
            {**v, "params": p}, pts, mask, True,
            mutable=["batch_stats", "telemetry"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_on = jax.jit(jax.grad(lambda p: loss(m_on, p)))(v["params"])
    g_off = jax.jit(jax.grad(lambda p: loss(m_off, p)))(v["params"])
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_on),
        jax.tree_util.tree_leaves_with_path(g_off),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(kp))
