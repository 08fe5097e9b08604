"""Strided sparse conv (ops/sparse_down.py): active-set dilation and values
vs a dense oracle, and the reverse-table custom VJP vs the dense autodiff
gradient.

Reference semantics: spconv SparseConv2d/3d stride>1
(det3d/models/utils/sparse_conv.py:16-39, 66-81).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pillarnext_tpu.ops.compact import compactify, invert_slot_map
from pillarnext_tpu.ops.sparse_down import (
    build_down_neighbor_tables,
    downsample_active_set,
    out_spatial_for,
    sparse_strided_conv,
)


def _scene_3d(rng, b, spatial, cin, n_active, cap):
    rows = b * int(np.prod(spatial))
    ids = rng.choice(rows, size=n_active, replace=False).astype(np.int32)
    pad = np.full((cap - n_active,), rows, np.int32)
    _, _, slot_id, _ = compactify(jnp.asarray(np.concatenate([ids, pad])), rows, cap)
    sod, valid = invert_slot_map(slot_id, rows, cap)
    feats = rng.normal(size=(cap, cin)).astype(np.float32)
    feats[~np.asarray(valid)] = 0.0
    return jnp.asarray(feats), valid, sod, slot_id


def _dense_of(table_cap, sod, b, spatial):
    pad = jnp.concatenate(
        [table_cap, jnp.zeros((1, table_cap.shape[-1]), table_cap.dtype)], axis=0
    )
    return pad[sod].reshape(b, *spatial, -1)


def _dense_oracle(dense_in, kernel_nd, stride, kernel_shape, padding=None):
    """Dense strided conv with spconv padding + dilated-active-set mask."""
    nd = len(kernel_shape)
    if padding is None:
        padding = tuple(k // 2 for k in kernel_shape)
    pads = tuple((p, p) for p in padding)
    dn_in = "N" + "".join("DHW"[3 - nd + i] for i in range(nd)) + "C"
    dn_k = "".join("DHW"[3 - nd + i] for i in range(nd)) + "IO"
    out = jax.lax.conv_general_dilated(
        dense_in, kernel_nd, stride, pads, dimension_numbers=(dn_in, dn_k, dn_in)
    )
    # active-set dilation mask
    active = (jnp.abs(dense_in) > 0).any(-1, keepdims=True).astype(jnp.float32)
    mask = jax.lax.reduce_window(
        active,
        jnp.array(0.0, jnp.float32),
        jax.lax.max,
        (1, *kernel_shape, 1),
        (1, *stride, 1),
        ((0, 0), *pads, (0, 0)),
    )
    return out * mask, mask


@pytest.mark.parametrize(
    "spatial,kshape,stride,padding",
    [
        ((6, 12, 10), (3, 3, 3), (2, 2, 2), None),
        # the reference's extra z-downsample: padding 0 in z
        ((7, 9, 9), (3, 1, 1), (2, 1, 1), (0, 0, 0)),
        ((11, 13), (3, 3), (2, 2), None),  # 2-D strided stage
    ],
)
def test_strided_conv_matches_dense_oracle(spatial, kshape, stride, padding):
    rng = np.random.default_rng(1)
    b, cin, cout = 2, 6, 10
    cap_in, cap_out, n_active = 96, 192, 60
    k = int(np.prod(kshape))

    feats, valid, sod, slot_id = _scene_3d(rng, b, spatial, cin, n_active, cap_in)
    kernel = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.3)

    out_slot_id, out_sod, out_valid, out_sp, _ = downsample_active_set(
        sod, cap_in, b, spatial, kshape, stride, cap_out, padding
    )
    assert out_sp == out_spatial_for(spatial, kshape, stride, padding)
    nbr_fwd, nbr_rev = build_down_neighbor_tables(
        sod, out_slot_id, out_sod, slot_id, b, spatial, kshape, stride, padding
    )
    table = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    y = sparse_strided_conv(table, nbr_fwd, nbr_rev, kernel)

    dense_in = _dense_of(feats, sod, b, spatial)
    kernel_nd = kernel.reshape(*kshape, cin, cout)
    ref, mask = _dense_oracle(dense_in, kernel_nd, stride, kshape, padding)

    # active-set parity: out_valid slots == mask-active dense cells
    got_dense = _dense_of(y, out_sod, b, out_sp)
    np.testing.assert_allclose(np.asarray(got_dense), np.asarray(ref), atol=1e-4)
    n_mask = int(np.asarray(mask).sum())
    assert int(np.asarray(out_valid).sum()) == n_mask
    assert n_mask > n_active / 4  # non-vacuous (padding-0 drops edge sites)


def test_strided_conv_custom_vjp_matches_dense_grads():
    rng = np.random.default_rng(2)
    b, spatial, kshape, stride = 1, (5, 8, 8), (3, 3, 3), (2, 2, 2)
    cin, cout, cap_in, cap_out, n_active = 5, 7, 64, 128, 40
    k = int(np.prod(kshape))

    feats, valid, sod, slot_id = _scene_3d(rng, b, spatial, cin, n_active, cap_in)
    kernel = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.3)
    out_slot_id, out_sod, out_valid, out_sp, _ = downsample_active_set(
        sod, cap_in, b, spatial, kshape, stride, cap_out
    )
    nbr_fwd, nbr_rev = build_down_neighbor_tables(
        sod, out_slot_id, out_sod, slot_id, b, spatial, kshape, stride
    )
    cot = jnp.asarray(rng.normal(size=(cap_out, cout)).astype(np.float32))

    def sparse_loss(f, kern):
        table = jnp.concatenate([f, jnp.zeros((1, cin), f.dtype)], axis=0)
        y = sparse_strided_conv(table, nbr_fwd, nbr_rev, kern)
        return jnp.sum(y * cot)

    def dense_loss(f, kern):
        dense_in = _dense_of(f, sod, b, spatial)
        ref, _ = _dense_oracle(dense_in, kern.reshape(*kshape, cin, cout), stride, kshape)
        cot_dense = _dense_of(cot, out_sod, b, out_sp)
        return jnp.sum(ref * cot_dense)

    gs_f, gs_k = jax.grad(sparse_loss, argnums=(0, 1))(feats, kernel)
    gd_f, gd_k = jax.grad(dense_loss, argnums=(0, 1))(feats, kernel)

    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(gs_f)[v], np.asarray(gd_f)[v], atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs_k), np.asarray(gd_k), atol=1e-4)


def _rev_oracle(in_slot_id, out_sod, batch, in_sp, kshape, stride, padding,
                cap_in, cap_out, out_sp):
    """Coordinate-algebra reverse table (the pre-optimization formulation):
    tap t of output o reads input i  <=>  rev[i, t] = o."""
    import itertools

    if padding is None:
        padding = tuple(k // 2 for k in kshape)
    taps = list(itertools.product(*[range(k) for k in kshape]))
    in_rows = batch * int(np.prod(in_sp))
    out_cell = int(np.prod(out_sp))
    in_cell = int(np.prod(in_sp))
    rev = np.full((cap_in, len(taps)), cap_out, np.int32)
    osod = np.asarray(out_sod)
    for s, d in enumerate(np.asarray(in_slot_id, np.int64)):
        if d >= in_rows:
            continue
        b, rem = divmod(d, in_cell)
        co = []
        for n in in_sp[::-1]:
            co.append(rem % n)
            rem //= n
        co = co[::-1]
        for t_i, t in enumerate(taps):
            oc, ok = [], True
            for i, (k, st) in enumerate(zip(kshape, stride)):
                num = co[i] + padding[i] - t[i]
                if num % st or num < 0 or num // st >= out_sp[i]:
                    ok = False
                    break
                oc.append(num // st)
            if not ok:
                continue
            od = b * out_cell
            mul = 1
            for i in range(len(out_sp) - 1, -1, -1):
                od += oc[i] * mul
                mul *= out_sp[i]
            rev[s, t_i] = osod[od]
    return rev


@pytest.mark.parametrize(
    "b,spatial,kshape,stride,padding,cap_out",
    [
        (2, (14, 18), (3, 3), (2, 2), None, 40),   # output overflow
        (1, (9, 9), (3, 3), (2, 2), None, 64),
        (1, (7, 9, 9), (3, 1, 1), (2, 1, 1), (0, 0, 0), 64),  # 3-D z-down
    ],
)
def test_reverse_table_scatter_adjoint_equals_algebra(
    b, spatial, kshape, stride, padding, cap_out
):
    """nbr_rev is built as the scatter-adjoint of nbr_fwd (rev[i,t]=o <=>
    fwd[o,t]=i); it must equal the per-tap divisibility algebra exactly,
    including capacity-overflow-dropped outputs and unused input slots."""
    rng = np.random.default_rng(3)
    cap_in, n_active = 96, 60
    _, _, sod, slot_id = _scene_3d(rng, b, spatial, 4, n_active, cap_in)
    out_slot_id, out_sod, _, out_sp, _ = downsample_active_set(
        sod, cap_in, b, spatial, kshape, stride, cap_out, padding=padding
    )
    _, rev = build_down_neighbor_tables(
        sod, out_slot_id, out_sod, slot_id, b, spatial, kshape, stride,
        padding=padding,
    )
    want = _rev_oracle(
        slot_id, out_sod, b, spatial, kshape, stride, padding,
        cap_in, cap_out, tuple(int(x) for x in out_sp),
    )
    np.testing.assert_array_equal(np.asarray(rev), want)
