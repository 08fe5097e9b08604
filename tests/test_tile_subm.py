"""Tile-stack SubM convolution (ops/tile_subm.py) vs the per-site sparse
path (ops/subm_conv.py, itself dense-oracle-verified in test_subm_conv.py):
values AND gradients must agree on the active set, and the tile machinery
(pack / halo / densify) must be exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pillarnext_tpu.models.resnet import _SparseStage, _TileStage
from pillarnext_tpu.ops.compact import compactify, invert_slot_map
from pillarnext_tpu.ops.sparse_bev import SparseBEV
from pillarnext_tpu.ops.subm_conv import build_neighbor_table, subm_offsets_2d
from pillarnext_tpu.ops.tile_subm import (
    build_tile_map,
    halo_gather,
    pack_stack,
    stack_to_dense,
    unpack_stack,
)


def make_sbev(seed=0, batch=2, h=32, w=32, c=8, n_active=180, cap=256):
    rng = np.random.default_rng(seed)
    ids = np.unique(rng.integers(0, batch * h * w, n_active)).astype(np.int32)
    feats = rng.normal(size=(len(ids), c)).astype(np.float32)
    dense_ids = np.full((batch * h * w,), batch * h * w, np.int32)
    order, slot, slot_id, _ = compactify(
        jnp.asarray(np.concatenate([ids, np.full(cap - len(ids), batch * h * w, np.int32)])),
        batch * h * w,
        cap,
    )
    # build table directly: slot of each id
    sod, valid = invert_slot_map(slot_id, batch * h * w, cap)
    table = np.zeros((cap + 1, c), np.float32)
    id_to_row = {int(i): k for k, i in enumerate(ids)}
    for s in range(cap):
        d = int(slot_id[s])
        if d < batch * h * w:
            table[s] = feats[id_to_row[d]]
    return SparseBEV(
        table=jnp.asarray(table),
        valid=valid,
        slot_of_dense=sod,
        slot_id=slot_id,
        batch=batch,
        spatial=(h, w),
    )


class TestTileMachinery:
    def test_pack_unpack_roundtrip(self):
        sb = make_sbev()
        tm = build_tile_map(
            sb.slot_of_dense, sb.slot_id, sb.batch, sb.spatial, sb.capacity, 8, 64
        )
        stack = pack_stack(sb.table, tm)
        back = unpack_stack(stack, tm)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(sb.table[:-1]))

    def test_stack_to_dense_matches_densify(self):
        sb = make_sbev(seed=1)
        tm = build_tile_map(
            sb.slot_of_dense, sb.slot_id, sb.batch, sb.spatial, sb.capacity, 8, 64
        )
        stack = pack_stack(sb.table, tm)
        np.testing.assert_array_equal(
            np.asarray(stack_to_dense(stack, tm)), np.asarray(sb.to_dense())
        )

    def test_halo_gather_matches_dense_window(self):
        sb = make_sbev(seed=2)
        t = 8
        tm = build_tile_map(
            sb.slot_of_dense, sb.slot_id, sb.batch, sb.spatial, sb.capacity, t, 64
        )
        stack = pack_stack(sb.table, tm)
        halo = np.asarray(halo_gather(stack, tm.nbr))
        dense = np.asarray(sb.to_dense())  # (B,H,W,C)
        b, h, w, c = dense.shape
        padded = np.zeros((b, h + 2, w + 2, c), dense.dtype)
        padded[:, 1:-1, 1:-1] = dense
        tw = w // t
        for s in range(tm.cap):
            tid = int(tm.tile_id[s])
            if tid >= b * (h // t) * tw:
                continue
            bi, rem = divmod(tid, (h // t) * tw)
            ty, tx = divmod(rem, tw)
            ref = padded[bi, ty * t : ty * t + t + 2, tx * t : tx * t + t + 2]
            np.testing.assert_array_equal(halo[s], ref, err_msg=f"tile {s}")

    def test_tile_overflow_counts(self):
        sb = make_sbev(seed=3)
        tm_full = build_tile_map(
            sb.slot_of_dense, sb.slot_id, sb.batch, sb.spatial, sb.capacity, 8, 64
        )
        n = int(tm_full.n_tiles)
        assert n > 4
        tm_small = build_tile_map(
            sb.slot_of_dense, sb.slot_id, sb.batch, sb.spatial, sb.capacity, 8, 4
        )
        assert int(tm_small.n_tiles) == n  # true count reported regardless


class TestTileStageEquivalence:
    @pytest.mark.parametrize("train", [False, True])
    def test_matches_sparse_stage(self, train):
        sb = make_sbev(seed=4, c=8)
        nbr = build_neighbor_table(
            sb.slot_of_dense, sb.slot_id, sb.spatial, subm_offsets_2d(3), sb.capacity
        )
        tm = build_tile_map(
            sb.slot_of_dense, sb.slot_id, sb.batch, sb.spatial, sb.capacity, 8, 64
        )
        sparse = _SparseStage(16, 3, 2, name="stage_0")
        tile = _TileStage(16, 3, 2, name="stage_0")
        variables = sparse.init(
            jax.random.PRNGKey(0), sb.table[:-1], sb.valid, nbr, False
        )

        def run_sparse(v, table):
            out, upd = sparse.apply(
                v, table, sb.valid, nbr, train, mutable=["batch_stats"]
            )
            return out

        def run_tile(v, table):
            stack = pack_stack(
                jnp.concatenate([table, jnp.zeros((1, table.shape[-1]))]), tm
            )
            out, upd = tile.apply(
                v, stack, tm.out_mask, tm.nbr, train, mutable=["batch_stats"]
            )
            return unpack_stack(out, tm)

        a = np.asarray(run_sparse(variables, sb.table[:-1]))
        b = np.asarray(run_tile(variables, sb.table[:-1]))
        valid = np.asarray(sb.valid)
        np.testing.assert_allclose(a[valid], b[valid], rtol=1e-5, atol=1e-5)
        # inactive rows stay exactly zero in both paths
        assert np.abs(b[~valid]).max() == 0.0

    def test_gradients_match(self):
        sb = make_sbev(seed=5, c=8)
        nbr = build_neighbor_table(
            sb.slot_of_dense, sb.slot_id, sb.spatial, subm_offsets_2d(3), sb.capacity
        )
        tm = build_tile_map(
            sb.slot_of_dense, sb.slot_id, sb.batch, sb.spatial, sb.capacity, 8, 64
        )
        sparse = _SparseStage(8, 3, 1, name="stage_0")
        tile = _TileStage(8, 3, 1, name="stage_0")
        variables = sparse.init(
            jax.random.PRNGKey(1), sb.table[:-1], sb.valid, nbr, False
        )
        vmask = np.asarray(sb.valid)
        cot = jnp.asarray(
            np.random.default_rng(9).normal(size=(sb.capacity, 8)).astype(np.float32)
            * vmask[:, None]
        )

        def loss_sparse(v, table):
            out, _ = sparse.apply(v, table, sb.valid, nbr, True, mutable=["batch_stats"])
            return (out * cot).sum()

        def loss_tile(v, table):
            stack = pack_stack(
                jnp.concatenate([table, jnp.zeros((1, table.shape[-1]))]), tm
            )
            out, _ = tile.apply(v, stack, tm.out_mask, tm.nbr, True, mutable=["batch_stats"])
            return (unpack_stack(out, tm) * cot).sum()

        gs_v, gs_t = jax.grad(loss_sparse, argnums=(0, 1))(variables, sb.table[:-1])
        gt_v, gt_t = jax.grad(loss_tile, argnums=(0, 1))(variables, sb.table[:-1])
        np.testing.assert_allclose(
            np.asarray(gs_t)[vmask], np.asarray(gt_t)[vmask], rtol=1e-4, atol=1e-5
        )
        flat_s = jax.tree_util.tree_leaves_with_path(gs_v)
        flat_t = dict(jax.tree_util.tree_leaves_with_path(gt_v))
        for path, leaf in flat_s:
            np.testing.assert_allclose(
                np.asarray(leaf),
                np.asarray(flat_t[path]),
                rtol=1e-4,
                atol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )
