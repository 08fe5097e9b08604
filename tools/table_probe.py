#!/usr/bin/env python
"""On-chip cost breakdown of the sparse-stage TABLE BUILDS at train shapes,
plus an A/B of the windowed-row neighbor-table build (k gathers of (cap, k)
row windows vs k^2 scalar-row gathers).

Measured at B=2 flagship train shapes (2026-08-19, v5e):
  - windowed-row build REFUTED: 15.3 vs 11.5 ms at stage 0 (and losing at
    every stage) — TPU gather with (1, 3) slice_sizes lowers WORSE than 3x
    as many single-element row gathers, so ``_rows`` lives here as the
    recorded refutation, not in ops/.
  - baseline totals (pure-gather builds): stage0 subm 11.5; stage1
    downset 5.6 + dntbl 17.7 + subm 5.9; stage2 2.2 + 8.4 + 2.3; stage3
    1.5 + 2.6 + 1.4; total 59 ms of the 599 ms B=2 train step — matching
    the zero-block bisection in tools/train_breakdown.py.
  - after the round-4 build optimizations (roll-based center row in
    build_neighbor_table; scatter-adjoint nbr_rev in
    build_down_neighbor_tables), re-measured on chip same shapes:
    stage0 subm 8.25 (was 11.5); stage1 downset 5.6 + dntbl 9.35 (was
    17.7) + subm 4.3; stage2 2.2 + 3.2 + 2.1; stage3 1.4 + 1.6 + 1.4;
    total 39.5 ms (was 59) — a 33% table-build cut, outputs
    oracle-equal (tests/test_subm_conv.py, tests/test_sparse_down.py).
    The windowed-row variant still loses at every stage (15.5/8.0/2.9/1.5).

Usage: python tools/table_probe.py [batch] [npoints]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pillarnext_tpu.models.pillar_encoder import PillarFeatureNet
from pillarnext_tpu.ops.subm_conv import (
    build_neighbor_table,
    subm_offsets_2d,
)
from pillarnext_tpu.ops.sparse_down import (
    build_down_neighbor_tables,
    downsample_active_set,
)
from pillarnext_tpu.utils.synth import lidar_like_points

def build_neighbor_table_rows(slot_of_dense, slot_id, spatial, kernel_size, cap):
    """REFUTED windowed-row build (see module docstring): k (cap, k)-window
    gathers instead of k^2 scalar-row gathers.  Output-equal to
    build_neighbor_table; slower on TPU at every flagship stage."""
    h, w = spatial
    r = kernel_size // 2
    bhw = slot_of_dense.shape[0]
    bh = bhw // w
    mp = jnp.pad(slot_of_dense.reshape(bh, w), ((0, 0), (r, r)),
                 constant_values=cap)
    d = slot_id.astype(jnp.int32)
    in_table = d < bhw
    ds = jnp.where(in_table, d, 0)
    row = ds // w
    x = ds % w
    y = row % h
    out = []
    for dy in range(-r, r + 1):
        ok = in_table & (y + dy >= 0) & (y + dy < h)
        starts = jnp.stack([jnp.where(ok, row + dy, 0), x], axis=-1)
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(mp, (s[0], s[1]), (1, kernel_size))
        )(starts).reshape(-1, kernel_size)
        out.append(jnp.where(ok[:, None], win, cap))
    return jnp.concatenate(out, axis=1)


B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
PC = (-50.4, -50.4, -5.0, 50.4, 50.4, 3.0)
VS = (0.075, 0.075, 8.0)
CAP = 73728  # train_pillar_capacity (nusc_det_pp18_aspp_iou_sp.yaml)
FRACS = (1.0, 0.5, 0.25, 0.125)
STRIDES = (1, 2, 2, 2)


def fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def bench(fn, *args, reps=20):
    # scalar-fenced: sum the outputs INSIDE the jit so the fence fetches one
    # f32 (fetching a (cap, 9) i32 table over the tunnel costs more than the
    # build itself)
    fs = jax.jit(lambda *a: sum(
        jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(fn(*a))
    ))
    float(fs(*args))
    t0 = time.perf_counter()
    outs = [fs(*args) for _ in range(reps)]
    float(outs[-1])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    net = PillarFeatureNet(
        num_input_features=5, num_filters=(64, 64), voxel_size=VS, pc_range=PC,
        pillar_capacity=CAP, dtype=jnp.bfloat16, output="sparse",
    )
    pts, mask = lidar_like_points(B, N, PC, seed=0)
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), pts_j, mask_j)
    sb = jax.jit(lambda v, p, m: net.apply(v, p, m))(v, pts_j, mask_j)
    sod, sid = sb.slot_of_dense, sb.slot_id
    spatial = sb.spatial
    cap0 = sb.capacity
    print(f"B={B} grid={spatial} cap0={cap0} "
          f"active={int(np.asarray(sb.valid.sum()))}", flush=True)

    off3 = subm_offsets_2d(3)
    total = 0.0
    for i, (s, f) in enumerate(zip(STRIDES, FRACS)):
        if s == 1:
            t_old = bench(
                jax.jit(lambda so, si: build_neighbor_table(
                    so, si, spatial, off3, cap0)), sod, sid)
            t_new = bench(
                jax.jit(lambda so, si: build_neighbor_table_rows(
                    so, si, spatial, 3, cap0)), sod, sid)
            a = np.asarray(build_neighbor_table(sod, sid, spatial, off3, cap0))
            b = np.asarray(build_neighbor_table_rows(sod, sid, spatial, 3, cap0))
            eq = "EQ" if (a == b).all() else f"MISMATCH {(a != b).sum()}"
            print(f"stage{i} subm build  {t_old:7.2f} ms | rows {t_new:7.2f} ms  [{eq}]",
                  flush=True)
            total += min(t_old, t_new)
        else:
            cap_out = min(max(int(cap0 * f), 4096),
                          B * ((spatial[0] + 1) // 2) * ((spatial[1] + 1) // 2))
            dsj = jax.jit(lambda so: downsample_active_set(
                so, cap0, B, spatial, (3, 3), (2, 2), cap_out))
            t_ds = bench(dsj, sod)
            osid, osod, oval, osp, n_out = dsj(sod)
            osp = tuple(int(x) for x in osp)  # jit boxed the static shape
            t_dn = bench(jax.jit(
                lambda so, osi, oso, si: build_down_neighbor_tables(
                    so, osi, oso, si, B, spatial, (3, 3), (2, 2))),
                sod, osid, osod, sid)
            t_sub = bench(jax.jit(lambda so, si: build_neighbor_table(
                so, si, osp, off3, cap_out)), osod, osid)
            t_subn = bench(jax.jit(lambda so, si: build_neighbor_table_rows(
                so, si, osp, 3, cap_out)), osod, osid)
            a = np.asarray(build_neighbor_table(osod, osid, osp, off3, cap_out))
            b = np.asarray(build_neighbor_table_rows(osod, osid, osp, 3, cap_out))
            eq = "EQ" if (a == b).all() else f"MISMATCH {(a != b).sum()}"
            print(f"stage{i} downset {t_ds:7.2f} + dntbl {t_dn:7.2f} + "
                  f"subm {t_sub:7.2f} (rows {t_subn:7.2f} [{eq}]) ms  "
                  f"(cap_out={cap_out}, n_out={int(n_out)})", flush=True)
            total += t_ds + t_dn + min(t_sub, t_subn)
            sod, sid, spatial, cap0 = osod, osid, osp, cap_out
    print(f"table-build total (best variants): {total:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
