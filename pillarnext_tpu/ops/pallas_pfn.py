"""Fused two-layer PFN over sorted pillar streams — Pallas TPU kernel.

Replaces the eval-time body of ``PillarFeatureNet`` (models/pillar_encoder.py,
reference semantics det3d/models/readers/pillar_encoder.py:25-50,98-123)
between the decorated point features and the compact pillar table:

    Dense -> BN -> ReLU -> pillar max -> broadcast back -> concat
    -> Dense -> BN -> ReLU -> pillar max

In the XLA lowering that region is ~6 separate HBM sweeps (a row gather, two
segment-max scatters, two matmuls, elementwise glue), each descriptor- or
dispatch-bound far above the bandwidth floor (tools/reader_probe.py).  The
kernel streams the point buffer through VMEM once per PFN layer and does
everything else on-chip.

Decoration (cluster/center offsets) happens OUTSIDE in the shared XLA code
path and rides the stream pre-rounded to the compute dtype: recomputing it
in-kernel was measured to diverge from XLA by 1 f32 ulp on the center
offsets (Mosaic's divide/mul-add lowering differs from XLA's at the last
bit), which rounds into rare 1-ulp bf16 feature flips.  Feeding both paths
the identical decorated tensor removes the whole divergence class and a
third in-kernel matmul with it.

Structure (all shapes static):
- Points are pre-sorted by compact pillar slot (ops/compact.py), so slots are
  DENSE ascending integers.  The grid iterates over *table tiles* of
  ``c_tile`` consecutive slots; each tile's points form one contiguous range
  of the stream (``p_start`` via searchsorted), DMA'd in ``c_blk``-column
  blocks.  Output tiles never overlap => no write races, no cross-tile state.
- Everything runs TRANSPOSED — channels on sublanes, points on lanes — so
  the manual HBM DMAs slice the point stream along its 128-aligned lane
  dimension (Mosaic requires lane-dim slices aligned to the (1,128) HBM
  tiling; a (N, 16) layout is not sliceable).  The compact slot id rides the
  point block as a spare CHANNEL in f32 (exact for slots < 2^24), so one DMA
  fetches both; rows whose layer-0 weights are zero contribute exact zeros
  to the f32 matmul accumulator, so no masking is needed.
- Per-point "gather" from the tile-local layer-0 pillar-max table is a
  one-hot matmul on the MXU: the one-hot has exactly one nonzero per column,
  so the dot is a BIT-EXACT row copy.  Placement of per-block segment maxima
  into tile rows reuses the same one-hot (contracting the point dim) masked
  to last-in-block columns.
- Per-block segment max is a log2(c_blk)-step shift-max scan along lanes
  (static concat shifts; Mosaic's dynamic rotate is unimplemented for bf16).
  Identity is 0: every reduced value is post-ReLU >= 0 and the XLA path
  clamps empty segments to 0, so 0-init accumulation is exact and NaN-free.
- Cross-block partial maxima of a straddling pillar combine in the tile
  accumulator (max is associative/idempotent); blocks that overrun a tile's
  point range mask those columns out of the one-hot (slot outside the tile),
  so boundary points are recomputed by their own tile and never
  double-placed.  Block starts are rounded down to 128-lane alignment; the
  extra leading columns are masked the same way.

Exactness vs the XLA path: the decorated features are THE SAME TENSOR, BN is
the same precomputed (inv, shift) affine applied to the f32 matmul
accumulator with a single rounding (rounding commutes with the monotone
relu/max that follow), and the dot contractions keep the XLA path's K order
with zero rows appended.  Measured on chip at the bf16 flagship: 68 of 6.3M
table elements differ, all by exactly 1 bf16 ulp (tools/pallas_pfn_probe.py
— XLA's --xla_allow_excess_precision keeps f32 through its Dense->BN convert
at those rows where the kernel rounds once); CPU interpret mode adds rare
1-ulp relu-boundary flips from shape-dependent f32 reassociation
(tests/test_pallas_pfn.py bounds both).  END-TO-END with trained weights the
detection sets are exactly equal — 24/24 matched, same labels, boxes/scores
within 2 bf16 ulp (tools/pallas_pfn_e2e.py on chip).

Measured A/B on chip (tools/pallas_pfn_probe.py, B=1, N=200k, cap 98304,
scalar-fenced, two interleaved rounds): reader->table fused 13.8 ms vs XLA
15.4 ms, stable to 0.1 ms.  (Earlier 44/54 ms figures were dominated by the
12.6 MB table fetch over the axon tunnel — fence on scalars.)

Eval-only by design (training keeps the XLA path: BN batch stats and the
segment-op custom VJPs live there), mirroring SepHead.fuse_eval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_SLOT_ROW = 15  # fixed slot-channel row in the 16-row point stream


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("cap", "c_tile", "c_blk", "interpret"),
)
def fused_pfn_two_layer(
    pts: jnp.ndarray,      # (16, Np) f32: rows [0,df) decorated features
                           # (pre-rounded to dt), row 15 = compact slot as
                           # f32; sorted by slot
    p_start: jnp.ndarray,  # (n_tiles + 1,) i32 tile point-range boundaries
    w0t: jnp.ndarray,      # (c0, 16) dt — layer-0 weights, transposed,
                           # zero rows where the stream carries pad/slot
    bn0: jnp.ndarray,      # (c0, 2) dt — columns (inv, shift)
    w1t: jnp.ndarray,      # (c1, 2*c0) dt
    bn1: jnp.ndarray,      # (c1, 2) dt
    *,
    cap: int,
    c_tile: int = 1024,
    c_blk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Compact pillar table (cap_pad, c1); rows with no points are 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = p_start.shape[0] - 1
    cap_pad = n_tiles * c_tile
    assert cap < (1 << 24), cap  # slot rides a f32 channel exactly
    c0 = w0t.shape[0]
    c1 = w1t.shape[0]
    dt = w0t.dtype
    np_cols = pts.shape[1]
    assert pts.shape[0] == 16, pts.shape
    assert np_cols % c_blk == 0 and c_blk % 128 == 0, (np_cols, c_blk)
    last_ok = np_cols - c_blk

    def kernel(ps_ref, pts_hbm, w0_ref, bn0_ref, w1_ref, bn1_ref,
               o_ref, max0, pbuf, sbuf, sem_p):
        j = pl.program_id(0)
        a = (ps_ref[j] // 128) * 128
        b = ps_ref[j + 1]
        base = j * c_tile
        nblk = jax.lax.div(b - a + (c_blk - 1), c_blk)

        max0[:] = jnp.zeros((c_tile, c0), dt)
        o_ref[:] = jnp.zeros((c_tile, c1), dt)

        def fetch(k):
            # a, c_blk, last_ok are all 128-multiples but Mosaic can't prove
            # it through the min(); assert the alignment for the memref slice
            start = pl.multiple_of(jnp.minimum(a + k * c_blk, last_ok), 128)
            cp = pltpu.make_async_copy(
                pts_hbm.at[:, pl.ds(start, c_blk)], pbuf, sem_p
            )
            cp.start()
            cp.wait()

        def seg_scan_max(v, s):
            # inclusive segmented max scan along lanes (identity 0)
            f = v.shape[0]
            dd = 1
            while dd < c_blk:
                vs = jnp.concatenate(
                    [jnp.zeros((f, dd), v.dtype), v[:, : c_blk - dd]], 1
                )
                ss = jnp.concatenate(
                    [jnp.full((1, dd), -1, jnp.int32), s[:, : c_blk - dd]], 1
                )
                v = jnp.where(ss == s, jnp.maximum(v, vs), v)
                dd *= 2
            return v

        def layer0(raw):
            # zero weight rows null the slot/pad channels exactly (0*finite)
            z = jax.lax.dot_general(
                w0_ref[:], raw.astype(dt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # BN affine on the f32 accumulator with the dt-rounded constants,
            # single rounding at the end — matches XLA's excess-precision
            # lowering of Dense->BN->ReLU (rounding commutes with the
            # monotone relu/max that follow)
            z = (z * bn0_ref[:, 0:1].astype(jnp.float32)
                 + bn0_ref[:, 1:2].astype(jnp.float32))
            return jnp.maximum(z, 0.0).astype(dt)

        def block_common(k):
            fetch(k)
            raw = pbuf[:]
            # materialize the slot row through its own ref: a direct slice at
            # sublane 15 keeps a nonzero sublane offset in Mosaic's layout and
            # the shifted concats below refuse mixed offsets on the sublane
            # dim ("result/input offset mismatch on non-concat dimension")
            sbuf[:] = raw[_SLOT_ROW : _SLOT_ROW + 1, :].astype(jnp.int32)
            s = sbuf[:]  # (1, c_blk), canonical offset-0 layout
            ls = s - base
            ok = (ls >= 0) & (ls < c_tile) & (s < cap)
            rows = jax.lax.broadcasted_iota(jnp.int32, (c_tile, c_blk), 0)
            oh_f32 = jnp.where(
                ok & (rows == ls), jnp.float32(1.0), jnp.float32(0.0)
            )
            nxt = jnp.concatenate(
                [s[:, 1:], jnp.full((1, 1), -1, jnp.int32)], 1
            )
            is_last = (s != nxt).astype(jnp.float32)
            return raw, s, oh_f32, is_last

        def place(oh_f32, is_last, scan_v):
            # (c_tile, F) <- one value per (slot, block): exact row copy
            oh_last = (oh_f32 * is_last).astype(dt)
            return jax.lax.dot_general(
                oh_last, scan_v,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)

        def body_b(k, _):
            raw, s, oh_f32, is_last = block_common(k)
            v0 = layer0(raw)
            sc0 = seg_scan_max(v0, s)
            max0[:] = jnp.maximum(max0[:], place(oh_f32, is_last, sc0))
            return 0

        def body_c(k, _):
            raw, s, oh_f32, is_last = block_common(k)
            v0 = layer0(raw)
            back = jax.lax.dot_general(
                max0[:], oh_f32.astype(dt),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)  # (c0, c_blk) exact row copy of dt values
            z = jax.lax.dot_general(
                w1_ref[:], jnp.concatenate([v0, back], 0),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            z = (z * bn1_ref[:, 0:1].astype(jnp.float32)
                 + bn1_ref[:, 1:2].astype(jnp.float32))
            v1 = jnp.maximum(z, 0.0).astype(dt)
            sc1 = seg_scan_max(v1, s)
            o_ref[:] = jnp.maximum(o_ref[:], place(oh_f32, is_last, sc1))
            return 0

        jax.lax.fori_loop(0, nblk, body_b, 0)
        jax.lax.fori_loop(0, nblk, body_c, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pts (HBM, manual DMA)
            pl.BlockSpec((c0, 16), lambda j, ps: (0, 0)),
            pl.BlockSpec((c0, 2), lambda j, ps: (0, 0)),
            pl.BlockSpec((c1, 2 * c0), lambda j, ps: (0, 0)),
            pl.BlockSpec((c1, 2), lambda j, ps: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c_tile, c1), lambda j, ps: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((c_tile, c0), dt),          # layer-0 pillar max
            pltpu.VMEM((16, c_blk), jnp.float32),  # point block staging
            pltpu.VMEM((1, c_blk), jnp.int32),     # slot row (offset-0 copy)
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cap_pad, c1), dt),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(p_start, pts, w0t, bn0, w1t, bn1)


def pfn_table_fused(
    feats_sorted: jnp.ndarray,  # (N, df) decorated features in the compute
                                # dtype (post-where, post-astype), sorted
    slot_sorted: jnp.ndarray,   # (N,) i32 ascending, dump rows = cap
    params0: tuple,             # (kernel (df, c0) f32, inv (c0,), shift)
    params1: tuple,             # (kernel (2*c0, c1) f32, inv, shift)
    *,
    cap: int,
    dtype,
    c_tile: int = 1024,
    c_blk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Adapter: flax-layout params -> kernel layout; returns (cap + 1, c1)
    compact table with the dump row exactly 0 (the XLA-path contract,
    models/pillar_encoder.py:154-161)."""
    n, df = feats_sorted.shape
    assert df <= _SLOT_ROW, df  # row 15 carries the slot channel
    dt = dtype or jnp.float32
    k0, inv0, shift0 = params0
    k1, inv1, shift1 = params1
    assert k0.shape[0] == df, (k0.shape, df)
    c0 = k0.shape[1]
    c1 = k1.shape[1]

    # pad the stream to whole DMA blocks (pad columns -> dump slot)
    n_pad = _ceil_to(n, c_blk) + c_blk
    pts = jnp.zeros((16, n_pad), jnp.float32)
    pts = pts.at[:df, :n].set(feats_sorted.astype(jnp.float32).T)
    pts = pts.at[_SLOT_ROW, :].set(
        jnp.full((n_pad,), cap, jnp.float32).at[:n].set(
            slot_sorted.astype(jnp.float32)
        )
    )

    n_tiles = (cap + c_tile - 1) // c_tile
    bounds = jnp.minimum(
        jnp.arange(n_tiles + 1, dtype=jnp.int32) * c_tile, cap
    )
    p_start = jnp.searchsorted(slot_sorted, bounds, side="left").astype(jnp.int32)

    # layer-0 weights padded to the 16-row stream layout (rows >= df zero)
    w0 = jnp.zeros((16, c0), jnp.float32).at[:df].set(k0)
    bn0 = jnp.stack([inv0, shift0], axis=1).astype(dt)
    bn1 = jnp.stack([inv1, shift1], axis=1).astype(dt)

    table = fused_pfn_two_layer(
        pts, p_start,
        w0.T.astype(dt), bn0, k1.T.astype(dt), bn1,
        cap=cap, c_tile=c_tile, c_blk=c_blk, interpret=interpret,
    )
    return jnp.concatenate([table[:cap], jnp.zeros((1, c1), dt)], 0)


def pallas_pfn_enabled() -> bool:
    """Fused PFN usable here?  Single-device TPU only by default: the kernel
    is not partitionable under a multi-device jit (the XLA path serves
    meshes, CPU, and training).  PNX_PALLAS_PFN: 0 = off, interpret = force
    on in interpreter mode (CPU equivalence tests), auto (default)."""
    import os

    v = os.environ.get("PNX_PALLAS_PFN", "auto")
    if v == "0":
        return False
    if v == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu" and jax.device_count() == 1
    except Exception:  # noqa: BLE001
        return False


def pfn_interpret() -> bool:
    import os

    return os.environ.get("PNX_PALLAS_PFN", "auto") == "interpret"


__all__ = [
    "fused_pfn_two_layer",
    "pfn_table_fused",
    "pallas_pfn_enabled",
    "pfn_interpret",
]
