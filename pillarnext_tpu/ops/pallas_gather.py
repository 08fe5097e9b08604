"""Windowed row gather for monotone index streams — Pallas TPU kernel.

XLA's row gather is descriptor-rate-bound (~230M rows/s measured on v5e via
tools/reader_probe.py): ``densify`` (1.8M dense rows) costs ~5 ms and each
sorted ``gather_segments`` ~2 ms per call in the flagship reader.  But both
index streams are *monotone with bounded tile span* by construction:

- densify: ``slot_of_dense`` restricted to its real (non-dump) entries is
  strictly increasing in dense order (ops/compact.py assigns slots in
  ascending dense-id order), so any T consecutive dense rows reference at
  most T consecutive table rows.
- gather_segments: points are sorted by segment, so T consecutive points
  reference at most T consecutive (non-decreasing) segment rows.

So each output tile of T rows only needs a 2T-row aligned window of the
table: DMA the window to VMEM once and expand it to output rows with a
(T, 2T) one-hot matmul on the MXU.  The one-hot has exactly one nonzero per
output row, so the f32-accumulated matmul is a BIT-EXACT row copy (no
rounding), including bf16 tables.  Out-of-range/sentinel indices (>= the
number of table rows) match no window column and produce exact zero rows —
the dump-row contract of the compact pipeline.

MEASURED (v5e via the axon tunnel, tools/pallas_gather_probe.py,
2026-08-17): compiles and is bit-exact on chip, but LOSES to the XLA row
gather at both production shapes — densify 1.8M x 64 from 98k: 6.9-8.5 ms
(tile 512/256/1024) vs XLA 5.6 ms; PFN back-gather 300k x 32: 2.1 vs
1.7 ms.  XLA's gather is already near the measured ~230M-descriptors/s
floor and the kernel's one-hot matmul adds 2*m*T FLOPs it can't hide.  The
call sites therefore default to XLA; set PNX_PALLAS=1 to opt in.  Kept as
the SURVEY §2.5 Pallas artifact (running, bit-exact, measured) and as the
base for window-DMA variants.  Forward-only by design: backward index
streams (e.g. ``slot_id`` over dense ids) are monotone but NOT
tile-span-bounded.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

T = 256  # contract span: any T consecutive real entries span < T table rows
_DEFAULT_TILE = 256  # output tile rows == window block rows (multiple of T)


def pallas_enabled() -> bool:
    """Compiled Pallas gather opted in?  (Measured slower than the XLA row
    gather at production shapes — see module docstring — so opt-IN.)"""
    if os.environ.get("PNX_PALLAS", "0") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def monotone_row_gather(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    interpret: bool = False,
    tile: int | None = None,
) -> jnp.ndarray:
    """``table[idx]`` for index streams whose real entries are monotone with
    tile span < T; entries ``>= table.shape[0]`` yield zero rows.

    Args:
        table: (R, C) float32/bfloat16.
        idx: (M,) int32; restricted to values < R it must be non-decreasing
            and any T consecutive entries must span < T table rows.  Values
            >= R (sentinels, e.g. the dump slot) may appear anywhere.

    Returns:
        (M, C) in table's dtype — bit-identical to the masked XLA gather
        ``where(idx < R, table[min(idx, R-1)], 0)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # tile must be a multiple of the contract span T: non-decreasing entries
    # whose every T-window spans < T also span < k*T over k*T-windows
    T = tile if tile is not None else _DEFAULT_TILE  # noqa: N806 (shadow)
    r, c = table.shape
    (m,) = idx.shape
    dt = table.dtype

    m_pad = (m + T - 1) // T * T
    n_tiles = m_pad // T
    # pad the table to whole windows of zeros (sentinel rows read zeros)
    r_pad = ((r + T - 1) // T + 2) * T
    table_pad = jnp.zeros((r_pad, c), dt).at[:r].set(table)
    idx_pad = jnp.full((m_pad,), r, jnp.int32).at[:m].set(idx.astype(jnp.int32))

    # per-tile aligned window base (block units): min real index in the tile
    tiled = idx_pad.reshape(n_tiles, T)
    real = jnp.where(tiled < r, tiled, r_pad - T)
    bases = jnp.min(real, axis=1) // T  # (n_tiles,) int32 block index
    bases = jnp.minimum(bases, (r_pad - 2 * T) // T).astype(jnp.int32)

    def kernel(bases_ref, idx_ref, w0_ref, w1_ref, o_ref):
        base = bases_ref[pl.program_id(0)] * T
        ix = idx_ref[:]  # (T, 1) int32 — keep 2-D throughout for Mosaic
        rel = jnp.where(ix < r, ix - base, -1)  # -1 matches no column
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        # two (T,T)@(T,c) dots against the window halves — no VMEM scratch
        # copy; each one-hot has at most one nonzero per row, f32 accumulate
        # is an exact row copy, and the halves' nonzeros are disjoint.
        oh0 = (cols == rel).astype(dt)
        oh1 = (cols == rel - T).astype(dt)
        acc = jnp.dot(oh0, w0_ref[:], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(oh1, w1_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(dt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, 1), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, c), lambda i, b: (b[i], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, c), lambda i, b: (b[i] + 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, c), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, c), dt),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(bases, idx_pad.reshape(m_pad, 1), table_pad, table_pad)
    return out[:m]
