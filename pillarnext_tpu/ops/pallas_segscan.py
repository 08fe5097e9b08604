"""Segmented broadcast-reduce over sorted segment streams — Pallas TPU.

Computes ``out[i] = reduce(x[j] for all j with seg[j] == seg[i])`` for
non-decreasing ``seg`` in two streaming passes (prefix-reduce then
suffix-reduce, combined elementwise), replacing the XLA pair

    table = segment_max(x, seg)        # serialized scatter-max on TPU
    out   = table[seg]                 # descriptor-bound row gather

that costs ~5 ms per PFN layer in the flagship reader
(tools/reader_probe.py: segment_max 2.77 ms + back-gather ~2 ms at
300k x 32).  The scan is bandwidth-bound: 2 read+write sweeps of (N, C).

Mechanics (per pass):
- sequential TPU grid over T-row tiles; a VMEM carry holds the running
  reduce of the segment that straddles the tile boundary (grid steps on TPU
  execute in order, so carry state in scratch is well-defined);
- within a tile, a log2(T)-step shift-reduce computes the inclusive
  segmented prefix (rows only combine with earlier rows of the SAME
  segment);
- the suffix pass runs the same kernel over the reversed stream.

out[i] = combine(prefix_incl[i], suffix_incl[i]) covers the whole segment.

Reductions: 'max' (PFN pillar-max broadcast) and 'sum' (mean numerator /
count).  Forward-only by design — call sites keep their custom-VJP XLA
backwards (sorted segment_sum), exactly like ops/pallas_gather.py.

Status: MEASURED on v5e (tools/pallas_segscan_probe.py, 2026-08-17):
compiles through the tunnel and is bit-exact vs the XLA pair, but LOSES the
A/B — 4.59 vs 4.11 ms at 300k x 32 / 98k segs (4.58 vs 4.15 at C=64).  Both
sit ~30x above the ~0.15 ms bandwidth floor: the scan's 2 passes x log2(T)
shift-combine steps are VPU-bound, and XLA's sorted segment-scatter is
better than its reputation at these shapes.  Wired nowhere (kept as a
measured artifact + base for a fused multi-tile variant); the XLA pair
remains the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

T = 256  # tile rows


def _pass(x, seg, *, combine, identity, reverse, interpret):
    """Inclusive segmented prefix-reduce (suffix-reduce when reverse)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x.shape
    dt = x.dtype
    n_pad = (n + T - 1) // T * T
    xp = jnp.full((n_pad, c), identity, dt).at[:n].set(x)
    # padded rows get a sentinel segment id so they never combine with real
    # rows (also keeps the carry clean at the final tile)
    sp = jnp.full((n_pad, 1), jnp.iinfo(jnp.int32).max, jnp.int32)
    sp = sp.at[:n, 0].set(seg.astype(jnp.int32))
    if reverse:
        # suffix over seg == prefix over the reversed, NEGATED stream (so it
        # stays non-decreasing for clarity; negation is not actually needed
        # for correctness — only equality tests are used)
        xp = xp[::-1]
        sp = sp[::-1]
    n_tiles = n_pad // T
    interp = interpret

    def kernel(x_ref, s_ref, o_ref, cval, cseg):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            cval[:] = jnp.full_like(cval[:], identity)
            cseg[0, 0] = jnp.iinfo(jnp.int32).min  # matches no segment

        v = x_ref[:]  # (T, C)
        s = s_ref[:]  # (T, 1) int32
        # log-step inclusive segmented scan within the tile.  The shift-down
        # by d is a static pad+slice concat (Mosaic's tpu.dynamic_rotate is
        # unimplemented for non-32-bit data); the identity/never-match pads
        # make the row-index mask unnecessary.
        never = jnp.iinfo(jnp.int32).min + 1  # != any real or carry seg id
        d = 1
        c_ = v.shape[1]
        while d < T:
            vs = jnp.concatenate([jnp.full((d, c_), identity, v.dtype), v[: T - d]], 0)
            ss = jnp.concatenate([jnp.full((d, 1), never, jnp.int32), s[: T - d]], 0)
            v = jnp.where(ss == s, combine(v, vs), v)
            d *= 2
        # fold in the carry for rows still in the carry's segment
        same = s == cseg[0, 0]
        v = jnp.where(same, combine(v, cval[:]), v)
        o_ref[:] = v
        # new carry = last row's inclusive value/segment
        cval[:] = v[T - 1 :, :]
        cseg[0, 0] = s[T - 1, 0]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), dt),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, c), lambda i: (i, 0)),
            pl.BlockSpec((T, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((T, c), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, c), dt),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(xp, sp)
    if reverse:
        out = out[::-1]
    return out[:n]


def sorted_segment_bcast(
    x: jnp.ndarray,
    seg: jnp.ndarray,
    *,
    reduce: str = "max",
    interpret: bool = False,
) -> jnp.ndarray:
    """Broadcast segmented reduction over a SORTED segment stream.

    Args:
        x: (N, C) float32/bfloat16 values.
        seg: (N,) int32, non-decreasing.
        reduce: 'max' or 'sum'.

    Returns:
        (N, C): row i holds the reduction over i's whole segment —
        equal to ``segment_<reduce>(x, seg)[seg]`` for sorted seg (for
        'max', on segments that contain at least one row, which is all of
        them here by construction).
    """
    if reduce == "max":
        combine = jnp.maximum
        identity = (
            jnp.finfo(x.dtype).min
            if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min
        )
    elif reduce == "sum":
        combine = lambda a, b: a + b  # noqa: E731
        identity = 0
    else:  # pragma: no cover - guarded by static_argnames
        raise ValueError(reduce)
    def impl(x, seg):
        kw = dict(combine=combine, identity=identity, interpret=interpret)
        pre = _pass(x, seg, reverse=False, **kw)
        suf = _pass(x, seg, reverse=True, **kw)
        if reduce == "sum":
            # prefix + suffix double-counts row i itself
            return pre + suf - x
        return combine(pre, suf)

    if interpret:
        # do NOT jit: interpret-mode pallas_call under jit on the CPU
        # backend crashes XLA at HLO build ('Invalid binary instruction
        # opcode map', hlo_instruction.cc:1585) — jax 0.9.0
        return impl(x, seg)
    return jax.jit(impl)(x, seg)
