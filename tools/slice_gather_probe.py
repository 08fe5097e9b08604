#!/usr/bin/env python
"""Micro-probes for the round-5 descriptor-count levers, on the real chip.

1. densify as unique-index SCATTER (98k descriptors + a zero fill) vs the
   current row GATHER (1.8M descriptors) at the flagship post-stage-0 shape.
2. windowed SLICE gather — lax.gather with slice_sizes=(3, C) fetching a
   3-consecutive-row window per descriptor — vs 3 separate row gathers at
   the SubM tap shape.  If one (3, C) slice costs ~one descriptor, each SubM
   conv's 6 gathered taps collapse into 2 window fetches (active cells in a
   dense-id interval occupy CONSECUTIVE slots, so the 3 taps of a spatial
   row live in one window).

Usage: python tools/slice_gather_probe.py

RESULTS (TPU v5 lite, round 5) — both ideas REFUTED on chip:

  densify gather :   5.33 ms      <- production form stays
  densify scatter:  17.8  ms      (unique/sorted scatter is 3.3x worse; XLA
                                   lowers the scatter serially even with
                                   unique_indices + indices_are_sorted)
  3 row gathers  :   2.6  ms
  1 slice gather :  90    ms      (slice_sizes=(3, C) is ~35x worse — XLA
                                   lowers multi-row dynamic slices as a
                                   per-descriptor loop, no batching)
  6 row gathers  :   5.2  ms
  2 slice gathers: 180    ms

Conclusion: per-row gathers are the fastest descriptor form XLA offers for
this table layout; the r4 tap-decomposition (roll-based same-row taps,
commit a415c17) remains the best-known SubM structure.  Kept as a probe so
the refutation is reproducible.
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

CAP = 98304
ROWS = 1344 * 1344
C = 64
OCC = 0.045  # flagship-like occupancy


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def make_tables(seed=0):
    rng = np.random.default_rng(seed)
    n_active = min(int(ROWS * OCC), CAP)
    ids = np.sort(rng.choice(ROWS, n_active, replace=False)).astype(np.int32)
    slot_of_dense = np.full(ROWS, CAP, np.int32)
    slot_of_dense[ids] = np.arange(n_active, dtype=np.int32)
    slot_id = np.full(CAP, ROWS, np.int32)
    slot_id[:n_active] = ids
    table = rng.standard_normal((CAP + 1, C)).astype(np.float32)
    table[CAP] = 0
    table = table.astype(jnp.bfloat16)
    return (
        jnp.asarray(table),
        jnp.asarray(slot_of_dense),
        jnp.asarray(slot_id),
        n_active,
    )


def probe_densify():
    table, sod, sid, n_active = make_tables()

    @jax.jit
    def gather_form(t):
        return t[sod]

    @jax.jit
    def scatter_form(t):
        dense = jnp.zeros((ROWS, C), t.dtype)
        return dense.at[jnp.clip(sid, 0, ROWS - 1)].set(
            jnp.where((sid < ROWS)[:, None], t[:CAP], 0.0),
            mode="drop",
            unique_indices=True,
            indices_are_sorted=True,
        )

    g = np.asarray(gather_form(table), np.float32)
    s = np.asarray(scatter_form(table), np.float32)
    exact = np.array_equal(g, s)
    print(f"densify gather : {timeit(gather_form, table):7.3f} ms", flush=True)
    print(f"densify scatter: {timeit(scatter_form, table):7.3f} ms  bit-exact vs gather: {exact}", flush=True)
    assert exact


def probe_slice_gather():
    table, sod, sid, n_active = make_tables()
    rng = np.random.default_rng(1)
    # window bases: monotone-ish like real up-row neighbors
    lo = np.sort(rng.integers(0, CAP - 3, CAP)).astype(np.int32)
    lo_j = jnp.asarray(lo)

    @jax.jit
    def three_row_gathers(t):
        return t[lo_j] + t[lo_j + 1] + t[lo_j + 2]

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )

    @jax.jit
    def slice_gather(t):
        win = jax.lax.gather(
            t, lo_j[:, None], dnums, slice_sizes=(3, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (CAP, 3, C)
        return win[:, 0] + win[:, 1] + win[:, 2]

    a = np.asarray(three_row_gathers(table), np.float32)
    b = np.asarray(slice_gather(table), np.float32)
    exact = np.array_equal(a, b)
    print(f"3 row gathers  : {timeit(three_row_gathers, table):7.3f} ms", flush=True)
    print(f"1 slice gather : {timeit(slice_gather, table):7.3f} ms  sum-exact: {exact}", flush=True)

    # and the full 6-tap shape: 6 row gathers vs 2 slice gathers
    hi = np.sort(rng.integers(0, CAP - 3, CAP)).astype(np.int32)
    hi_j = jnp.asarray(hi)

    @jax.jit
    def six_row_gathers(t):
        acc = 0
        for base in (lo_j, hi_j):
            acc = acc + t[base] + t[base + 1] + t[base + 2]
        return acc

    @jax.jit
    def two_slice_gathers(t):
        acc = 0
        for base in (lo_j, hi_j):
            win = jax.lax.gather(
                t, base[:, None], dnums, slice_sizes=(3, C),
                mode=jax.lax.GatherScatterMode.CLIP,
            )
            acc = acc + win[:, 0] + win[:, 1] + win[:, 2]
        return acc

    print(f"6 row gathers  : {timeit(six_row_gathers, table):7.3f} ms", flush=True)
    print(f"2 slice gathers: {timeit(two_slice_gathers, table):7.3f} ms", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    probe_densify()
    probe_slice_gather()
    print("SLICE-GATHER PROBE OK", flush=True)
