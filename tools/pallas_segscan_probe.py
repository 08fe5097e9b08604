#!/usr/bin/env python
"""Compile + correctness + timing of the segmented broadcast-reduce scan on
the real chip vs the XLA pair it would replace (segment_max + sorted
back-gather), at the flagship PFN shape: 300k pillar-sorted points, C=32,
98k segments + dump tail.
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

from pillarnext_tpu.ops.pallas_segscan import sorted_segment_bcast


def xla_pair(x, seg, num_segments):
    table = jax.ops.segment_max(
        x, seg, num_segments=num_segments, indices_are_sorted=True
    )
    table = jnp.where(jnp.isfinite(table), table, 0.0)
    return jnp.take(table, seg, axis=0, indices_are_sorted=True)


def bench(name, n, n_seg, c, dtype=jnp.bfloat16, reps=30):
    rng = np.random.default_rng(0)
    # pillar-sorted ids: ~n/n_seg points per segment, dump tail at the end
    seg = np.sort(rng.integers(0, n_seg, n - n // 20)).astype(np.int32)
    seg = np.concatenate([seg, np.full(n // 20, n_seg, np.int32)])
    x = jnp.asarray(rng.standard_normal((n, c)), dtype)
    segj = jnp.asarray(seg)

    pal = jax.jit(
        lambda x, s: sorted_segment_bcast(x, s, reduce="max")
        .astype(jnp.float32)
        .sum()
    )
    ref = jax.jit(
        lambda x, s: xla_pair(x, s, n_seg + 1).astype(jnp.float32).sum()
    )

    for fname, fn in [("xla-pair", ref), ("pallas", pal)]:
        t0 = time.perf_counter()
        float(fn(x, segj))
        print(f"{name} {fname:8s} compile+1st: {time.perf_counter() - t0:6.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x, segj)
        float(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name} {fname:8s} {n}x{c} / {n_seg} segs: {dt:7.3f} ms", flush=True)

    a = np.asarray(
        jax.jit(lambda x, s: sorted_segment_bcast(x, s, reduce="max"))(x, segj),
        np.float32,
    )
    b = np.asarray(jax.jit(lambda x, s: xla_pair(x, s, n_seg + 1))(x, segj), np.float32)
    exact = np.array_equal(a, b)
    print(f"{name} bit-exact vs xla pair: {exact}", flush=True)
    assert exact


bench("pfn", 299520, 98304, 32)
bench("pfn64", 299520, 98304, 64)
print("PALLAS-SEGSCAN OK", flush=True)
