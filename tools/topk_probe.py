#!/usr/bin/env python
"""On-chip microbenchmark of candidate top-k variants at NMS-lane shape.

Usage: python tools/topk_probe.py [L] [N] [k]
Compares lax.top_k (full lane sort), approx_max_k, and ops.topk.exact_top_k
(radix select) on (L, N) f32 scores shaped like the flagship predict path
(~95% of entries demoted to NEG_INF).
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

from pillarnext_tpu.ops.topk import exact_top_k

L = int(sys.argv[1]) if len(sys.argv) > 1 else 10
N = int(sys.argv[2]) if len(sys.argv) > 2 else 112_896
K = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

rng = np.random.default_rng(0)
x = rng.normal(size=(L, N)).astype(np.float32)
x[rng.uniform(size=x.shape) < 0.95] = -1e18
xs = jnp.asarray(x)

from pillarnext_tpu.ops import topk as topk_mod


def radix_kth_only(s):
    """Just the 4 histogram passes (the k-th key search)."""
    l, n = s.shape
    keys = topk_mod._sortable_bits(s)
    prefix = jnp.zeros((l, 1), jnp.uint32)
    remaining = jnp.full((l, 1), K, jnp.int32)
    bins = jnp.arange(256, dtype=jnp.uint32)
    for shift in (24, 16, 8, 0):
        high = keys >> jnp.uint32(shift + 8) if shift < 24 else jnp.zeros_like(keys)
        match = high == (prefix >> jnp.uint32(shift + 8) if shift < 24 else prefix)
        digit = (keys >> jnp.uint32(shift)) & jnp.uint32(0xFF)
        hist = jnp.sum(
            (digit[:, :, None] == bins[None, None, :]) & match[:, :, None],
            axis=1, dtype=jnp.int32,
        )
        c = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1]
        ge = c >= remaining
        dsel = jnp.max(jnp.where(ge, bins[None, :].astype(jnp.int32), -1), axis=1)
        dsel = jnp.maximum(dsel, 0).astype(jnp.uint32)[:, None]
        c_pad = jnp.concatenate([c, jnp.zeros((l, 1), jnp.int32)], axis=1)
        greater = jnp.take_along_axis(c_pad, dsel.astype(jnp.int32) + 1, axis=1)
        remaining = remaining - greater
        prefix = prefix | (dsel << jnp.uint32(shift))
    return prefix, remaining


def select_compact_only(s):
    """The post-kth phase: selection mask, cumsums, searchsorted, sort."""
    l, n = s.shape
    keys = topk_mod._sortable_bits(s)
    kth = keys[:, :1]  # arbitrary stand-in key; same op costs
    remaining = jnp.full((l, 1), K // 2, jnp.int32)
    gt = keys > kth
    eq = keys == kth
    eq_rank = jnp.cumsum(eq.astype(jnp.int32), axis=1)
    sel = gt | (eq & (eq_rank <= remaining))
    csum = jnp.cumsum(sel.astype(jnp.int32), axis=1)
    targets = jnp.arange(1, K + 1, dtype=jnp.int32)
    idx = jax.vmap(
        lambda c: jnp.searchsorted(c, targets, side="left").astype(jnp.int32)
    )(csum)
    vals = jnp.take_along_axis(s, idx, axis=1)
    order = jnp.argsort(-vals, axis=1, stable=True)
    return jnp.take_along_axis(vals, order, axis=1), jnp.take_along_axis(idx, order, axis=1)


variants = {
    "lax.top_k": jax.jit(lambda s: jax.lax.top_k(s, K)),
    "approx_max_k": jax.jit(lambda s: jax.lax.approx_max_k(s, K)),
    "exact_top_k": jax.jit(lambda s: exact_top_k(s, K)),
    "radix_kth_only": jax.jit(radix_kth_only),
    "select_compact": jax.jit(select_compact_only),
}

for name, fn in variants.items():
    t0 = time.perf_counter()
    v, i = fn(xs)
    float(jax.tree.leaves(v)[0].sum())
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(xs) for _ in range(50)]
    float(jax.tree.leaves(outs[-1])[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / 50
    print(f"{name:14s} {dt * 1000:7.2f} ms   (compile {c:4.0f}s)", flush=True)

v1, i1 = variants["lax.top_k"](xs)
v2, i2 = variants["exact_top_k"](xs)
ok = bool((np.asarray(v1) == np.asarray(v2)).all() and (np.asarray(i1) == np.asarray(i2)).all())
print("exact_top_k bit-identical to lax.top_k:", ok)
