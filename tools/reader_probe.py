#!/usr/bin/env python
"""Bisect the pillar reader's on-chip time: sort, compactify scatters,
segment reductions, PFN matmuls, densify gather.

Usage: python tools/reader_probe.py [batch] [npoints]
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

from pillarnext_tpu.ops import scatter
from pillarnext_tpu.ops.compact import compactify
from pillarnext_tpu.ops.densify import densify

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
H = W = 1344
CAP = 131072 * B
HW = H * W

rng = np.random.default_rng(0)
ids_np = rng.integers(0, HW, (B * N,)).astype(np.int32)
ids = jnp.asarray(ids_np)
feats = jnp.asarray(rng.normal(size=(B * N, 10)).astype(np.float32))


def timed(name, fn, *args, reps=30):
    # pipelined: dispatch all reps, fence once (tunnel round trips amortized)
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[0], out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.tree.map(lambda x: np.asarray(x).ravel()[0], outs[-1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1000:7.2f} ms", flush=True)
    return out


# every fn reduces to a scalar ON DEVICE so the tunnel fetch is 4 bytes
f_sort = jax.jit(lambda i: jnp.argsort(i).sum())
f_sortv = jax.jit(lambda i: jnp.sort(i).sum())
f_compact = jax.jit(lambda i: sum(x.sum() for x in compactify(i, B * HW, CAP)))
f_segmax = jax.jit(
    lambda f, s: scatter.segment_max(f, s, CAP + 1, indices_are_sorted=True).sum()
)

timed("argsort(ids)", f_sort, ids)
timed("sort(ids) values only", f_sortv, ids)
timed("compactify (sort+scatter)", f_compact, ids)
order, slot, slot_id, _ = jax.jit(lambda i: compactify(i, B * HW, CAP))(ids)
feats_s = feats[order]
timed("segment_max sorted", f_segmax, feats_s, slot)

table = jnp.zeros((CAP + 1, 64), jnp.bfloat16)
sod = jnp.zeros((B * HW,), jnp.int32)
f_dense = jax.jit(lambda t, s: densify(t, s, slot_id).astype(jnp.float32).sum())
timed("densify gather 1.8M x 64", f_dense, table, sod)

# scatter-form densify: 98k unique-index row writes instead of 1.8M
# gather descriptors (XLA's row gather is descriptor-rate-bound)
def dense_scatter(t, sid):
    out = jnp.zeros((B * HW + CAP, 64), jnp.bfloat16)
    safe = jnp.where(sid < B * HW, sid, B * HW + jnp.arange(CAP, dtype=jnp.int32))
    out = out.at[safe].set(t[:CAP], unique_indices=True)
    return out[: B * HW].astype(jnp.float32).sum()

timed("densify scatter 98k rows", jax.jit(dense_scatter), table, slot_id)

pfn_in = jnp.zeros((B * N, 10), jnp.bfloat16)
k0 = jnp.zeros((10, 32), jnp.bfloat16)
f_mm = jax.jit(lambda a, k: (a @ k).astype(jnp.float32).sum())
timed("PFN matmul N x 10 -> 32", f_mm, pfn_in, k0)

# scatter construction of slot_of_dense (reader lines 141-144)
def make_sod(slot_id):
    s = jnp.full((B * HW + 1,), CAP, jnp.int32)
    return s.at[slot_id].set(jnp.arange(CAP, dtype=jnp.int32), mode="drop").sum()

timed("slot_of_dense scatter", jax.jit(make_sod), slot_id)

# variant: unique-indices scatter
def make_sod_u(slot_id):
    s = jnp.full((B * HW + 1,), CAP, jnp.int32)
    return s.at[slot_id].set(
        jnp.arange(CAP, dtype=jnp.int32), mode="drop", unique_indices=True
    ).sum()

timed("slot_of_dense scatter uniq", jax.jit(make_sod_u), slot_id)

# gathers used by the reader: raw[order] etc.
f_g = jax.jit(lambda f, o: f[o].sum())
timed("gather feats[order] Nx10", f_g, feats, order)

f_noop = jax.jit(lambda x: x + 1.0)
timed("noop dispatch overhead", f_noop, jnp.zeros(()))
f_noop100 = jax.jit(lambda x: x + 1.0)
x0 = jnp.zeros(())
jax.block_until_ready(f_noop100(x0))
t0 = time.perf_counter()
outs = [f_noop100(x0) for _ in range(100)]
np.asarray(outs[-1])
print(f"noop x100 pipelined         {(time.perf_counter()-t0)/100*1000:7.2f} ms", flush=True)
