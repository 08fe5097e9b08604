#!/usr/bin/env python
"""Descriptor-rate experiment: XLA row gathers are bound at ~230M rows/s on
v5e, far below HBM bandwidth at C=32-64.  Gathering row-PAIRS (or quads)
halves (quarters) the descriptor count at 2x (4x) the bytes per descriptor,
then a lane select picks the half — a straight trade of spare bandwidth for
the binding descriptor rate.

Shapes probed: densify (1.8M from 98k x 64) and SubM tap gather
(98k x 6 taps from 98k x 64).
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


def plain(table, idx):
    r = table.shape[0]
    safe = jnp.minimum(idx, r - 1)
    return jnp.where((idx < r)[:, None], table[safe], jnp.zeros((), table.dtype))


def grouped(table, idx, g):
    r, c = table.shape
    rpad = (r + g - 1) // g * g
    tp = jnp.zeros((rpad, c), table.dtype).at[:r].set(table)
    tg = tp.reshape(rpad // g, g * c)
    safe = jnp.minimum(idx, r - 1)
    rows = tg[safe // g]  # (M, g*C) — 1/g descriptors
    sel = rows.reshape(-1, g, c)[jnp.arange(idx.shape[0]), safe % g]
    return jnp.where((idx < r)[:, None], sel, jnp.zeros((), table.dtype))


def grouped_where(table, idx, g):
    # select via lane arithmetic instead of a second gather
    r, c = table.shape
    rpad = (r + g - 1) // g * g
    tp = jnp.zeros((rpad, c), table.dtype).at[:r].set(table)
    tg = tp.reshape(rpad // g, g * c)
    safe = jnp.minimum(idx, r - 1)
    rows = tg[safe // g].reshape(-1, g, c)
    onehot = (safe % g)[:, None] == jnp.arange(g)[None, :]
    sel = jnp.sum(rows * onehot[..., None].astype(table.dtype), axis=1)
    return jnp.where((idx < r)[:, None], sel, jnp.zeros((), table.dtype))


def bench(name, m, r, c, reps=30):
    rng = np.random.default_rng(0)
    n_real = int(m * 0.05) if m > r else m
    pos = np.sort(rng.choice(m, n_real, replace=False))
    idx = np.full(m, r, np.int32)
    idx[pos] = np.minimum(np.arange(n_real), r - 1)
    table = jnp.asarray(rng.standard_normal((r, c)), jnp.bfloat16)
    idxj = jnp.asarray(idx)

    fns = [("plain", jax.jit(lambda t, i: plain(t, i).astype(jnp.float32).sum()))]
    for g in (2, 4, 8):
        fns.append(
            (f"pair{g}", jax.jit(lambda t, i, g=g: grouped(t, i, g).astype(jnp.float32).sum()))
        )
        fns.append(
            (f"oneh{g}", jax.jit(lambda t, i, g=g: grouped_where(t, i, g).astype(jnp.float32).sum()))
        )
    base = None
    for fname, fn in fns:
        t0 = time.perf_counter()
        v = float(fn(table, idxj))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(table, idxj)
        float(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        if base is None:
            base = v
        tag = "" if abs(v - base) < 1e-2 * max(1.0, abs(base)) else "  VALUE-MISMATCH"
        print(f"{name} {fname:7s} {m}x{c} from {r}: {dt:7.3f} ms{tag}", flush=True)


bench("densify", 1843200, 98304, 64)
bench("subm6", 6 * 98304, 98304, 64)
print("PAIR-GATHER PROBE DONE", flush=True)
