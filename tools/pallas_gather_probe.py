#!/usr/bin/env python
"""Compile + bit-exactness + timing of the windowed Pallas row gather on the
real chip, at the flagship production shapes:

- densify: 1.8M dense rows from a 98k-slot table, C=64 (eval reader tail)
- PFN back-gather: 300k sorted points from a 96k-slot table, C=32

Compares against the XLA gather it replaces (must be bit-identical).
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

from pillarnext_tpu.ops.pallas_gather import monotone_row_gather


def xla_ref(table, idx):
    r = table.shape[0]
    safe = jnp.minimum(idx, r - 1)
    return jnp.where((idx < r)[:, None], table[safe], jnp.zeros((), table.dtype))


def bench(name, m, r, c, active_frac, dtype=jnp.bfloat16, reps=30):
    rng = np.random.default_rng(0)
    n_real = int(m * active_frac)
    pos = np.sort(rng.choice(m, n_real, replace=False))
    idx = np.full(m, r, np.int32)
    idx[pos] = np.minimum(np.arange(n_real), r - 1)
    table = jnp.asarray(rng.standard_normal((r, c)), dtype)
    idxj = jnp.asarray(idx)

    # scalar-returning timed fns: through the axon tunnel, block_until_ready
    # on a large remote buffer does not reliably fence execution — fetching a
    # scalar that data-depends on the full output does.
    ref_s = jax.jit(lambda t, i: xla_ref(t, i).astype(jnp.float32).sum())
    variants = [("xla", ref_s)]
    for tl in (256, 512, 1024):
        variants.append(
            (
                f"pl-{tl}",
                jax.jit(
                    lambda t, i, tl=tl: monotone_row_gather(t, i, tile=tl)
                    .astype(jnp.float32)
                    .sum()
                ),
            )
        )

    for fname, fn in variants:
        t0 = time.perf_counter()
        float(fn(table, idxj))
        print(f"{name} {fname:7s} compile+1st: {time.perf_counter() - t0:6.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(table, idxj)
        float(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name} {fname:7s} {m}x{c} from {r}: {dt:7.3f} ms", flush=True)

    pal = jax.jit(lambda t, i: monotone_row_gather(t, i))
    ref = jax.jit(xla_ref)

    a = np.asarray(ref(table, idxj), np.float32)
    b = np.asarray(pal(table, idxj), np.float32)
    exact = np.array_equal(a, b)
    print(f"{name} bit-exact: {exact}", flush=True)
    assert exact


bench("densify", 1843200, 98304, 64, 0.05)
bench("pfn-back", 299520, 98304, 32, 0.8)
print("PALLAS-GATHER OK", flush=True)
