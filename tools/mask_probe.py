#!/usr/bin/env python
"""Isolate the cost of active-set masking in the eval backbone.

Runs the SparseResNet stage stack on a random dense (B, 1344, 1344, 64)
bf16 BEV image with mask=None vs a realistic (~4% active) mask. Identical
conv FLOPs both ways — any delta is masking overhead (fusion breakage /
extra HBM traffic).
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
from flax import linen as nn

from pillarnext_tpu.models.resnet import _Stage

FILTERS = (64, 128, 256, 256)
STRIDES = (1, 2, 2, 2)
LAYERS = (2, 2, 2, 2)
B, H, W, C = 1, 1344, 1344, 64


class Stack(nn.Module):
    use_mask: bool

    @nn.compact
    def __call__(self, x, mask):
        m = mask if self.use_mask else None
        for i, (f, s, n) in enumerate(zip(FILTERS, STRIDES, LAYERS)):
            if m is not None and s > 1:
                m = jax.lax.reduce_window(
                    m, jnp.array(0, m.dtype), jax.lax.max,
                    (1, 3, 3, 1), (1, s, s, 1),
                    ((0, 0), (1, 1), (1, 1), (0, 0)),
                )
            x = _Stage(f, s, 3, n, dtype=jnp.bfloat16, name=f"stage_{i}")(
                x, False, m
            )
        return x


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32), jnp.bfloat16)
mask = jnp.asarray(
    (rng.uniform(size=(B, H, W, 1)) < 0.04).astype(np.float32), jnp.bfloat16
)

results = {}
for name in sys.argv[1:] or ["unmasked", "masked"]:
    mod = Stack(use_mask=(name != "unmasked"))
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x, mask)

    fn = jax.jit(lambda v, x, m: jnp.sum(mod.apply(v, x, m).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(fn(variables, x, mask))
    print(f"{name:10s} compile+1st: {time.perf_counter() - t0:5.0f}s", flush=True)
    t0 = time.perf_counter()
    outs = [fn(variables, x, mask) for _ in range(20)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / 20
    print(f"{name:10s} {dt * 1000:7.1f} ms", flush=True)
