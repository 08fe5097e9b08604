#!/usr/bin/env python
"""A/B masking formulations for the masked-dense eval path at stage-0 scale.

5 convs of 64ch at 1344^2 (= flagship stage 0), eval-mode BN, with:
  none    no masking
  mul     relu(bn(conv)) * bf16 mask (current prod formulation)
  sel     where(bool mask, relu, 0)
  premul  relu(bn(conv)) then mask multiplied into the NEXT conv input
  full    mask pre-broadcast to (B,H,W,64) once, mul per block
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

B, H, W, C = 1, 1344, 1344, 64
N_CONV = 5

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32), jnp.bfloat16)
m_b16 = jnp.asarray((rng.uniform(size=(B, H, W, 1)) < 0.04).astype(np.float32), jnp.bfloat16)
m_bool = m_b16 > 0
m_full = jnp.broadcast_to(m_b16, (B, H, W, C))
k = jnp.asarray(rng.normal(0, 0.05, (N_CONV, 3, 3, C, C)).astype(np.float32), jnp.bfloat16)
inv = jnp.asarray(rng.uniform(0.5, 1.5, (N_CONV, C)).astype(np.float32), jnp.bfloat16)
shift = jnp.asarray(rng.normal(0, 0.1, (N_CONV, C)).astype(np.float32), jnp.bfloat16)


def convbn(x, i):
    y = jax.lax.conv_general_dilated(
        x, k[i], (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jax.nn.relu(y * inv[i] + shift[i])


def run(variant):
    def f(x):
        for i in range(N_CONV):
            if variant == "premul" and i > 0:
                x = x * m_b16
            x = convbn(x, i)
            if variant == "mul":
                x = x * m_b16
            elif variant == "sel":
                x = jnp.where(m_bool, x, jnp.zeros((), x.dtype))
            elif variant == "full":
                x = x * m_full
        return jnp.sum(x.astype(jnp.float32))

    fn = jax.jit(f)
    t0 = time.perf_counter()
    float(fn(x0))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(x0) for _ in range(20)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / 20
    print(f"{variant:8s} {dt * 1000:7.2f} ms   (compile {c:4.0f}s)", flush=True)


for v in sys.argv[1:] or ["none", "mul", "sel", "premul", "full"]:
    run(v)
