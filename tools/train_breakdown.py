#!/usr/bin/env python
"""Per-stage TRAIN (fwd+bwd) timing on the real chip, by truncated-model
bisection: grad through reader only, then reader+stage0, +stage1, ... up to
the full extract_feat (all-sparse train path, flagship config).  Deltas
attribute the train step's feature cost per stage (VERDICT r2 item 3).

Usage: python tools/train_breakdown.py [batch] [npoints]
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

from pillarnext_tpu.utils import builders
from pillarnext_tpu.utils.config import load_experiment
from pillarnext_tpu.utils.synth import lidar_like_points

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

BASE = Path(__file__).resolve().parent.parent / (
    "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"
)

FULL_LN = [2, 2, 2, 2]
FULL_ST = [1, 2, 2, 2]
FULL_NF = [64, 128, 256, 256]


def build(k_stages, with_neck):
    cfg = load_experiment(BASE)
    bb = cfg["model"]["backbone"]
    bb["layer_nums"] = FULL_LN[:k_stages]
    bb["ds_layer_strides"] = FULL_ST[:k_stages]
    bb["ds_num_filters"] = FULL_NF[:k_stages]
    if not with_neck:
        cfg["model"].pop("neck", None)
    return builders.build_model(cfg["model"])


def time_grad(name, model, reader_only=False):
    pts, mask = lidar_like_points(B, N, [-50.4, -50.4, -5.0, 50.4, 50.4, 3.0], seed=0)
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts_j[:1], mask_j[:1])

    if reader_only:
        def fwd(v, p, m):
            out, _ = model.apply(
                v, p, m, True,
                method=lambda mdl, pp, mm, t: mdl.reader(pp, mm, t),
                mutable=["batch_stats", "telemetry"],
            )
            tbl = out.table if hasattr(out, "table") else out
            return jnp.sum(tbl.astype(jnp.float32) ** 2)
    else:
        def fwd(v, p, m):
            out, _ = model.apply(
                v, p, m, True,
                method=lambda mdl, pp, mm, t: mdl.extract_feat(pp, mm, t),
                mutable=["batch_stats", "telemetry"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

    @jax.jit
    def g(v, p, m):
        grads = jax.grad(lambda params: fwd({**v, "params": params}, p, m))(
            v["params"]
        )
        return sum(
            jnp.sum(jnp.abs(x).astype(jnp.float32)) for x in jax.tree.leaves(grads)
        )

    t0 = time.perf_counter()
    float(g(variables, pts_j, mask_j))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [g(variables, pts_j, mask_j) for _ in range(5)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / 5 * 1000
    return dt, compile_s


prev = 0.0
rows = [
    ("reader", build(1, False), True),
    ("+stage0", build(1, False), False),
    ("+stage1", build(2, False), False),
    ("+stage2", build(3, False), False),
    ("+stage3", build(4, False), False),
    ("+neck", build(4, True), False),
]
for name, model, reader_only in rows:
    ms, cs = time_grad(name, model, reader_only)
    print(
        f"{name:8s} cum {ms:7.0f} ms  (delta {ms - prev:+7.0f}, compile {cs:.0f}s)",
        flush=True,
    )
    prev = ms
print("TRAIN-BREAKDOWN DONE", flush=True)
