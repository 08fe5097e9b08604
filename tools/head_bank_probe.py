#!/usr/bin/env python
"""On-chip A/B of CenterHead execution strategies at flagship shapes.

The shipped head runs 6 SepHeads sequentially — 6 deblocks + 84 small 3x3
convs of 64 channels (12.2 ms of the 73.7 ms e2e, BENCH_r03).  The exact
grouped-conv fusion (MergedSepHeads) lost its A/B badly (67 ms — XLA's TPU
lowering of feature_group_count is pathological at these shapes).  This
probe measures the one untried exact transform (VERDICT r3 #4): move the
task/branch axis into a dot_general BATCH dimension and express each 3x3
conv bank as 9 shifted batched matmuls — no feature_group_count anywhere,
mathematically identical (same weights, same taps, same sums).

Strategies:
  ship     : the real CenterHead module (merge_tasks=False) — baseline
  mbranch  : real CenterHead with merge_branches=True (per-task conv1 fused
             64->R*64 dense)
  bank     : task-batched einsum bank (this probe's hand-rolled function)

Usage: python tools/head_bank_probe.py [batch] [f32|bf16]
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pillarnext_tpu.models.centerhead import CenterHead

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
DT = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") else jnp.bfloat16
H = W = 168  # backbone/neck output at the 1344^2 flagship grid (stride 8)
CIN = 256
HC = 64
TASKS = [["car"], ["truck", "construction_vehicle"], ["bus", "trailer"],
         ["barrier"], ["motorcycle", "bicycle"], ["pedestrian", "traffic_cone"]]
COMMON = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2),
          "vel": (2, 2)}
T = len(TASKS)
BRANCHES = list(COMMON) + ["hm"]
R = len(BRANCHES)
CP = 4  # padded out-channels for the conv2 bank (max(3 dim, 2 hm classes))


def _fence(out):
    # axon tunnel: block_until_ready does NOT fence; fetch a scalar leaf
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def bench(fn, *args, reps=20):
    _fence(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    _fence(outs[-1])
    return (time.perf_counter() - t0) / reps


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (B, H, W, CIN)).astype(np.float32), DT)

# ---------------- shipped module paths ----------------
for label, kw in [("ship", {}), ("mbranch", {"merge_branches": True})]:
    head = CenterHead(
        in_channels=CIN, tasks=TASKS, weight=0.25,
        code_weights=[1.0] * 10, common_heads=COMMON,
        strides=[2] * T, dtype=DT, **kw,
    )
    variables = jax.jit(head.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def run(v, xx, head=head):
        outs = head.apply(v, xx)
        return [jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), o) for o in outs]

    t0 = time.perf_counter()
    dt = bench(run, variables, x)
    print(f"{label:8s} {dt * 1000:7.2f} ms  (compile+20 {time.perf_counter() - t0:.0f}s)",
          flush=True)

# ---------------- task-batched einsum bank ----------------
def init_bank(key):
    k = jax.random.split(key, 8)
    sc = 0.05
    return {
        "w_sh": jax.random.normal(k[0], (3, 3, CIN, HC), DT) * sc,
        "w_db": jax.random.normal(k[1], (2, 2, T * HC, HC), DT) * sc,  # per flax CT: (kh,kw,in? ...)
        "w1": jax.random.normal(k[2], (9, T, HC, R * HC), DT) * sc,
        "b1": jnp.zeros((T, R * HC), DT),
        "w2": jax.random.normal(k[3], (9, T * R, HC, CP), DT) * sc,
        "b2": jnp.zeros((T * R, CP), DT),
    }


def taps(xp):
    """9 shifted views of a (..., H+2, W+2, C) padded map -> list of (..., H, W, C)."""
    return [xp[..., dy:dy + H * 2, dx:dx + W * 2, :] for dy in range(3) for dx in range(3)]


@jax.jit
def run_bank(p, xx):
    # shared conv (same as shipped; timed for apples-to-apples totals)
    x1 = jax.lax.conv_general_dilated(
        xx, p["w_sh"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    x1 = jax.nn.relu(x1)
    # merged deblock: ONE ConvTranspose 64 -> T*64 (exact concat of the T
    # per-task deblocks; dense, no groups)
    y = jax.lax.conv_transpose(
        x1, p["w_db"].transpose(0, 1, 3, 2), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, 2H, 2W, T*HC)
    y = jax.nn.relu(y)
    b, h2, w2, _ = y.shape
    # tasks -> batch dim of a dot_general
    yt = y.reshape(b, h2, w2, T, HC).transpose(3, 0, 1, 2, 4)  # (T,B,2H,2W,HC)
    ytp = jnp.pad(yt, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    h = None
    for tap, sl in enumerate(taps(ytp)):
        d = jnp.einsum("tbhwc,tcd->tbhwd", sl, p["w1"][tap],
                       preferred_element_type=jnp.float32)
        h = d if h is None else h + d
    h = jax.nn.relu((h + p["b1"][:, None, None, None, :]).astype(DT))
    # (T,B,2H,2W,R*HC) -> (T*R, B, 2H, 2W, HC)
    h = h.reshape(T, b, h2, w2, R, HC).transpose(0, 4, 1, 2, 3, 5)
    h = h.reshape(T * R, b, h2, w2, HC)
    hp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    o = None
    for tap, sl in enumerate(taps(hp)):
        d = jnp.einsum("tbhwc,tcd->tbhwd", sl, p["w2"][tap],
                       preferred_element_type=jnp.float32)
        o = d if o is None else o + d
    o = o + p["b2"][:, None, None, None, :]
    return jnp.sum(o)


pbank = init_bank(jax.random.PRNGKey(1))
t0 = time.perf_counter()
dt = bench(run_bank, pbank, x)
print(f"{'bank':8s} {dt * 1000:7.2f} ms  (compile+20 {time.perf_counter() - t0:.0f}s)",
      flush=True)


# ---------------- merge_branches + BLOCK-DIAGONAL merged conv2 ----------------
# Per task: conv1 64 -> R*64 (exact branch fusion, one dispatch) then ONE
# dense conv R*64 -> 16 whose weight is block-structured: out lane j of
# branch b reads only channels [b*64, b*64+64) — the off-block weights are
# structurally ZERO, so the math is exactly the 6 separate branch convs,
# at 6x redundant (but nearly free: 61 GFLOP total) MXU work.  18 dispatches
# for the whole head instead of 84.
CO = 16  # sum of padded per-branch outs packed into one conv (13 used)


def init_mb_blk(key):
    k = jax.random.split(key, 4)
    sc = 0.05
    w2 = np.zeros((3, 3, R * HC, CO), np.float32)
    col = 0
    rng2 = np.random.default_rng(7)
    for b_i, name in enumerate(BRANCHES):
        c = {"reg": 2, "height": 1, "dim": 3, "rot": 2, "vel": 2, "hm": 2}[name]
        w2[:, :, b_i * HC:(b_i + 1) * HC, col:col + c] = rng2.normal(
            0, sc, (3, 3, HC, c)
        )
        col += c
    return {
        "w_sh": jax.random.normal(k[0], (3, 3, CIN, HC), DT) * sc,
        "w_db": jax.random.normal(k[1], (T, 2, 2, HC, HC), DT) * sc,
        "w1": jax.random.normal(k[2], (T, 3, 3, HC, R * HC), DT) * sc,
        "w2": jnp.asarray(np.broadcast_to(w2, (T, 3, 3, R * HC, CO)), DT),
    }


@jax.jit
def run_mb_blk(p, xx):
    x1 = jax.lax.conv_general_dilated(
        xx, p["w_sh"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    x1 = jax.nn.relu(x1)
    total = 0.0
    for t in range(T):
        y = jax.lax.conv_transpose(
            x1, p["w_db"][t], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jax.nn.relu(y)
        h = jax.lax.conv_general_dilated(
            y, p["w1"][t], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = jax.nn.relu(h)
        o = jax.lax.conv_general_dilated(
            h, p["w2"][t], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        total = total + jnp.sum(o.astype(jnp.float32))
    return total


pmb = init_mb_blk(jax.random.PRNGKey(2))
t0 = time.perf_counter()
dt = bench(run_mb_blk, pmb, x)
print(f"{'mb_blk':8s} {dt * 1000:7.2f} ms  (compile+20 {time.perf_counter() - t0:.0f}s)",
      flush=True)
