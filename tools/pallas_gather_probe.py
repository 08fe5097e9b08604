#!/usr/bin/env python
"""Pick the in-kernel gather mechanism for a Pallas SubM-conv kernel.

The XLA row-gather in ops/subm_conv.py runs at ~25 GB/s effective (measured:
stage0 = 5 SubM convs at cap 98304, C 64 costs 21 ms of the 87 ms flagship
eval).  Because compact slots are assigned in dense row-major order
(ops/compact.py:47-62), all 9 neighbor slots of a 256-slot tile live in a
bounded window of the table -> DMA the window to VMEM once and gather
in-core.  This probe times, at flagship stage-0 shape:

  A. XLA row-gather + matmul (current ops/subm_conv.py forward)
  B. Pallas windowed kernel, per-tap jnp.take from a VMEM window
  C. Pallas windowed kernel, per-tap one-hot matmul (MXU gather)

and checks both against A for exactness.

Usage: python tools/pallas_gather_probe.py [cap] [C]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
CAP = nums[0] if nums else 98304
C = nums[1] if len(nums) > 1 else 64
K = 9
T = 256          # output tile (slots per grid step)
WB = 1024        # window block unit
WIN = 2 * WB     # VMEM window rows
H = W = 1344
DT = jnp.bfloat16

# ---- synthesize a LiDAR-like active set + neighbor table (host) ----------
rng = np.random.default_rng(0)
n_pts = 220_000
r = np.abs(rng.normal(0, 18, n_pts)) + 2
th = rng.uniform(-np.pi, np.pi, n_pts)
xs = np.clip(((r * np.cos(th)) / 0.075 + H / 2).astype(np.int64), 0, H - 1)
ys = np.clip(((r * np.sin(th)) / 0.075 + W / 2).astype(np.int64), 0, W - 1)
dense = np.unique(ys * W + xs)
n_act = min(len(dense), CAP)
dense = dense[:n_act]
print(f"active sites: {n_act} / cap {CAP}")

slot_of_dense = np.full(H * W, CAP, np.int32)
slot_of_dense[dense] = np.arange(n_act, dtype=np.int32)
slot_id = np.full(CAP, H * W + 7, np.int32)
slot_id[:n_act] = dense

# neighbor table (cap, 9), CAP = inactive
offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
nbr = np.full((CAP, K), CAP, np.int32)
yy, xx = dense // W, dense % W
for k, (dy, dx) in enumerate(offs):
    ny, nx = yy + dy, xx + dx
    ok = (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
    nd = np.where(ok, ny * W + nx, 0)
    nbr[:n_act, k] = np.where(ok, slot_of_dense[nd], CAP)

# per-tile window bases (units of WB) + span check
n_tiles = CAP // T
slot_idx = np.arange(CAP, dtype=np.int32)
eff = np.where(nbr < CAP, nbr, slot_idx[:, None])  # inactive -> self
mn = eff.reshape(n_tiles, -1).min(1)
mx = eff.reshape(n_tiles, -1).max(1)
bases = (mn // WB).astype(np.int32)
span = mx - bases * WB
print(f"max span from aligned base: {span.max()} (window {WIN})")
assert span.max() < WIN, "window overflow on synth data"

table = rng.normal(0, 1, (CAP + 1, C)).astype(np.float32)
table[CAP] = 0
table[n_act:CAP] = 0
kern = (rng.normal(0, 0.1, (K, C, C)).astype(np.float32))

# padded table so window blocks never run off the end
pad_rows = ((CAP + 1 + WIN - 1) // WB + 1) * WB
table_pad = np.zeros((pad_rows, C), np.float32)
table_pad[: CAP + 1] = table

j_table = jnp.asarray(table, DT)
j_table_pad = jnp.asarray(table_pad, DT)
j_nbr = jnp.asarray(nbr)
j_bases = jnp.asarray(bases)
j_kern = jnp.asarray(kern, DT)


# ---- A: XLA row gather (current) -----------------------------------------
@jax.jit
def conv_xla(table, nbr, kern):
    cap, k = nbr.shape
    cin = table.shape[-1]
    x = table[nbr.reshape(-1)].reshape(cap, k * cin)
    return jax.lax.dot(x, kern.reshape(k * cin, -1).astype(table.dtype))


# ---- B: Pallas windowed take ---------------------------------------------
def _kernel_take(bases_ref, nbr_ref, wlo_ref, whi_ref, k_ref, o_ref, scratch):
    scratch[0:WB, :] = wlo_ref[:]
    scratch[WB:WIN, :] = whi_ref[:]
    base = bases_ref[pl.program_id(0)] * WB
    nbr = nbr_ref[:]                              # (T, K) int32
    rel = jnp.clip(nbr - base, 0, WIN - 1)
    valid = (nbr < CAP).astype(DT)[:, :, None]    # (T, K, 1)
    acc = jnp.zeros((T, C), jnp.float32)
    for k in range(K):
        idx = jnp.broadcast_to(rel[:, k].reshape(T, 1), (T, C))
        xg = jnp.take_along_axis(scratch[:], idx, axis=0)
        xg = xg * valid[:, k]
        acc = acc + jnp.dot(xg, k_ref[k], preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(DT)


def make_take():
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, K), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, C), lambda i, b: (b[i], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, C), lambda i, b: (b[i] + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, C), lambda i, b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, C), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WIN, C), DT)],
    )
    f = pl.pallas_call(
        _kernel_take,
        out_shape=jax.ShapeDtypeStruct((CAP, C), DT),
        grid_spec=grid_spec,
    )
    return jax.jit(lambda b, n, t, k: f(b, n, t, t, k))


# ---- C: Pallas windowed one-hot matmul -----------------------------------
def _kernel_onehot(bases_ref, nbr_ref, wlo_ref, whi_ref, k_ref, o_ref, scratch):
    scratch[0:WB, :] = wlo_ref[:]
    scratch[WB:WIN, :] = whi_ref[:]
    base = bases_ref[pl.program_id(0)] * WB
    nbr = nbr_ref[:]
    rel = jnp.where(nbr < CAP, nbr - base, WIN)   # WIN -> matches nothing
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, WIN), 1)
    acc = jnp.zeros((T, C), jnp.float32)
    for k in range(K):
        oh = (cols == rel[:, k][:, None]).astype(DT)      # (T, WIN)
        xg = jnp.dot(oh, scratch[:], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(
            xg.astype(DT), k_ref[k], preferred_element_type=jnp.float32
        )
    o_ref[:] = acc.astype(DT)


def make_onehot():
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, K), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, C), lambda i, b: (b[i], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, C), lambda i, b: (b[i] + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, C), lambda i, b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, C), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WIN, C), DT)],
    )
    f = pl.pallas_call(
        _kernel_onehot,
        out_shape=jax.ShapeDtypeStruct((CAP, C), DT),
        grid_spec=grid_spec,
    )
    return jax.jit(lambda b, n, t, k: f(b, n, t, t, k))


def timed(name, fn, args, reps=30):
    """Time with a D2H fence (block_until_ready does not fence through the
    axon tunnel — float(sum) forces real execution)."""
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        print(f"{name:10s} compile+1st: {time.perf_counter() - t0:6.1f}s", flush=True)
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        float(jnp.sum(outs[-1].astype(jnp.float32)))  # drains the exec queue
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:10s} {dt * 1e3:7.3f} ms", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)
        return None


# fence floor: cost of the eager sum+D2H itself on a tiny array
tiny = jnp.zeros((8, 8), jnp.float32)
t0 = time.perf_counter()
for _ in range(30):
    float(jnp.sum(tiny))
print(f"fence floor: {(time.perf_counter() - t0) / 30 * 1e3:.3f} ms", flush=True)

ref = timed("xla", conv_xla, (j_table, j_nbr, j_kern))
for name, mk in [("take", make_take), ("onehot", make_onehot)]:
    out = timed(name, mk(), (j_bases, j_nbr, j_table_pad, j_kern))
    if out is not None and ref is not None:
        d = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"{name:10s} max |diff| vs xla = {d:.3e}", flush=True)
