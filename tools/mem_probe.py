#!/usr/bin/env python
"""Training-step HBM probe: AOT-compile the jitted train step and print the
compiler's memory analysis (no execution — finds OOMs before they happen).

Usage: python tools/mem_probe.py [batch] [npoints] [accum_steps]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pillarnext_tpu.train import train_state as ts_lib
from pillarnext_tpu.utils import builders
from pillarnext_tpu.utils.config import load_experiment

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
ACCUM = int(sys.argv[3]) if len(sys.argv) > 3 else 1

cfg = load_experiment(
    Path(__file__).resolve().parent.parent
    / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"
)
model = builders.build_model(cfg["model"])
tasks = cfg["model"]["head"]["tasks"]
grid_h = grid_w = 1344 // 4  # out_size_factor 4
MAX_OBJS = 500

rng = np.random.default_rng(0)
pts = rng.uniform(-1, 1, (B, N, 5)).astype(np.float32) * 40
mask = np.ones((B, N), bool)

batch = {
    "points": jnp.asarray(pts),
    "points_mask": jnp.asarray(mask),
    "hm": [jnp.zeros((B, grid_h, grid_w, len(t)), jnp.float32) for t in tasks],
    "ind": [jnp.zeros((B, MAX_OBJS), jnp.int32) for _ in tasks],
    "mask": [jnp.zeros((B, MAX_OBJS), jnp.float32) for _ in tasks],
    "cat": [jnp.zeros((B, MAX_OBJS), jnp.int32) for _ in tasks],
    "anno_box": [jnp.zeros((B, MAX_OBJS, 10), jnp.float32) for _ in tasks],
    "gt_boxes": [jnp.zeros((B, MAX_OBJS, 7), jnp.float32) for _ in tasks],
}

tx, _ = ts_lib.make_optimizer(0.001, 1000)
state = ts_lib.create_train_state(
    model, {"points": batch["points"][:1], "points_mask": batch["points_mask"][:1]},
    jax.random.PRNGKey(0), tx,
)
step = ts_lib.make_train_step(model, tx, mesh=None, donate=True, accum_steps=ACCUM)

lowered = step.lower(state, batch)
compiled = lowered.compile()
ma = compiled.memory_analysis()
GB = 1024**3
print(f"B={B} N={N} accum={ACCUM}")
print(f"  argument size:   {ma.argument_size_in_bytes / GB:.2f} GB")
print(f"  output size:     {ma.output_size_in_bytes / GB:.2f} GB")
print(f"  temp size:       {ma.temp_size_in_bytes / GB:.2f} GB")
print(f"  alias size:      {ma.alias_size_in_bytes / GB:.2f} GB")
tot = ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes
print(f"  total (arg+out+temp-alias): {tot / GB:.2f} GB  (chip HBM ~15.7 GB usable)")

if "--hlo" in sys.argv:
    # dump buffer assignment's largest allocations
    txt = compiled.as_text()
    Path("/tmp/train_step_hlo.txt").write_text(txt)
    print("HLO written to /tmp/train_step_hlo.txt")
