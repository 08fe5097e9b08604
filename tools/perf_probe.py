#!/usr/bin/env python
"""Quick stage-timing probe on the real chip.

Usage: python tools/perf_probe.py [reader|feat|forward|predict|train] [batch] [npoints]
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

STAGE = sys.argv[1] if len(sys.argv) > 1 else "predict"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
N = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000

cfg = load_experiment(
    Path(__file__).resolve().parent.parent
    / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"
)
import os

if os.environ.get("PNX_NO_REMAT"):
    cfg["model"]["backbone"]["remat_train"] = False
if os.environ.get("PNX_SPARSE_ALL"):
    cfg["model"]["backbone"]["sparse_stages_train"] = "all"
    cfg["model"]["backbone"]["sparse_stages_eval"] = "all"
if os.environ.get("PNX_SPARSE_LEADING"):
    cfg["model"]["backbone"]["sparse_stages_train"] = "leading"
if os.environ.get("PNX_SPARSE_LD"):
    # r5 re-A/B: sparse prefix + sparse strided downsample, densify at 672^2
    # (lost at r3, 12.19 vs 12.61 fps — but predates the r4 tap-decomposed
    # gathers and the a415c17 table-build cuts, both of which it benefits
    # from and the full-grid densify path does not)
    cfg["model"]["backbone"]["sparse_stages_eval"] = "leading+down"
if os.environ.get("PNX_STAGE_FRACS"):
    cfg["model"]["backbone"]["stage_capacity_frac"] = [
        float(f) for f in os.environ["PNX_STAGE_FRACS"].split(",")
    ]
if os.environ.get("PNX_NO_FUSE"):
    cfg["model"]["head"]["fuse_eval"] = False
if os.environ.get("PNX_NO_CS"):
    cfg["model"]["post_processing"]["candidate_sparse_head"] = False
if os.environ.get("PNX_TILE"):
    # stride-1 stages over the active-tile stack (ops/tile_subm.py)
    cfg["model"]["backbone"]["tile_stride1"] = True
if os.environ.get("PNX_TILE_CAP"):
    cfg["model"]["backbone"]["tile_capacity"] = int(os.environ["PNX_TILE_CAP"])
if os.environ.get("PNX_BATCH_CAP"):
    # per-sample pillar capacity override: the default scales capacities
    # linearly with B; at large B real scenes never fill that (diagnostic
    # for the B=8 train regression)
    cfg["model"]["reader"]["pillar_capacity"] = int(os.environ["PNX_BATCH_CAP"])
    cfg["model"]["reader"]["train_pillar_capacity"] = int(os.environ["PNX_BATCH_CAP"])
# the train stage measures the model the TRAINER builds (train=True applies
# reader.train_pillar_capacity — without this the probe timed the EVAL
# capacity, 98304 at flagship, not the 73728 training operating point)
model = builders.build_model(cfg["model"], train=(STAGE == "train"))
from pillarnext_tpu.utils.synth import lidar_like_points

rng = np.random.default_rng(0)
pc = cfg["model"]["reader"]["pc_range"]
pts, mask = lidar_like_points(B, N, pc, seed=0)
pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts_j[:1], mask_j[:1])
jax.block_until_ready(variables)


def run(name, fn, reps=10):
    t0 = time.perf_counter()
    float(fn(variables, pts_j, mask_j))
    print(f"{name} compile+1st: {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    # fence ONCE on the last output: a per-call float() fetch adds the
    # ~26 ms tunnel RTT to every rep (measured; it inflated r3/r4 probe
    # numbers) — dispatches queue in order, so fetching the last scalar
    # bounds all reps
    outs = [fn(variables, pts_j, mask_j) for _ in range(reps)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name} B={B}: {dt * 1000:.0f} ms  ({B / dt:.2f} fps)", flush=True)


if STAGE == "reader":
    @jax.jit
    def fn(v, p, m):
        return model.apply(v, p, m, method=lambda mdl, pp, mm: mdl.reader(pp, mm, False)).sum()
    run("reader", fn)
elif STAGE == "feat":
    @jax.jit
    def fn(v, p, m):
        return model.apply(v, p, m, method=lambda mdl, pp, mm: mdl.extract_feat(pp, mm, False)).sum()
    run("feat", fn)
elif STAGE == "forward":
    @jax.jit
    def fn(v, p, m):
        preds = model.apply(v, p, m)
        return sum(jnp.sum(x) for d in preds for x in d.values())
    run("forward", fn)
elif STAGE == "predict":
    @jax.jit
    def fn(v, p, m):
        out = model.apply(v, {"points": p, "points_mask": m}, method=model.predict)
        return out["scores"].sum()
    run("predict", fn)
elif STAGE == "train":
    from pillarnext_tpu.data.assign import AssignLabel
    from pillarnext_tpu.data.collate import collate
    from pillarnext_tpu.parallel import mesh as mesh_lib
    from pillarnext_tpu.train import train_state as ts_lib

    pl = cfg["data"]["train_dataset"]["prepare_label"]["centermap"]
    assigner = AssignLabel(
        tasks=pl["tasks"], gaussian_overlap=pl["gaussian_overlap"], max_objs=500,
        min_radius=pl["min_radius"], pc_range=cfg["model"]["reader"]["pc_range"],
        voxel_size=cfg["model"]["reader"]["voxel_size"],
        out_size_factor=pl["out_size_factor"],
    )
    samples = []
    for i in range(B):
        boxes = np.zeros((40, 9), np.float32)
        boxes[:, :2] = rng.uniform(-45, 45, (40, 2))
        boxes[:, 3:6] = rng.uniform(0.5, 4.0, (40, 3))
        boxes[:, 8] = rng.uniform(-3, 3, 40)
        res = {"token": f"t{i}", "points": pts[i],
               "annotations": {"gt_boxes": boxes,
                               "gt_names": np.array(["car"] * 40)}}
        res = assigner(res)
        del res["annotations"]
        samples.append(res)
    batch = collate(samples, max_points=N)
    example = {k: v for k, v in batch.items() if k != "token"}

    mesh = mesh_lib.make_mesh(jax.devices()[:1])
    tx, _ = ts_lib.make_optimizer(max_lr=1e-3, total_steps=100)
    state = ts_lib.create_train_state(model, example, jax.random.PRNGKey(0), tx)
    step = ts_lib.make_train_step(model, tx, mesh, donate=False)
    sharded = mesh_lib.shard_batch(example, mesh)

    t0 = time.perf_counter()
    state, (sc, _) = step(state, sharded)
    print(f"train compile+1st: {time.perf_counter() - t0:.0f}s loss={float(sc['loss']):.2f}", flush=True)
    t0 = time.perf_counter()
    scs = []
    for _ in range(10):
        state, (sc, _) = step(state, sharded)
        scs.append(sc)
    _ = float(scs[-1]["loss"])  # fence once (see run())
    dt = (time.perf_counter() - t0) / 10
    print(f"train B={B}: {dt * 1000:.0f} ms  ({B / dt:.2f} frames/s)", flush=True)
elif STAGE == "trainfeat":
    # backward of the feature extractor only: separates backbone fwd+bwd
    # cost from head/loss cost in the full train step
    @jax.jit
    def g(v, p, m):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                p, m,
                method=lambda mdl, pp, mm: mdl.extract_feat(pp, mm, True),
                mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)
        grads = jax.grad(f)(v["params"])
        return sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) for x in jax.tree.leaves(grads))

    t0 = time.perf_counter()
    float(g(variables, pts_j, mask_j))
    print(f"trainfeat compile+1st: {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    outs = [g(variables, pts_j, mask_j) for _ in range(5)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / 5
    print(f"trainfeat B={B}: {dt * 1000:.0f} ms", flush=True)
else:
    raise SystemExit(f"unknown stage {STAGE}")
