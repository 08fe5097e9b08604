#!/usr/bin/env python
"""Ground the bench baseline: iso-hardware (this host's CPU) comparison of
the FULL reference pipeline mirror (torch: dynamic-unique reader, dense/SubM
conv backbone, ASPP, CenterHead, numpy decode+NMS — tests/torch_mirror.py,
cited per class against /root/reference) vs this framework (JAX on the same
CPU), at the flagship nuScenes configuration (1344^2 grid, 6 task groups,
200k-point beam-structured scan).

The reference repo publishes NO throughput number (BASELINE.md); the paper's
latency setup is external and unavailable here.  This probe provides the
measurable half of the provenance: same hardware, same workload, same
semantics -> an implementation-quality ratio that does not depend on any
assumed A100 figure.

Usage: JAX_PLATFORMS=cpu python tools/baseline_probe.py [runs]
Writes tools/baseline_cpu.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
N_POINTS = 200_000
PC = [-50.4, -50.4, -5.0, 50.4, 50.4, 3.0]
VOXEL = [0.075, 0.075, 8]
TASKS = [
    ["car"], ["truck", "construction_vehicle"], ["bus", "trailer"],
    ["barrier"], ["motorcycle", "bicycle"], ["pedestrian", "traffic_cone"],
]
COMMON = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2),
          "vel": (2, 2), "iou": (1, 2)}


def main():
    import numpy as np

    from pillarnext_tpu.utils.synth import lidar_like_points

    pts, mask = lidar_like_points(1, N_POINTS, PC, seed=0)

    # ---------------- torch mirror of the reference pipeline ----------------
    import torch

    sys.path.insert(0, str(REPO / "tests"))
    import torch_mirror as tm

    torch.manual_seed(0)
    tmodel = tm.TModel(
        num_input_features=5,
        num_filters=[64, 64],
        voxel_size=VOXEL,
        pc_range=PC,
        bb_filters=[64, 128, 256, 256],
        bb_strides=[1, 2, 2, 2],
        bb_layer_nums=[2, 2, 2, 2],
        out_channels=256,
        tasks=TASKS,
        common_heads=COMMON,
        head_stride=2,
        subm=True,  # reference semantics: SubM stage-0 + masked tail
    )
    tmodel.eval()
    tm.randomize_bn_stats(tmodel, np.random.default_rng(1))
    ragged = tm.padded_to_ragged(pts, mask)

    test_cfg = {
        "post_center_limit_range": [-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        "nms": {"nms_pre_max_size": 1000, "nms_post_max_size": 83,
                "nms_iou_threshold": [[0.2], [0.2, 0.2], [0.2, 0.2], [0.2],
                                       [0.2, 0.2], [0.2, 0.2]]},
        "score_threshold": 0.1,
        "pc_range": PC,
        "voxel_size": VOXEL,
        "out_size_factor": [4] * 6,
        "nms_type": "iou3d",
    }
    rectifier = [[0.5], [0.5, 0.5], [0.5, 0.5], [0.5], [0.5, 0.5], [0.5, 0.5]]

    with torch.no_grad():
        t0 = time.perf_counter()
        preds = tmodel(ragged)
        warm = time.perf_counter() - t0
        print(f"torch mirror warmup: {warm:.1f}s", flush=True)
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            preds = tmodel(ragged)
            np_preds = [
                {k: v.numpy() for k, v in d.items()} for d in preds
            ]
            tm.reference_predict(np_preds, test_cfg, rectifier, [len(t) for t in TASKS])
            times.append(time.perf_counter() - t0)
    torch_ms = min(times) * 1000
    print(f"torch mirror e2e (best of {RUNS}): {torch_ms:.0f} ms", flush=True)

    # ---------------- this framework, same CPU ----------------
    import jax

    assert jax.default_backend() == "cpu", "run with JAX_PLATFORMS=cpu"
    import jax.numpy as jnp

    from pillarnext_tpu.utils import builders
    from pillarnext_tpu.utils.config import load_experiment

    cfg = load_experiment(
        REPO / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"
    )
    cfg["model"]["backbone"]["masked_eval"] = True  # bit-exact semantics
    cfg["model"]["post_processing"]["approx_topk"] = False
    model = builders.build_model(cfg["model"])
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts_j, mask_j)

    @jax.jit
    def predict(v, p, m):
        return model.apply(v, {"points": p, "points_mask": m}, method=model.predict)

    t0 = time.perf_counter()
    out = predict(variables, pts_j, mask_j)
    float(out["scores"].sum())
    print(f"jax cpu compile+1st: {time.perf_counter() - t0:.0f}s", flush=True)
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        out = predict(variables, pts_j, mask_j)
        float(out["scores"].sum())
        times.append(time.perf_counter() - t0)
    jax_ms = min(times) * 1000
    print(f"jax cpu e2e (best of {RUNS}): {jax_ms:.0f} ms", flush=True)

    result = {
        "workload": "flagship nuScenes 1344^2, 200k-pt beam scan, B=1, e2e predict",
        "hardware": "one shared x86 core (iso-hardware comparison)",
        "torch_mirror_ms": round(torch_ms, 1),
        "pillarnext_tpu_cpu_ms": round(jax_ms, 1),
        "speedup_iso_hardware": round(torch_ms / jax_ms, 2),
    }
    (REPO / "tools" / "baseline_cpu.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
