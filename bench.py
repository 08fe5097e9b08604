#!/usr/bin/env python
"""End-to-end inference benchmark on the flagship model (PillarNeXt-B,
nuScenes config): points -> pillar scatter -> PFN -> dense ResNet18 -> ASPP ->
CenterHead decode -> on-device rotated NMS, full 1344x1344 pillar grid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

SEMANTICS: the measured configuration is BIT-EXACT (masked_eval=true +
exact top-k — full spconv active-set semantics and exact candidate
selection); the accuracy-trading fast variants are opt-in flags, not the
benchmark.  tools/metric_delta.py measures their mAP/NDS cost end-to-end.

vs_baseline: the reference repo publishes no in-repo throughput number
(SURVEY.md §6); the comparison point is the reference PillarNeXt-B end-to-end
rate on an A100 (~16 fps: ~62 ms/frame network + host NMS, per the CVPR 2023
paper's timing setup).  vs_baseline = value / 16.0.  tools/baseline_probe.py
additionally grounds an iso-hardware (same host CPU) ratio of this framework
vs the full reference-mirror pipeline — see tools/baseline_cpu.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

REFERENCE_A100_FPS = 16.0
BATCH = 1
N_POINTS = 200_000
WARMUP = 2
ITERS = 20
REPS = 5  # timed loops; the headline is the MEDIAN rep (artifact defense)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from pillarnext_tpu.utils import builders
    from pillarnext_tpu.utils.config import load_experiment

    cfg = load_experiment(
        REPO / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"
    )
    model = builders.build_model(cfg["model"])

    # beam-structured LiDAR-like scene (~65k occupied pillars at 200k points
    # — the measured regime of real 10-sweep scans; a diffuse spray occupies
    # 2-3x more pillars and misstates reader/sparse-conv/NMS cost)
    from pillarnext_tpu.utils.synth import lidar_like_points

    pc = cfg["model"]["reader"]["pc_range"]
    pts, mask = lidar_like_points(BATCH, N_POINTS, pc, seed=0)

    pts_j = jnp.asarray(pts)
    mask_j = jnp.asarray(mask)
    variables = model.init(jax.random.PRNGKey(0), pts_j[:1], mask_j[:1])

    @jax.jit
    def predict(v, points, points_mask):
        return model.apply(
            v, {"points": points, "points_mask": points_mask}, method=model.predict
        )

    # Serving path: optimistic bucketed capacity (pillarnext_tpu/serving.py).
    # Frames dispatch at the 3/4 bucket; the on-device overflow telemetry is
    # checked at resolve() and any overflowed frame is recomputed at the full
    # capacity — resolved outputs are bit-equal to full-capacity predict, and
    # the repair cost (if any) is inside the timed loop.
    from pillarnext_tpu.serving import AdaptivePredictor

    engine = AdaptivePredictor(cfg["model"], variables)

    # NOTE: under the axon tunnel, block_until_ready does not synchronize —
    # fetching output arrays is the only honest fence.  Throughput is
    # measured pipelined: dispatch all iterations, fence once at the end
    # (per-call fetch would add one tunnel round-trip per batch).
    def fetch(out):
        return np.asarray(out["scores"]).sum()

    engine.warmup(pts_j, mask_j)  # compile all buckets incl. the repair path
    for _ in range(WARMUP):
        fetch(engine.resolve([engine(pts_j, mask_j)])[0])

    # WARM-STATE GATE: a cold persistent-compile cache or a stalled device
    # tunnel can make the first timed loop 5-10x slower than steady state
    # (this corrupted the round-4 official record).  Keep running single
    # frames until two consecutive latencies agree within 2x, then require
    # the last one to be < 1 s/frame before any timed loop starts.
    prev = None
    for _ in range(10):
        t0 = time.perf_counter()
        fetch(engine.resolve([engine(pts_j, mask_j)])[0])
        cur = time.perf_counter() - t0
        if prev is not None and cur < 2 * prev and prev < 2 * cur and cur < 1.0:
            break
        prev = cur

    def timed_loop():
        t0 = time.perf_counter()
        outs = engine.resolve([engine(pts_j, mask_j) for _ in range(ITERS)])
        fetch(outs[-1])
        return time.perf_counter() - t0

    def run_reps():
        per_iter_ms = sorted(timed_loop() / ITERS * 1000 for _ in range(REPS))
        return per_iter_ms  # ascending

    reps_ms = run_reps()
    e2e_ms = reps_ms[len(reps_ms) // 2]  # median rep
    fps = BATCH * 1000.0 / e2e_ms

    # stage breakdown (reader -> features -> +head -> +decode/NMS) so the
    # headline number is explainable; approximate MFU from the model's
    # ~2.7 TFLOP/frame against the v5e bf16 peak
    @jax.jit
    def feat(v, points, points_mask):
        return jnp.sum(
            model.apply(
                v, points, points_mask,
                method=lambda m, p, q: m.extract_feat(p, q, False),
            ).astype(jnp.float32)
        )

    @jax.jit
    def fwd(v, points, points_mask):
        preds = model.apply(v, points, points_mask)
        return sum(jnp.sum(x.astype(jnp.float32)) for d in preds for x in d.values())

    def timeit(fn, fence):
        fence(fn(variables, pts_j, mask_j))
        t = time.perf_counter()
        outs = [fn(variables, pts_j, mask_j) for _ in range(ITERS)]
        fence(outs[-1])
        return (time.perf_counter() - t) / ITERS * 1000

    feat_ms = timeit(feat, lambda o: float(o))
    fwd_ms = timeit(fwd, lambda o: float(o))

    # INTERNAL CONSISTENCY CHECK: e2e should be ~= forward + decode/NMS
    # (~3 ms).  A residual beyond 12 ms means the engine loop hit an
    # environment stall (cold cache / tunnel hiccup), not the model —
    # re-measure the whole rep set once; if it persists, flag the record.
    suspect = False
    if e2e_ms - fwd_ms > 12.0:
        reps_ms = run_reps()
        e2e_ms = reps_ms[len(reps_ms) // 2]
        fps = BATCH * 1000.0 / e2e_ms
        suspect = e2e_ms - fwd_ms > 12.0
    # MFU from XLA's own FLOP count of the compiled predict when available
    # (counts the sparse paths actually executed); hand count as fallback
    try:
        cost = predict.lower(variables, pts_j, mask_j).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        model_tflop = float(cost["flops"]) / 1e12
        flops_src = "xla_cost_analysis"
    except Exception:  # noqa: BLE001 - axon backend may not expose costs
        model_tflop = 2.7 * BATCH  # backbone 2.0 + neck 0.23 + head ~0.45
        flops_src = "hand_count"
    print(
        json.dumps(
            {
                "metric": "pillarnext_b_nusc_e2e_inference",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / REFERENCE_A100_FPS, 3),
                "breakdown_ms": {
                    "features": round(feat_ms, 1),
                    "head": round(fwd_ms - feat_ms, 1),
                    "decode_nms": round(e2e_ms - fwd_ms, 1),
                    "e2e": round(e2e_ms, 1),
                    "e2e_rep_min": round(reps_ms[0], 1),
                    "e2e_rep_max": round(reps_ms[-1], 1),
                },
                "suspect": suspect,
                "approx_mfu": round(model_tflop / (e2e_ms / 1000) / 98.3, 3),
                "flops_src": flops_src,
                "semantics": (
                    "bit-exact sparse semantics (masked_eval=true,"
                    " approx_topk=false); fused-PFN Pallas table <=1 ulp vs"
                    " the unfused stack (exact detection sets on tested"
                    " scenes; PNX_PALLAS_PFN=0 for strict)"
                ),
                "capacity_buckets": list(engine.buckets),
                    "operating_bucket": engine._operating_bucket(),
                "overflow_repairs": engine.repaired,
            }
        )
    )


if __name__ == "__main__":
    main()
