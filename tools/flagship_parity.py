#!/usr/bin/env python
"""Detection-level parity vs the torch reference mirror AT FLAGSHIP SCALE.

Same instrument as tests/test_detection_parity.py but at the real
PillarNeXt-B configuration — full 1344^2 pillar grid, 6 task groups, iou
branch, ResNet18 depths, ASPP neck, 1000/83 NMS — one 200k-point
beam-structured frame through BOTH full pipelines with the SAME weights:

  torch mirror: dynamic torch.unique voxelization, PFN, SubM/dense backbone,
      ASPP, CenterHead, reference decode + C++-oracle NMS (cited per class in
      tests/torch_mirror.py against /root/reference det3d/*)
  this framework: jitted SingleStageDetector.predict, bit-exact eval config
      (masked_eval=true, approx_topk=false), float32.

Prints per-frame detection counts, max |box delta|, score/label agreement.
CPU-only; the torch mirror at 1344^2 takes minutes per frame — run with a
small --points to smoke, default is the full scan.

Usage: JAX_PLATFORMS=cpu python tools/flagship_parity.py [--points 200000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=200_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--heads", action="store_true",
        help="compare raw per-task head outputs instead of decoded boxes "
        "(splits network divergence from decode/NMS divergence)",
    )
    args = ap.parse_args()

    import torch

    import torch_mirror as tm
    from pillarnext_tpu.utils import builders
    from pillarnext_tpu.utils import torch_import as ti
    from pillarnext_tpu.utils.config import load_experiment
    from pillarnext_tpu.utils.synth import lidar_like_points

    cfg = load_experiment(
        REPO / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml",
        [
            "model.dtype=float32",
            "model.backbone.masked_eval=true",
            "model.post_processing.approx_topk=false",
        ],
    )
    mc = cfg["model"]
    tasks = [list(t) for t in mc["head"]["tasks"]]
    # NOTE: no 'iou' entry — the reference nusc flagship has with_reg_iou
    # (an IoU REGRESSION LOSS) but no iou prediction branch: reference
    # centerhead.py:97 gates the branch on 'iou' in common_heads (absent in
    # configs/models/head/centerhead.yaml) and decode falls back to iou=1
    # (centerhead.py:267-271), i.e. rectified score = sqrt(hm).
    common = {k: tuple(v) for k, v in mc["head"]["common_heads"].items()}
    rectifier = mc["head"]["rectifier"]
    num_classes = [len(t) for t in tasks]

    # ---- torch mirror at flagship dims, randomized BN running stats
    torch.manual_seed(args.seed)
    tmodel = tm.TModel(
        num_input_features=5,
        num_filters=tuple(mc["reader"]["num_filters"]),
        voxel_size=mc["reader"]["voxel_size"],
        pc_range=mc["reader"]["pc_range"],
        bb_filters=tuple(mc["backbone"]["ds_num_filters"]),
        bb_strides=tuple(mc["backbone"]["ds_layer_strides"]),
        bb_layer_nums=tuple(mc["backbone"]["layer_nums"]),
        out_channels=mc["backbone"]["out_channels"]
        if "out_channels" in mc["backbone"]
        else 256,
        tasks=tasks,
        common_heads=common,
        head_stride=mc["head"]["strides"][0],
        subm=True,  # stage-0 SubM like the reference sparse backbone
    ).eval()
    tm.randomize_bn_stats(tmodel, np.random.default_rng(args.seed + 1))

    # ---- same weights into the jax model
    sd = {}
    for k, v in tmodel.state_dict().items():
        sd["neck.weight" if k.startswith("neck.weight") else k] = v.detach().numpy()
    params, stats = ti.import_pillarnext(
        sd, tasks=tasks, common_heads=common,
    )
    variables = {"params": params, "batch_stats": stats}

    model = builders.build_model(mc)

    pts, mask = lidar_like_points(1, args.points, mc["reader"]["pc_range"],
                                  seed=args.seed + 2)

    # ---- torch mirror full pipeline (reference decode + oracle NMS)
    t0 = time.perf_counter()
    with torch.no_grad():
        preds = tmodel(tm.padded_to_ragged(pts, mask))
    test_cfg = dict(mc["post_processing"])
    test_cfg["pc_range"] = mc["reader"]["pc_range"]
    test_cfg["voxel_size"] = mc["reader"]["voxel_size"]
    test_cfg["out_size_factor"] = mc["head"]["out_size_factor"]
    preds_np = [{k: v.numpy() for k, v in pd.items()} for pd in preds]

    if args.heads:
        import jax
        import jax.numpy as jnp

        t0 = time.perf_counter()
        jp = jax.jit(lambda v, p, m: model.apply(v, p, m))(
            variables, jnp.asarray(pts), jnp.asarray(mask)
        )
        print(f"jax forward: {time.perf_counter() - t0:.0f}s", flush=True)
        worst = 0.0
        for ti_, (tp, jd) in enumerate(zip(preds_np, jp)):
            for k, tv in tp.items():
                jv = np.transpose(np.asarray(jd[k]), (0, 3, 1, 2))  # NHWC->NCHW
                d = float(np.abs(tv - jv).max())
                scale = float(np.abs(tv).max())
                print(f"task {ti_} {k:7s} max|delta| {d:.3e}  (max|ref| {scale:.3e})", flush=True)
                worst = max(worst, d)
        print(f"HEADS max|delta| = {worst:.3e}", flush=True)
        return

    ref = tm.reference_predict(preds_np, test_cfg, rectifier, num_classes)[0]
    print(f"torch mirror: {time.perf_counter() - t0:.0f}s, "
          f"{len(ref['scores'])} detections", flush=True)

    # ---- our pipeline
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    out = jax.jit(
        lambda v, p, m: model.apply(
            v, {"points": p, "points_mask": m}, method=model.predict
        )
    )(variables, jnp.asarray(pts), jnp.asarray(mask))
    out = jax.tree.map(np.asarray, out)
    valid = out["valid"][0]
    ours = {
        "box3d_lidar": out["box3d_lidar"][0][valid],
        "scores": out["scores"][0][valid],
        "label_preds": out["label_preds"][0][valid],
    }
    print(f"jax predict: {time.perf_counter() - t0:.0f}s, "
          f"{len(ours['scores'])} detections", flush=True)

    # ---- compare: greedy nearest-center matching (score-sorted positional
    # pairing mispairs near-tied scores — with random weights many detections
    # score within 1e-4 of each other and order is not stable across
    # implementations)
    def key(d):
        return np.argsort(-d["scores"], kind="stable")

    ri, oi = key(ref), key(ours)
    n = min(len(ri), len(oi))
    if len(ri) != len(oi):
        # diagnose: per-label counts + the scores around the disagreement
        nl = int(max(ref["label_preds"].max(), ours["label_preds"].max())) + 1
        for lb in range(nl):
            rc = int((ref["label_preds"] == lb).sum())
            oc = int((ours["label_preds"] == lb).sum())
            if rc != oc:
                rs = np.sort(ref["scores"][ref["label_preds"] == lb])
                os_ = np.sort(ours["scores"][ours["label_preds"] == lb])
                print(
                    f"label {lb}: ref {rc} vs ours {oc}; "
                    f"ref min-kept {rs[:3]} ours min-kept {os_[:3]}",
                    flush=True,
                )
        # extra-in-ours: nearest ref score to each unmatched ours score
        print("ref score range", ref["scores"].min(), ref["scores"].max(), flush=True)
        print("ours score range", ours["scores"].min(), ours["scores"].max(), flush=True)
    assert len(ri) == len(oi), f"count mismatch: ref {len(ri)} vs ours {len(oi)}"
    rb, ob = ref["box3d_lidar"], ours["box3d_lidar"]
    # greedy 1:1 nearest-center assignment (O(n^2), n ~ hundreds)
    d2 = ((rb[:, None, :3] - ob[None, :, :3]) ** 2).sum(-1)
    taken = np.zeros(len(oi), bool)
    match = np.full(len(ri), -1, np.int64)
    for i in np.argsort(d2.min(axis=1)):  # most-confident matches first
        j_order = np.argsort(d2[i])
        j = next(j for j in j_order if not taken[j])
        match[i], taken[j] = j, True
    db = np.abs(rb - ob[match])
    db[:, -1] = np.minimum(db[:, -1], 2 * np.pi - db[:, -1])  # yaw mod 2pi
    ds = np.abs(ref["scores"] - ours["scores"][match])
    dl = int((ref["label_preds"] != ours["label_preds"][match]).sum())
    print(f"max |box delta| {db.max():.2e}  max |score delta| {ds.max():.2e}  "
          f"label mismatches {dl}/{n}", flush=True)
    assert db.max() < 5e-2 and ds.max() < 5e-3 and dl == 0
    print("FLAGSHIP-PARITY OK", flush=True)


if __name__ == "__main__":
    main()
