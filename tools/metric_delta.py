#!/usr/bin/env python
"""End-to-end mAP/NDS through the real CLIs, and the accuracy cost of the
speed shortcuts (VERDICT r2 items 1/4).

Builds a labeled synthetic nuScenes-format val set (planted objects over a
beam-structured background), trains the flagship model on it with
`pillarnext_tpu.cli.train` (real dataloader, assigner, optimizer, Orbax
checkpoints), then scores the SAME checkpoint with `pillarnext_tpu.cli.test`
under two inference configurations:

  exact:    masked_eval=true  approx_topk=false  (bit-exact spconv semantics
            + exact candidate top-k — the reference's semantics,
            det3d/models/utils/sparse_conv.py:16-63, centerhead topk)
  shortcut: masked_eval=false approx_topk=true   (round-2 speed defaults)

and prints both mAP/NDS and the delta.  The scorer is the self-contained
`detection_cvpr_2019` protocol (data/nuscenes_eval.py, mirrors reference
nusc.py:123-245).

Usage: python tools/metric_delta.py [--scenes 48] [--epochs 30] [--root DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run(cmd: list[str], log: Path):
    print(f"$ {' '.join(cmd)}\n  (log: {log})", flush=True)
    with open(log, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    if p.returncode != 0:
        print(open(log).read()[-4000:])
        raise SystemExit(f"command failed: {' '.join(cmd)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--root", default="/tmp/pnx_synth_val")
    ap.add_argument("--config",
                    default="pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse the checkpoint already in --root/work_dir")
    ap.add_argument("--extent", type=float, default=50.4,
                    help="scene half-extent in metres (shrink for CPU runs)")
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--objects", type=int, default=24,
                    help="planted objects per scene (shrink with --extent)")
    ap.add_argument("overrides", nargs="*",
                    help="extra config overrides appended to both CLIs")
    args = ap.parse_args()

    root = Path(args.root)
    work = root / "work_dir"
    from pillarnext_tpu.utils.synth import write_synthetic_nusc

    if not (root / "infos_synth.pkl").exists():
        print(f"writing {args.scenes} synthetic scenes to {root}", flush=True)
        e = args.extent
        write_synthetic_nusc(root, args.scenes, n_points=args.points,
                             pc_range=(-e, -e, -5.0, e, e, 3.0),
                             n_objects=args.objects)

    common = [
        f"data.train_dataset.root_path={root}",
        "data.train_dataset.info_path=infos_synth.pkl",
        "data.val_dataset.info_path=infos_synth.pkl",
        "data.train_dataset.resampling=false",
        "+data.train_dataset.use_gt_sampling=false",
        f"dataloader.train.batch_size={args.batch}",
        f"dataloader.val.batch_size={args.batch}",
        "dataloader.train.num_workers=2",
        "dataloader.val.num_workers=2",
        f"trainer.max_epochs={args.epochs}",
        "trainer.eval_every_nepochs=1000",  # eval separately below
        f"dataloader.max_points={max(args.points, 150_000)}",
        *args.overrides,
    ]
    env = dict(os.environ)
    py = [sys.executable]

    if not args.skip_train:
        run(
            py + ["tools/train.py", "--config", args.config,
                  "--work-dir", str(work), *common],
            root / "train.log",
        )

    ckpts = sorted((work / "checkpoints").glob("epoch_*"),
                   key=lambda p: int(p.name.split("_")[1]))
    assert ckpts, f"no checkpoints under {work}"
    ckpt = ckpts[-1]
    print(f"scoring checkpoint {ckpt}", flush=True)

    variants = {
        "exact": ["model.backbone.masked_eval=true",
                  "model.post_processing.approx_topk=false"],
        "shortcut": ["model.backbone.masked_eval=false",
                     "model.post_processing.approx_topk=true"],
    }
    metrics = {}
    for name, overrides in variants.items():
        vw = root / f"eval_{name}"
        run(
            py + ["tools/test.py", "--config", args.config,
                  "--checkpoint", str(ckpt), "--work-dir", str(vw),
                  *common, *overrides],
            root / f"eval_{name}.log",
        )
        summaries = sorted(vw.glob("results/epoch_*/metrics_summary.json"))
        with open(summaries[-1]) as f:
            m = json.load(f)
        metrics[name] = {"mAP": m["mean_ap"], "NDS": m["nd_score"]}
        print(f"{name}: mAP {m['mean_ap']:.4f}  NDS {m['nd_score']:.4f}", flush=True)

    out = {
        "exact": metrics["exact"],
        "shortcut": metrics["shortcut"],
        "delta": {
            k: metrics["shortcut"][k] - metrics["exact"][k] for k in ("mAP", "NDS")
        },
    }
    print(json.dumps(out, indent=2))
    with open(root / "metric_delta.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
