#!/usr/bin/env python
"""Import a reference PyTorch checkpoint into an Orbax checkpoint.

Validates metric parity against the released PillarNeXt-B weights
(reference README.md:28) without retraining:

    python tools/import_checkpoint.py \
        --config pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml \
        --torch-checkpoint pillarnext-b.pth \
        --out work_dir/imported

    python tools/test.py --config ... --checkpoint work_dir/imported/epoch_0
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--torch-checkpoint", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pillarnext_tpu.train import checkpoint as ckpt_lib
    from pillarnext_tpu.train import train_state as ts_lib
    from pillarnext_tpu.utils import builders, torch_import
    from pillarnext_tpu.utils.config import load_experiment

    cfg = load_experiment(args.config, args.overrides)
    model = builders.build_model(cfg["model"])

    sd = torch_import.load_torch_state_dict(args.torch_checkpoint)
    head_cfg = cfg["model"]["head"]
    params, stats = torch_import.import_pillarnext(
        sd,
        num_filters=tuple(cfg["model"]["reader"]["num_filters"]),
        layer_nums=tuple(cfg["model"]["backbone"]["layer_nums"]),
        ds_num_filters=tuple(cfg["model"]["backbone"]["ds_num_filters"]),
        num_input_features=int(cfg["model"]["backbone"]["num_input_features"]),
        out_channels=int(cfg["model"]["backbone"].get("out_channels", 256)),
        tasks=head_cfg["tasks"],
        common_heads={k: tuple(v) for k, v in head_cfg["common_heads"].items()},
    )

    pts = jnp.zeros((1, 1024, int(cfg["model"]["reader"]["num_input_features"])), jnp.float32)
    mask = jnp.ones((1, 1024), bool)
    torch_import.validate_against_flax(params, stats, model, pts, mask)
    print("tree structure + shapes validated against model.init")

    tx, _ = ts_lib.make_optimizer(max_lr=1e-3, total_steps=1)
    state = ts_lib.TrainState(
        step=jnp.zeros((), jnp.int32),
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, stats),
        opt_state=tx.init(jax.tree.map(jnp.asarray, params)),
    )
    path = ckpt_lib.save_checkpoint(args.out, epoch=0, state=state)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"imported {n / 1e6:.2f}M params -> {path}")


if __name__ == "__main__":
    main()
