#!/usr/bin/env python
"""Evaluation CLI — parity with the reference tools/test.py:16-70: build the
val dataset + model, load a checkpoint strictly, run one val epoch.

    python tools/test.py --config <experiment.yaml> --checkpoint <ckpt_dir> \
        [key.path=value ...]
"""

from __future__ import annotations

import argparse

from pillarnext_tpu.cli.train import maybe_init_distributed, setup_logging


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--work-dir", default="work_dir")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    maybe_init_distributed()
    import jax

    from pillarnext_tpu.data.loader import build_dataloader
    from pillarnext_tpu.parallel import mesh as mesh_lib
    from pillarnext_tpu.train.trainer import Trainer
    from pillarnext_tpu.utils import builders
    from pillarnext_tpu.utils.config import load_experiment

    log = setup_logging(jax.process_index())
    cfg = load_experiment(args.config, args.overrides)

    val_ds = builders.build_dataset(cfg["data"]["val_dataset"])
    dl_cfg = cfg["dataloader"]
    per_host_batch = (
        int(dl_cfg["val"]["batch_size"]) * jax.device_count() // jax.process_count()
    )
    val_loader = build_dataloader(
        val_ds,
        per_host_batch,
        int(dl_cfg.get("max_points", 300000)),
        shuffle=False,
        num_workers=int(dl_cfg["val"]["num_workers"]),
    )

    model = builders.build_model(cfg["model"])
    tx, schedule = builders.build_optimizer(cfg, steps_per_epoch=1)

    trainer = Trainer(
        model,
        eval_model_cfg=cfg["model"],
        eval_overflow=str(cfg.get("trainer", {}).get("eval_overflow", "repair")),
        val_dataloader=val_loader,
        optimizer=tx,
        lr_schedule=schedule,
        logger_=log,
        work_dir=args.work_dir,
        mesh=mesh_lib.make_mesh(),
    )
    first_batch = next(iter(val_loader))
    trainer.init_state(first_batch)
    trainer.resume(args.checkpoint)
    trainer.val_epoch()


if __name__ == "__main__":
    main()
