#!/usr/bin/env python
"""Training CLI.

Capability parity with the reference tools/train.py:16-83: config-driven
model/data/optimizer assembly, multi-host initialization, rank-0 logging,
resume/load_from, then Trainer.fit().  Usage:

    pnx-train --config pillarnext_tpu/configs/experiments/<exp>.yaml \
        [key.path=value ...] [--work-dir DIR] [--resume-from CKPT] [--load-from CKPT]
    (or: python tools/train.py ... from a repo checkout)

Multi-host: set JAX_COORDINATOR/JAX_NUM_PROCESSES/JAX_PROCESS_ID (or run
under a launcher that provides them) and jax.distributed.initialize() forms
the rendezvous — the analogue of torchrun env:// + NCCL init
(reference tools/train.py:22-31).
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path


def setup_logging(rank: int) -> logging.Logger:
    # own handler on the package logger: absl (pulled in by jax/orbax)
    # installs a root handler at import, which makes basicConfig a no-op
    # and swallows INFO records
    log = logging.getLogger("pillarnext_tpu")
    log.setLevel(logging.INFO if rank == 0 else logging.ERROR)
    if not log.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        log.addHandler(h)
    log.propagate = False
    return log


def honor_jax_platforms_env():
    """Re-apply JAX_PLATFORMS / the XLA_FLAGS host-device count: some
    managed environments install a sitecustomize that force-sets
    ``jax.config.jax_platforms`` (e.g. 'axon,cpu') and rewrites XLA_FLAGS,
    silently overriding the standard env vars — which breaks CPU-pinned
    subprocess runs (tests, multi-process loaders)."""
    import re

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # PNX_CPU_DEVICES wins: managed envs may also rewrite XLA_FLAGS itself,
    # so the standard flag can't round-trip through the environment
    n = os.environ.get("PNX_CPU_DEVICES")
    if not n:
        m = re.search(
            r"--xla_force_host_platform_device_count=(\d+)",
            os.environ.get("XLA_FLAGS", ""),
        )
        n = m.group(1) if m else None
    if n:
        jax.config.update("jax_num_cpu_devices", int(n))


def maybe_init_distributed():
    import jax

    honor_jax_platforms_env()
    if os.environ.get("JAX_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--work-dir", default="work_dir")
    parser.add_argument("--resume-from", default=None)
    parser.add_argument("--load-from", default=None)
    parser.add_argument(
        "--profile",
        default=None,
        metavar="LOGDIR",
        help="write a jax.profiler trace of a few steady-state train steps",
    )
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    maybe_init_distributed()
    import jax

    from pillarnext_tpu.utils.builders import enable_compile_cache

    enable_compile_cache(jax)

    from pillarnext_tpu.data.loader import build_dataloader
    from pillarnext_tpu.parallel import mesh as mesh_lib
    from pillarnext_tpu.train.trainer import Trainer
    from pillarnext_tpu.utils import builders
    from pillarnext_tpu.utils.config import load_experiment

    log = setup_logging(jax.process_index())
    cfg = load_experiment(args.config, args.overrides)
    log.info("devices: %d (%d processes)", jax.device_count(), jax.process_count())

    train_ds = builders.build_dataset(cfg["data"]["train_dataset"])
    val_ds = builders.build_dataset(cfg["data"]["val_dataset"])
    dl_cfg = cfg["dataloader"]
    max_points = int(dl_cfg.get("max_points", 300000))
    accum = int(cfg["trainer"].get("accum_steps", 1))
    global_batch = int(dl_cfg["train"]["batch_size"]) * jax.device_count() * accum
    per_host_batch = global_batch // jax.process_count()
    train_loader = build_dataloader(
        train_ds, per_host_batch, max_points, shuffle=True,
        num_workers=int(dl_cfg["train"]["num_workers"]),
    )
    val_loader = build_dataloader(
        val_ds, per_host_batch, max_points, shuffle=False,
        num_workers=int(dl_cfg["val"]["num_workers"]),
    )

    # the train model may run a tighter compact-table capacity than serving
    # (reader.train_pillar_capacity) — parameter shapes are identical, so
    # both share one TrainState/checkpoint; eval runs the full capacity
    model = builders.build_model(cfg["model"], train=True)
    eval_model = builders.build_model(cfg["model"])
    tx, schedule = builders.build_optimizer(cfg, steps_per_epoch=len(train_loader))

    trainer = Trainer(
        model,
        eval_model=eval_model,
        eval_model_cfg=cfg["model"],
        eval_overflow=str(cfg["trainer"].get("eval_overflow", "repair")),
        train_dataloader=train_loader,
        val_dataloader=val_loader,
        optimizer=tx,
        lr_schedule=schedule,
        clip_grad_val=float(cfg["trainer"].get("clip_grad_val", 0)),
        max_epochs=int(cfg["trainer"]["max_epochs"]),
        eval_every_nepochs=int(cfg["trainer"].get("eval_every_nepochs", 1)),
        log_every_niters=int(cfg["trainer"].get("log_every_niters", 50)),
        accum_steps=accum,
        logger_=log,
        work_dir=args.work_dir,
        mesh=mesh_lib.make_mesh(),
        profile_dir=args.profile,
    )

    first_batch = next(iter(train_loader))
    trainer.init_state(first_batch)

    if args.resume_from:
        trainer.resume(args.resume_from)
    elif args.load_from:
        trainer.load_weights(args.load_from)
    else:
        trainer.auto_resume()

    trainer.fit()


if __name__ == "__main__":
    main()
