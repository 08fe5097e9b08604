"""Config -> objects: model, datasets, loaders, optimizer.

The glue the reference spreads across tools/train.py:44-70 (hydra
instantiate calls + scheduler steps_per_epoch injection + SyncBN conversion).
SyncBatchNorm needs no conversion here: under global-view jit the BN batch
statistics already reduce over the full global batch (parallel/mesh.py).
"""

from __future__ import annotations

import copy
from typing import Any

from pillarnext_tpu.utils.config import instantiate


def enable_compile_cache(jax_module=None) -> None:
    """Persistent XLA compile cache for the CLIs: ``./.jax_cache`` when
    running from a repo checkout (ships warmed), else
    ``~/.cache/pillarnext_tpu/jax_cache``.  First compiles of the BEV models
    cost minutes through remote-TPU runtimes; the cache cuts reruns to
    seconds."""
    from pathlib import Path

    if jax_module is None:
        import jax as jax_module
    local = Path.cwd() / ".jax_cache"
    cache = (
        local
        if local.exists()
        else Path.home() / ".cache" / "pillarnext_tpu" / "jax_cache"
    )
    cache.mkdir(parents=True, exist_ok=True)
    jax_module.config.update("jax_compilation_cache_dir", str(cache))
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def build_model(model_cfg: dict, train: bool = False):
    """Instantiate the detector flax module from the resolved model config.

    ``model.dtype`` ('bfloat16' | 'float32', default bfloat16) selects the
    activation/compute dtype for every submodule; BatchNorm statistics and
    the decode/NMS path stay float32 regardless.

    ``train=True`` applies ``reader.train_pillar_capacity`` (when set) in
    place of ``pillar_capacity``: every gather conv and table build costs
    O(capacity) regardless of occupancy, so training — whose occupancy
    ceiling is known from the dataset (tools/calibrate_capacity.py) — runs
    a tighter table than serving's worst-case bucket.  Parameter shapes
    never depend on table capacity, so one checkpoint/TrainState serves
    both models; the overflow telemetry makes an undersized value fail
    loudly (train/trainer.py:_check_overflow), never silently truncate.
    """
    import jax.numpy as jnp

    cfg = copy.deepcopy(model_cfg)
    cfg.pop("sync_batchnorm", None)  # implicit under global-view jit
    if isinstance(cfg.get("reader"), dict):
        train_cap = cfg["reader"].pop("train_pillar_capacity", None)
        if train and train_cap:
            cfg["reader"]["pillar_capacity"] = int(train_cap)
    dtype_name = cfg.pop("dtype", "bfloat16")
    dtype = {"bfloat16": jnp.bfloat16, "float32": None, None: None}[dtype_name]
    if dtype is not None:
        for key in ("reader", "backbone", "neck", "head"):
            if isinstance(cfg.get(key), dict) and "_target_" in cfg[key]:
                cfg[key].setdefault("dtype", dtype)

    # the pillar reader hands the backbone its compact active-site table when
    # the backbone opens with stride-1 (SubM) stages — the reference's sparse
    # path (sparse_resnet.py:50-59), here gather+MXU over ~4% of the grid
    rd, bb = cfg.get("reader"), cfg.get("backbone")
    if (
        isinstance(rd, dict)
        and str(rd.get("_target_", "")).split(".")[-1] == "PillarFeatureNet"
        and isinstance(bb, dict)
        and str(bb.get("_target_", "")).split(".")[-1] == "SparseResNet"
        and list(bb.get("ds_layer_strides", [0]))[0] == 1
    ):
        rd.setdefault("output", "sparse")
        # eval also runs the SubM stage on the sparse gather path: exact and
        # measured faster than the masked-dense twin (91 vs 106 ms e2e at
        # B=1 on v5e — the mask multiply relayouts the 1344^2 activation)
        bb.setdefault("sparse_eval", True)
    # the 3-D backbone always consumes the compact voxel table — the dense
    # voxel18 volume does not fit HBM at config resolution (voxel_encoder.py)
    if (
        isinstance(rd, dict)
        and str(rd.get("_target_", "")).split(".")[-1] == "VoxelFeatureNet"
        and isinstance(bb, dict)
        and str(bb.get("_target_", "")).split(".")[-1] == "SparseResNet3D"
    ):
        rd.setdefault("output", "sparse")
    return instantiate(cfg)


def build_eval_model_scaled(model_cfg: dict, scale: float):
    """Build the eval model with every static table capacity multiplied by
    ``scale`` (rounded up to a 4096 quantum) and the tile capacity opened to
    the full grid.  Parameter shapes are capacity-independent, so the scaled
    model evaluates the SAME checkpoint — used by Trainer.val_epoch to
    recompute batches whose active set overflowed the configured capacity
    (bit-equal to having provisioned the bigger capacity up front; the
    reference's torch.unique sizing can never overflow,
    reference det3d/models/readers/pillar_encoder.py:109-111)."""
    cfg = copy.deepcopy(model_cfg)
    rd = cfg.get("reader")
    if isinstance(rd, dict):
        for key in ("pillar_capacity", "voxel_capacity", "cylinder_capacity"):
            if key in rd:
                c = int(-(-int(rd[key]) * scale // 4096)) * 4096
                rd[key] = c
    bb = cfg.get("backbone")
    if isinstance(bb, dict) and (
        bb.get("sparse_stages_eval") == "tile" or bb.get("tile_stride1")
    ):
        bb["tile_capacity"] = 0  # full tile grid — cannot overflow
    return build_model(cfg)


def build_dataset(ds_cfg: dict):
    return instantiate(ds_cfg)


def build_optimizer(cfg: dict, steps_per_epoch: int):
    """AdamW + OneCycle from the optimizer/scheduler config groups
    (reference injects epochs/steps_per_epoch at tools/train.py:66-68)."""
    from pillarnext_tpu.train.train_state import make_optimizer

    sched = cfg["scheduler"]
    opt = cfg["optimizer"]
    total_steps = int(sched["epochs"]) * int(steps_per_epoch)
    return make_optimizer(
        max_lr=float(sched["max_lr"]),
        total_steps=max(total_steps, 1),
        betas=tuple(opt.get("betas", (0.9, 0.99))),
        weight_decay=float(opt.get("weight_decay", 0.01)),
        div_factor=float(sched.get("div_factor", 10.0)),
        pct_start=float(sched.get("pct_start", 0.4)),
        clip_grad_val=float(cfg["trainer"].get("clip_grad_val", 0.0)),
    )
