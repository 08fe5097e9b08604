"""Target registry for config instantiation.

The reference's ``_target_`` strings are Python import paths resolved by
Hydra (tools/train.py:44-68).  Here targets resolve through an explicit
registry; reference-style ``det3d.*`` paths are aliased to the TPU-native
equivalents so existing experiment YAMLs remain readable/portable.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register(name: str, fn: Callable | None = None):
    """Register a callable under ``name`` (usable as decorator)."""
    if fn is None:
        def deco(f):
            _REGISTRY[name] = f
            return f
        return deco
    _REGISTRY[name] = fn
    return fn


def _builtin_registry() -> dict[str, Callable]:
    # imported lazily to avoid import cycles
    from pillarnext_tpu import models
    from pillarnext_tpu.data import assign, augmentation, datasets, sampler

    reg: dict[str, Callable] = {
        # TPU-native names
        "pillarnext_tpu.models.SingleStageDetector": models.SingleStageDetector,
        "pillarnext_tpu.models.PillarFeatureNet": models.PillarFeatureNet,
        "pillarnext_tpu.models.VoxelFeatureNet": models.VoxelFeatureNet,
        "pillarnext_tpu.models.MVFFeatureNet": models.MVFFeatureNet,
        "pillarnext_tpu.models.SparseResNet": models.SparseResNet,
        "pillarnext_tpu.models.SparseResNet3D": models.SparseResNet3D,
        "pillarnext_tpu.models.ASPPNeck": models.ASPPNeck,
        "pillarnext_tpu.models.CenterHead": models.CenterHead,
        "pillarnext_tpu.data.AssignLabel": assign.AssignLabel,
        "pillarnext_tpu.data.NuScenesDataset": datasets.NuScenesDataset,
        "pillarnext_tpu.data.WaymoDataset": datasets.WaymoDataset,
        "pillarnext_tpu.data.DataBaseSampler": sampler.DataBaseSampler,
        "pillarnext_tpu.data.DBFilterByMinNumPoint": sampler.DBFilterByMinNumPoint,
        "pillarnext_tpu.data.Flip": augmentation.Flip,
        "pillarnext_tpu.data.Scaling": augmentation.Scaling,
        "pillarnext_tpu.data.Rotation": augmentation.Rotation,
        "pillarnext_tpu.data.Translation": augmentation.Translation,
    }
    # reference-path aliases (config portability with the det3d YAML tree)
    aliases = {
        "det3d.models.detectors.single_stage.SingleStageDetector": "pillarnext_tpu.models.SingleStageDetector",
        "det3d.models.readers.pillar_encoder.PillarFeatureNet": "pillarnext_tpu.models.PillarFeatureNet",
        "det3d.models.readers.voxel_encoder.VoxelFeatureNet": "pillarnext_tpu.models.VoxelFeatureNet",
        "det3d.models.readers.mvf_encoder.MVFFeatureNet": "pillarnext_tpu.models.MVFFeatureNet",
        "det3d.models.backbones.sparse_resnet.SparseResNet": "pillarnext_tpu.models.SparseResNet",
        "det3d.models.backbones.sparse_resnet3d.SparseResNet3D": "pillarnext_tpu.models.SparseResNet3D",
        "det3d.models.necks.aspp.ASPPNeck": "pillarnext_tpu.models.ASPPNeck",
        "det3d.models.heads.centerhead.CenterHead": "pillarnext_tpu.models.CenterHead",
        "det3d.datasets.pipelines.assign.AssignLabel": "pillarnext_tpu.data.AssignLabel",
        "det3d.datasets.nuscenes.NuScenesDataset": "pillarnext_tpu.data.NuScenesDataset",
        "det3d.datasets.waymo.waymo.WaymoDataset": "pillarnext_tpu.data.WaymoDataset",
        "det3d.datasets.pipelines.sample_ops.DataBaseSamplerV2": "pillarnext_tpu.data.DataBaseSampler",
        "det3d.datasets.pipelines.sample_ops.DBFilterByMinNumPoint": "pillarnext_tpu.data.DBFilterByMinNumPoint",
        "det3d.datasets.pipelines.augmentation.Flip": "pillarnext_tpu.data.Flip",
        "det3d.datasets.pipelines.augmentation.Scaling": "pillarnext_tpu.data.Scaling",
        "det3d.datasets.pipelines.augmentation.Rotation": "pillarnext_tpu.data.Rotation",
        "det3d.datasets.pipelines.augmentation.Translation": "pillarnext_tpu.data.Translation",
    }
    for alias, canonical in aliases.items():
        reg[alias] = reg[canonical]
    return reg


def resolve_target(name: str, registry: dict[str, Callable] | None = None) -> Callable:
    if registry and name in registry:
        return registry[name]
    if name in _REGISTRY:
        return _REGISTRY[name]
    builtin = _builtin_registry()
    if name in builtin:
        return builtin[name]
    raise KeyError(f"unknown _target_ {name!r}")
