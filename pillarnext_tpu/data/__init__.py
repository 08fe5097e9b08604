"""Data layer: datasets, pipelines, GT-paste sampling, loaders."""

from pillarnext_tpu.data.assign import AssignLabel
from pillarnext_tpu.data.augmentation import Flip, Rotation, Scaling, Translation
from pillarnext_tpu.data.collate import collate, pad_points
from pillarnext_tpu.data.datasets import BaseDataset, NuScenesDataset, WaymoDataset
from pillarnext_tpu.data.loader import DataLoader, build_dataloader
from pillarnext_tpu.data.sampler import (
    BatchSampler,
    DataBaseSampler,
    DBFilterByMinNumPoint,
)

__all__ = [
    "AssignLabel",
    "BaseDataset",
    "BatchSampler",
    "DataBaseSampler",
    "DBFilterByMinNumPoint",
    "DataLoader",
    "Flip",
    "NuScenesDataset",
    "Rotation",
    "Scaling",
    "Translation",
    "WaymoDataset",
    "build_dataloader",
    "collate",
    "pad_points",
]
