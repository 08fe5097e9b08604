"""Model zoo: readers, backbones, necks, heads, losses, detectors."""

from pillarnext_tpu.models.aspp import ASPPNeck
from pillarnext_tpu.models.centerhead import CenterHead, SepHead
from pillarnext_tpu.models.detector import SingleStageDetector
from pillarnext_tpu.models.mvf_encoder import MVFFeatureNet
from pillarnext_tpu.models.pillar_encoder import PFNLayer, PillarFeatureNet
from pillarnext_tpu.models.resnet import SparseResNet, SparseResNet3D
from pillarnext_tpu.models.voxel_encoder import VoxelFeatureNet

__all__ = [
    "ASPPNeck",
    "CenterHead",
    "SepHead",
    "SingleStageDetector",
    "MVFFeatureNet",
    "PFNLayer",
    "PillarFeatureNet",
    "SparseResNet",
    "SparseResNet3D",
    "VoxelFeatureNet",
]
