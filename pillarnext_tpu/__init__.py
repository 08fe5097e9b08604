"""PillarNeXt-TPU: a TPU-native (JAX/XLA/Pallas) LiDAR 3D detection framework.

A ground-up rebuild of the capabilities of qcraftai/pillarnext (CVPR 2023)
designed for TPU hardware: static shapes, dense BEV convolutions on the MXU,
fused point->pillar scatter kernels, on-device NMS, and pjit/shard_map data
parallelism over a device mesh.

Subpackages
-----------
core      box geometry, rotated IoU, gaussian targets, on-device NMS,
          C++ host geometry library (data-pipeline hot path + test oracles)
ops       voxelization / segment reductions / Pallas kernels
models    flax modules: readers, backbones, necks, heads, losses, detector
data      datasets, augmentation, GT-paste sampling, target assignment, loader
parallel  mesh construction and sharding helpers
train     trainer runtime, checkpointing, LR schedules
utils     config system (mini-hydra), registry, logging
"""

__version__ = "0.1.0"
