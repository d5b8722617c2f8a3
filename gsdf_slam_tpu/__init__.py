"""gsdf_slam_tpu — a TPU-native online 3D Gaussian Splatting SLAM-mapping framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of GSDF-SLAM (a
Photo-SLAM fork with a LiDAR+camera KITTI pipeline and a Taming-3DGS style
rasterizer). The compute path is pure-functional JAX with fixed-capacity
Gaussian buffers; hot kernels are Pallas; orchestration is host Python.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  ops/       — math core + rasterizer (projection, binning, tile blend, SH,
               knn, colorization, losses)
  models/    — GaussianModel state pytree, multi-group Adam, densification
  engine/    — mapper orchestration, keyframes, scene, cameras
  data/      — dataset parsers (KITTI, TUM, Replica, EuRoC, Oxford-Spires)
  parallel/  — device-mesh sharding of the render/train step
  io/        — 3DGS-format PLY checkpointing
"""

__version__ = "0.1.0"
