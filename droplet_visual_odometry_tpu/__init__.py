"""droplet_visual_odometry_tpu — TPU-native monocular visual-odometry / SfM engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
ROS1/OpenCV pipeline (theivyzhang/droplet_visual_odometry): feature detection and
matching, essential-matrix RANSAC pose recovery, fiducial-marker metric scale,
AR-tag ground-truth extraction and TUM-format trajectory evaluation — plus a
keyframe/windowed-BA/pose-graph backend and multi-device sharding the reference
lacks.

Layer map (mirrors SURVEY.md §7):
  core/        SE(3)/SO(3) math, camera model            (ref L0/L2)
  data/        sequence ingestion + synthetic renderer    (ref L1)
  frontend/    FAST/ORB features + Hamming matching       (ref L2/L3 frontend)
  estimation/  batched RANSAC two-view geometry + scale   (ref L3 core)
  backend/     keyframes, windowed BA, pose graph         (new)
  eval/        TUM writers, ATE/RPE, stats, plots         (ref L5/L6)
  parallel/    mesh sharding, distributed Schur BA        (new)
  ops/         Pallas TPU kernels
  utils/       config, profiling, checkpointing
  cli/         experiment drivers
"""

import jax as _jax

# Geometry correctness first: pose chains, essential matrices and BA normal
# equations are numerically fragile — never let f32 matmuls silently drop to
# bf16 passes on the MXU. Throughput-critical kernels (descriptor matching,
# image convolutions) opt back into bf16 explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
