"""refactored_orb_slam2_tpu — a TPU-native visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
sjulier/Refactored_ORB_SLAM2 (ORB-SLAM2): monocular / stereo / RGB-D
tracking, keyframe-based local mapping, loop closing with Sim3/SE3
pose-graph optimization, and global bundle adjustment — with the map stored
as fixed-shape arrays, matching as packed-Hamming matmuls on the MXU, all
RANSAC loops vmapped, and bundle adjustment as a Schur-complement
Levenberg–Marquardt engine shardable over a TPU device mesh.
"""

__version__ = "0.1.0"
