"""ATDN vSLAM, TPU-native.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
ATDN vSLAM reference system (MILAB-IIT-CV/ATDN_vSLAM): an end-to-end
*learned* visual SLAM for KITTI odometry with

  * a GMA (RAFT + global motion aggregation) optical-flow frontend,
  * the ATDNVO / CLVO conv+LSTM odometry regressor,
  * keyframe registration + a convolutional-autoencoder map
    ("MappingVAE") with latent-space relocalization,
  * forward/backward Kalman trajectory fusion and an ATE/RPE
    evaluation toolchain,

re-designed TPU-first: functional models with explicit carried state,
`lax.scan` for every temporal/iterative loop, `jax.sharding.Mesh` +
NamedSharding for parallelism, Pallas kernels for the hot ops
(flash attention over the GMA similarity matrix, fused correlation
pyramid lookup), and Orbax checkpointing.

Layer map (mirrors SURVEY.md section 1 of the reference analysis):

  geometry/   SE(3) pose math (ref: atdn_vslam/utils/transforms.py)
  models/     blocks, ATDNVO, MappingVAE, GMA flow (ref: layers/,
              odometry/network.py, localization/network.py, GMA/core)
  ops/        Pallas + XLA kernels for attention / correlation /
              bilinear sampling / convex upsampling
  parallel/   mesh + sharding helpers (new capability; ref has none)
  data/       KITTI odometry pipeline + flow cache
              (ref: odometry/datasets.py, localization/datasets.py)
  training/   losses + sharded train steps + curriculum
              (ref: train_odometry.py, odometry/loss.py)
  slam/       SLAM runtime state machine + keyframe store
              (ref: slam_framework/neural_slam.py)
  eval/       ATE/Umeyama, Kalman fusion, KITTI txt IO, plots
              (ref: atdn_vslam/eval/)
"""

__version__ = "0.1.0"
