"""Evaluation toolchain: ATE/RPE metrics with Umeyama alignment, KITTI
trajectory IO, forward/backward Kalman fusion, and plots."""

from atdn_vslam_tpu.eval.ate import (
    umeyama_alignment,
    ate_rmse,
    ape_statistics,
    rpe_statistics,
)
from atdn_vslam_tpu.eval.kitti_io import (
    load_kitti_trajectory,
    save_kitti_trajectory,
)
from atdn_vslam_tpu.eval.kalman import (
    fuse_trajectories,
    inverse_variance_fusion,
    rebase_backward_trajectory,
    error_stds,
)

__all__ = [
    "umeyama_alignment",
    "ate_rmse",
    "ape_statistics",
    "rpe_statistics",
    "load_kitti_trajectory",
    "save_kitti_trajectory",
    "fuse_trajectories",
    "inverse_variance_fusion",
    "rebase_backward_trajectory",
    "error_stds",
]
