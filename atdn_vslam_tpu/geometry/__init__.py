"""SE(3) / pose math core.

TPU-native re-design of the reference pose utilities
(ref: atdn_vslam/utils/transforms.py:4-170). Everything here is

  * batched over arbitrary leading dimensions,
  * fully differentiable (the reference's ``torch.tensor([...])``
    constructions at transforms.py:50,79-89 break gradients; we use
    ``jnp.stack``),
  * jit/scan/vmap friendly (no data-dependent python control flow).
"""

from atdn_vslam_tpu.geometry.se3 import (
    euler_to_matrix,
    matrix_to_euler,
    line_to_matrix,
    matrix_to_line,
    pose_to_matrix,
    se3_inverse,
    relative_pose,
    absolute_to_relative,
    accumulate_poses,
    accumulate_poses_host,
    matrix_to_pose,
)

__all__ = [
    "euler_to_matrix",
    "matrix_to_euler",
    "line_to_matrix",
    "matrix_to_line",
    "pose_to_matrix",
    "se3_inverse",
    "relative_pose",
    "absolute_to_relative",
    "accumulate_poses",
    "accumulate_poses_host",
    "matrix_to_pose",
]
