"""Training: losses, sharded train steps, stage curriculum, checkpoints."""

from atdn_vslam_tpu.training.losses import (
    clvo_loss,
    transform_loss,
    composed_pose_loss,
    vae_loss,
    embedding_distance_loss,
    mapping_reconstruction_loss,
)

__all__ = [
    "clvo_loss",
    "transform_loss",
    "composed_pose_loss",
    "vae_loss",
    "embedding_distance_loss",
    "mapping_reconstruction_loss",
]
