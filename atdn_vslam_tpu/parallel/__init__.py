"""Device mesh + sharding helpers.

This is a *new* capability: the reference's only parallelism is a
single-GPU ``torch.nn.DataParallel`` no-op wrapper
(ref: slam_framework/neural_slam.py:51; SURVEY.md section 2.26). Here,
training and batched inference shard over a ``jax.sharding.Mesh`` with
named axes ("data", "model"), gradients reduce over ICI via the psum
implicit in pjit, and the keyframe map can be sharded over the data
axis for relocalization search.
"""

from atdn_vslam_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from atdn_vslam_tpu.parallel.flow_sharding import sharded_flow_infer

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "sharded_flow_infer",
]
