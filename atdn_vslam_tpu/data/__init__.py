"""KITTI odometry data pipeline: pose/flow/RGB loading, the fp16 flow
cache, reverse-time augmentation, and host-side batching."""

from atdn_vslam_tpu.data.kitti import (
    FlowWindowDataset,
    KittiSequence,
    load_poses,
    BatchLoader,
)
from atdn_vslam_tpu.data.flow_cache import (
    FlowCache,
    write_flow_cache,
)

__all__ = [
    "FlowWindowDataset",
    "KittiSequence",
    "load_poses",
    "BatchLoader",
    "FlowCache",
    "write_flow_cache",
]
