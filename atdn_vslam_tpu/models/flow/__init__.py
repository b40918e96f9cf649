"""GMA optical-flow network (RAFT + Global Motion Aggregation),
TPU-native."""

from atdn_vslam_tpu.models.flow.network import RAFTGMA

__all__ = ["RAFTGMA"]
