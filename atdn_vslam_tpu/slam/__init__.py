"""SLAM runtime: state machine, array-backed keyframe store,
relocalization."""

from atdn_vslam_tpu.slam.keyframes import KeyframeStore
from atdn_vslam_tpu.slam.runtime import SlamRuntime

__all__ = ["KeyframeStore", "SlamRuntime"]
