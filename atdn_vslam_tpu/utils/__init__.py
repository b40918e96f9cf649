"""Logging / timing utilities."""

from atdn_vslam_tpu.utils.helpers import log, Clock, BetaScheduler

__all__ = ["log", "Clock", "BetaScheduler"]
