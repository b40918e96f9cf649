"""Hot-path ops: attention (XLA + Pallas flash), correlation pyramid
lookup, bilinear sampling, convex flow upsampling."""

from atdn_vslam_tpu.ops.attention import attend, attend_reference
from atdn_vslam_tpu.ops.bilinear import bilinear_sample, coords_grid
from atdn_vslam_tpu.ops.corr_lookup import (
    build_corr_pyramid,
    lookup_corr_pyramid,
)
from atdn_vslam_tpu.ops.upsample import convex_upsample, upsample_flow_bilinear

__all__ = [
    "attend",
    "attend_reference",
    "bilinear_sample",
    "coords_grid",
    "build_corr_pyramid",
    "lookup_corr_pyramid",
    "convex_upsample",
    "upsample_flow_bilinear",
]
