"""Model zoo: shared conv/linear blocks, ATDNVO odometry regressor,
MappingVAE autoencoder, and the GMA optical-flow network."""

from atdn_vslam_tpu.models.blocks import (
    ConvBlock,
    ResidualConvBlock,
    TransposedConvBlock,
    DUCBlock,
    ConnectedDUCBlock,
    LinearBlock,
    mish,
)
from atdn_vslam_tpu.models.odometry import ATDNVO
from atdn_vslam_tpu.models.mapping import MappingVAE

__all__ = [
    "ConvBlock",
    "ResidualConvBlock",
    "TransposedConvBlock",
    "DUCBlock",
    "ConnectedDUCBlock",
    "LinearBlock",
    "mish",
    "ATDNVO",
    "MappingVAE",
]
