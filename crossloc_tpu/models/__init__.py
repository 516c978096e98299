"""Model family: TransPose encoder/decoder FCNs (+MLR), vanilla DSAC* net."""
from .layers import (
    ConvGN,
    GroupNormFused,
    DenseUpsamplingConv,
    MLRConcatenator,
    MLRSkip,
    ResBlock,
    bilinear_resize,
    gn_fast_variance,
    pixel_shuffle,
    set_gn_fast_variance,
)
from .transpose_net import (
    OUTPUT_SUBSAMPLE,
    ProjHead,
    TransPoseDecoder,
    TransPoseEncoder,
    TransPoseNet,
    build_network,
    task_channels,
)
from .vanilla import VanillaNetwork

__all__ = [
    "ConvGN",
    "GroupNormFused",
    "DenseUpsamplingConv",
    "MLRConcatenator",
    "MLRSkip",
    "OUTPUT_SUBSAMPLE",
    "ProjHead",
    "ResBlock",
    "TransPoseDecoder",
    "TransPoseEncoder",
    "TransPoseNet",
    "VanillaNetwork",
    "bilinear_resize",
    "build_network",
    "gn_fast_variance",
    "pixel_shuffle",
    "set_gn_fast_variance",
    "task_channels",
]
