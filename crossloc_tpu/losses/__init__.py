"""Task losses: coord (reprojection+MLE), depth, normal (az/el), semantics."""
from .common import (
    ae2xyz,
    get_nodata_value,
    logits_to_radian,
    valid_label_mask,
    xyz2ae,
)
from .coord import CoordLossConfig, scene_coords_loss
from .depth import DepthLossConfig, depth_loss
from .normal import NormalLossConfig, normal_loss
from .semantics import NUM_CLASSES, semantics_loss, trim_semantic_label

__all__ = [
    "CoordLossConfig",
    "DepthLossConfig",
    "NormalLossConfig",
    "NUM_CLASSES",
    "ae2xyz",
    "depth_loss",
    "get_nodata_value",
    "logits_to_radian",
    "normal_loss",
    "scene_coords_loss",
    "semantics_loss",
    "trim_semantic_label",
    "valid_label_mask",
    "xyz2ae",
]
