"""Data layer: directory-contract reader, device augmentation, pipeline."""
from .augment import (
    AugmentConfig,
    augment_batch,
    color_jitter,
    images_from_wire,
    normalize_images,
    pp_shift_for_translation,
    rotation_z_pose,
    to_grayscale,
)
from .dataset import (
    GRAY_MEAN,
    GRAY_STD,
    IMAGE_HEIGHT,
    RGB_MEAN,
    RGB_STD,
    CamLocDataset,
    CamLocItem,
)
from .means import get_label_mean
from .pipeline import Loader, device_prefetch, images_to_wire
from .synthetic import synth_sample, write_fake_dataset

__all__ = [
    "AugmentConfig",
    "CamLocDataset",
    "CamLocItem",
    "GRAY_MEAN",
    "GRAY_STD",
    "IMAGE_HEIGHT",
    "Loader",
    "device_prefetch",
    "RGB_MEAN",
    "RGB_STD",
    "augment_batch",
    "color_jitter",
    "get_label_mean",
    "images_from_wire",
    "images_to_wire",
    "normalize_images",
    "pp_shift_for_translation",
    "rotation_z_pose",
    "synth_sample",
    "to_grayscale",
    "write_fake_dataset",
]
