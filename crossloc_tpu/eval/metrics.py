"""Evaluation metrics (pose, coord, depth, normal, semantics).

Parity with `utils/evaluation.py`: pose error via relative-rotation angle
(`:121-132`), coord regression error over valid pixels (`:180-186`), depth
abs-rel + RMS (`:247-267`), normal mean angular degrees (`:294-316`), and
the confusion-matrix semantics evaluator (`:339-414`).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry import rotation_angle_deg
from ..losses import ae2xyz, logits_to_radian, valid_label_mask


def pose_err(gt_pose, est_pose) -> Tuple[float, float]:
    """(translation m, rotation deg) between 4x4 cam-to-world transforms."""
    t = float(np.linalg.norm(np.asarray(gt_pose)[0:3, 3] - np.asarray(est_pose)[0:3, 3]))
    r = float(
        rotation_angle_deg(jnp.asarray(est_pose)[0:3, 0:3], jnp.asarray(gt_pose)[0:3, 0:3])
    )
    return t, r


def coord_errors(scene_coords, gt_coords, nodata_value=-1.0) -> np.ndarray:
    """Per-pixel ||pred - gt|| over valid-gt pixels, flattened.
    scene_coords/gt_coords: [B, h, w, 3]."""
    pred = jnp.reshape(scene_coords, (-1, 3))
    gt = jnp.reshape(gt_coords, (-1, 3))
    err = jnp.linalg.norm(pred - gt, axis=-1)
    mask = valid_label_mask(gt, nodata_value)
    return np.asarray(err[mask])


def depth_eval(depth, gt_depth, nodata_value=-1.0) -> Tuple[float, float]:
    """(abs_rel, rms) over valid pixels (`utils/evaluation.py:247-267`)."""
    pred = jnp.reshape(depth, (depth.shape[0], -1))
    gt = jnp.reshape(gt_depth, (depth.shape[0], -1))
    err = jnp.abs(pred - gt)
    mask = valid_label_mask(gt[..., None], nodata_value).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    abs_rel = jnp.sum(err * mask / jnp.where(gt == 0, 1e-9, gt)) / denom
    rms = jnp.sqrt(jnp.sum(jnp.square(err * mask)) / denom)
    return float(abs_rel), float(rms)


def normal_eval(normal_logits, gt_normals, nodata_value=-1.0) -> float:
    """Mean angular error in degrees (`utils/evaluation.py:294-316`).
    normal_logits [B, h, w, 2]; gt_normals [B, h, w, 3] (unit, world)."""
    B = normal_logits.shape[0]
    logits = jnp.reshape(normal_logits, (B, -1, 2))
    gt = jnp.reshape(gt_normals, (B, -1, 3))
    pred_xyz = ae2xyz(logits_to_radian(logits))
    cos = jnp.sum(pred_xyz * gt, axis=-1) / jnp.maximum(
        jnp.linalg.norm(pred_xyz, axis=-1) * jnp.linalg.norm(gt, axis=-1), 1e-12
    )
    ang = jnp.degrees(jnp.arccos(jnp.clip(cos, -1 + 1e-7, 1 - 1e-7)))
    mask = valid_label_mask(gt, nodata_value).astype(jnp.float32)
    return float(jnp.sum(ang * mask) / jnp.maximum(jnp.sum(mask), 1.0))


class SemanticsEvaluator:
    """Confusion-matrix segmentation metrics (`utils/evaluation.py:339-385`)."""

    def __init__(self, num_class: int = 6):
        self.num_class = num_class
        self.confusion_matrix = np.zeros((num_class, num_class))

    def reset(self):
        self.confusion_matrix = np.zeros((self.num_class, self.num_class))

    def add_batch(self, gt_image: np.ndarray, pred_image: np.ndarray):
        if gt_image.shape != pred_image.shape:
            raise ValueError("shape mismatch")
        mask = (gt_image >= 0) & (gt_image < self.num_class)
        label = self.num_class * gt_image[mask].astype(int) + pred_image[mask]
        count = np.bincount(label, minlength=self.num_class**2)
        self.confusion_matrix += count.reshape(self.num_class, self.num_class)

    def pixel_accuracy(self) -> float:
        return np.diag(self.confusion_matrix).sum() / self.confusion_matrix.sum()

    def pixel_accuracy_class(self) -> float:
        acc = np.diag(self.confusion_matrix) / self.confusion_matrix.sum(axis=1)
        return float(np.nanmean(acc))

    def mean_iou(self) -> float:
        iu = np.diag(self.confusion_matrix) / (
            self.confusion_matrix.sum(axis=1)
            + self.confusion_matrix.sum(axis=0)
            - np.diag(self.confusion_matrix)
        )
        return float(np.nanmean(iu))

    def fw_iou(self) -> float:
        freq = self.confusion_matrix.sum(axis=1) / self.confusion_matrix.sum()
        iu = np.diag(self.confusion_matrix) / (
            self.confusion_matrix.sum(axis=1)
            + self.confusion_matrix.sum(axis=0)
            - np.diag(self.confusion_matrix)
        )
        return float((freq[freq > 0] * iu[freq > 0]).sum())


def semantic_eval(semantic_logits, gt_label) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-image (pred, miou, fwiou, acc) (`utils/evaluation.py:388-414`).
    semantic_logits [B, H, W, 6]; gt_label [B, H, W] (or [B, H, W, 1])."""
    if gt_label.ndim == 4:
        gt_label = gt_label[..., 0]
    pred = np.asarray(jnp.argmax(semantic_logits, axis=-1))
    gt = np.asarray(gt_label).astype(int)
    ev = SemanticsEvaluator(semantic_logits.shape[-1])
    miou, fwiou, acc = [], [], []
    for g, p in zip(gt, pred):
        ev.reset()
        ev.add_batch(g, p)
        miou.append(ev.mean_iou())
        fwiou.append(ev.fw_iou())
        acc.append(ev.pixel_accuracy())
    return pred, np.asarray(miou), np.asarray(fwiou), np.asarray(acc)
