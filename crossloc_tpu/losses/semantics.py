"""Semantic segmentation loss (6 classes, full-size) + label trimming.

Parity with `loss/semantics.py`: 2D cross entropy via log-softmax NLL,
valid-rate = pixel accuracy; uncertainty is unsupported (raises, as in the
reference `loss/semantics.py:75-76`).
Channels-last: semantic_logits [B, H, W, 6], gt_labels [B, H, W] int.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import reduce_loss

NUM_CLASSES = 6

# raw dataset class ids -> compact training ids (`loss/semantics.py:21-41`)
_RAW_CLASSES = (0, 1, 2, 3, 6, 9, 17)
_NEW_CLASSES = (0, 1, 1, 2, 3, 4, 5)


def trim_semantic_label(raw_labels: np.ndarray) -> np.ndarray:
    """Map raw {0,1,2,3,6,9,17} ids to compact {0..5} ids (host-side)."""
    out = raw_labels.copy()
    for old, new in zip(_RAW_CLASSES, _NEW_CLASSES):
        out[raw_labels == old] = new
    if out.min() < 0 or out.max() > NUM_CLASSES - 1:
        raise ValueError("semantic label out of range after trimming")
    return out


def semantics_loss(
    semantic_logits,
    gt_labels,
    uncertainty_map=None,
    reduction: Optional[str] = "mean",
):
    """Returns (loss, valid_rate). gt_labels: [B, H, W] (or [B, H, W, 1])."""
    if uncertainty_map is not None:
        raise NotImplementedError("semantics has no uncertainty head (reference parity)")
    if gt_labels.ndim == 4:
        gt_labels = gt_labels[..., 0]
    B, H, W, C = semantic_logits.shape
    N = H * W
    labels = gt_labels.astype(jnp.int32).reshape(B, N)
    logits = semantic_logits.reshape(B, N, C)

    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]  # [B, N]

    pred = jnp.argmax(log_probs, axis=-1)
    valid_rate = jnp.mean((pred == labels).astype(jnp.float32))

    loss = reduce_loss(jnp.sum(nll, axis=1), N, reduction)
    return loss, valid_rate
