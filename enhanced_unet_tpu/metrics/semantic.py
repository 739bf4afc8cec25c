"""Semantic segmentation metrics.

Parity target: reference metrics.py:12-58 (calculate_iou / calculate_dice /
calculate_semantic_metrics).  The reference computes per-class binary IoU and
Dice in numpy on the host; here the hot path is a single on-device 3x3
confusion-matrix reduction (`semantic_confusion_matrix`) from which every
per-class metric is derived — one device->host sync per image instead of six
mask reductions.  The numpy functions are kept for API parity and as the
test oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 3
CLASS_NAMES = ("background", "live", "dead")


# ---------------------------------------------------------------------------
# numpy API parity layer (reference metrics.py:12-58)
# ---------------------------------------------------------------------------

def calculate_iou(mask1: np.ndarray, mask2: np.ndarray) -> float:
    """Binary IoU with the reference's empty-union convention
    (metrics.py:12-18): union == 0 -> 1.0."""
    intersection = np.logical_and(mask1, mask2).sum()
    union = np.logical_or(mask1, mask2).sum()
    if union == 0:
        return 1.0 if intersection == 0 else 0.0
    return float(intersection / union)


def calculate_dice(mask1: np.ndarray, mask2: np.ndarray) -> float:
    """Binary Dice with the reference's both-empty convention
    (metrics.py:21-26)."""
    intersection = np.logical_and(mask1, mask2).sum()
    denom = mask1.sum() + mask2.sum()
    if denom == 0:
        return 1.0
    return float(2.0 * intersection / denom)


def calculate_semantic_metrics(pred_mask: np.ndarray, gt_mask: np.ndarray) -> Dict:
    """Per-class IoU/Dice + means; key names match reference metrics.py:29-58.

    Mask format: 0=background, 1=live, 2=dead.
    """
    cm = np.asarray(
        semantic_confusion_matrix(jnp.asarray(pred_mask), jnp.asarray(gt_mask))
    )
    return metrics_from_confusion(cm)


# ---------------------------------------------------------------------------
# on-device reduction
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_classes",))
def semantic_confusion_matrix(
    pred_mask: jnp.ndarray, gt_mask: jnp.ndarray, num_classes: int = NUM_CLASSES
) -> jnp.ndarray:
    """num_classes x num_classes confusion matrix, cm[gt, pred] = pixel count.

    A single bincount-style reduction: all per-class IoU/Dice values are
    linear functions of this matrix, so only 9 scalars cross the host
    boundary per image.
    """
    pred = pred_mask.astype(jnp.int32).reshape(-1)
    gt = gt_mask.astype(jnp.int32).reshape(-1)
    idx = gt * num_classes + pred
    # int32 counts are safe up to 2**31 pixels per (gt, pred) cell —
    # far beyond any batch this framework sees
    cm = jnp.zeros((num_classes * num_classes,), dtype=jnp.int32)
    cm = cm.at[idx].add(1)
    return cm.reshape(num_classes, num_classes)


def metrics_from_confusion(cm: np.ndarray) -> Dict:
    """Derive the reference's metric dict from a confusion matrix.

    For class c: TP = cm[c,c], FP = colsum - TP, FN = rowsum - TP.
    IoU = TP/(TP+FP+FN) with union==0 -> 1.0; Dice = 2TP/(2TP+FP+FN) with
    denom==0 -> 1.0 (same conventions as metrics.py:12-26).
    """
    cm = np.asarray(cm, dtype=np.float64)
    metrics: Dict = {}
    for c, name in enumerate(CLASS_NAMES):
        tp = cm[c, c]
        fp = cm[:, c].sum() - tp
        fn = cm[c, :].sum() - tp
        union = tp + fp + fn
        iou = 1.0 if union == 0 else tp / union
        denom = 2 * tp + fp + fn
        dice = 1.0 if denom == 0 else 2 * tp / denom
        metrics[f"sem_{name}_iou"] = float(iou)
        metrics[f"sem_{name}_dice"] = float(dice)

    mean_iou_all = (
        metrics["sem_background_iou"]
        + metrics["sem_live_iou"]
        + metrics["sem_dead_iou"]
    ) / 3
    mean_iou_cells = (metrics["sem_live_iou"] + metrics["sem_dead_iou"]) / 2
    mean_dice = (metrics["sem_live_dice"] + metrics["sem_dead_dice"]) / 2
    # key semantics follow metrics.py:54-56: sem_mean_iou excludes background
    metrics["sem_mean_iou"] = mean_iou_cells
    metrics["sem_mean_iou_all"] = mean_iou_all
    metrics["sem_mean_dice"] = mean_dice
    return metrics


@partial(jax.jit, static_argnames=("num_classes",))
def batched_confusion_matrix(
    pred_masks: jnp.ndarray, gt_masks: jnp.ndarray, num_classes: int = NUM_CLASSES
) -> jnp.ndarray:
    """[B, C, C] per-image confusion matrices in one device call (used by the
    jitted eval step so validation metrics never leave the device per-pixel)."""
    return jax.vmap(
        lambda p, g: semantic_confusion_matrix(p, g, num_classes=num_classes)
    )(pred_masks, gt_masks)
