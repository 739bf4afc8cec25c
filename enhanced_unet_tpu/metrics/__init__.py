"""Metrics: semantic IoU/Dice (on-device), instance matching, COCO mAP,
viability.  API parity with reference metrics.py."""

from enhanced_unet_tpu.metrics.semantic import (
    calculate_iou,
    calculate_dice,
    calculate_semantic_metrics,
    semantic_confusion_matrix,
    metrics_from_confusion,
)
from enhanced_unet_tpu.metrics.instance import calculate_instance_metrics
from enhanced_unet_tpu.metrics.viability import calculate_viability_metrics
from enhanced_unet_tpu.metrics.coco import calculate_coco_metrics

__all__ = [
    "calculate_iou",
    "calculate_dice",
    "calculate_semantic_metrics",
    "semantic_confusion_matrix",
    "metrics_from_confusion",
    "calculate_instance_metrics",
    "calculate_viability_metrics",
    "calculate_coco_metrics",
]
