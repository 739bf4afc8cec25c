"""Compute-path ops: losses, resize, on-device preprocessing/augmentation,
thresholding, TTA, tiling.  Everything here is jnp/Pallas and jit-safe."""

from enhanced_unet_tpu.ops.losses import (
    focal_loss,
    dice_loss,
    tversky_loss,
    combined_loss,
    combined_loss_with_aux,
)
from enhanced_unet_tpu.ops.resize import (
    pad_to_multiple,
    resize_bilinear,
    upsample2x,
    upsample2x_nearest,
)
from enhanced_unet_tpu.ops.preprocess import (
    cell_specific_preprocess,
    clahe_u8,
    eval_preprocess,
)
from enhanced_unet_tpu.ops.augment import augment_batch, augment_train
from enhanced_unet_tpu.ops.thresholding import convert_probs_to_mask
from enhanced_unet_tpu.ops.tta import run_model_single, tta_probs, tta_probs_batch
from enhanced_unet_tpu.ops.tiling import tiled_inference, tiled_semantic_mask

__all__ = [
    "focal_loss",
    "dice_loss",
    "tversky_loss",
    "combined_loss",
    "combined_loss_with_aux",
    "pad_to_multiple",
    "resize_bilinear",
    "upsample2x",
    "upsample2x_nearest",
    "cell_specific_preprocess",
    "clahe_u8",
    "eval_preprocess",
    "augment_batch",
    "augment_train",
    "convert_probs_to_mask",
    "run_model_single",
    "tta_probs",
    "tta_probs_batch",
    "tiled_inference",
    "tiled_semantic_mask",
]
