"""Compute-path ops: losses, resize, on-device preprocessing/augmentation,
thresholding, TTA, tiling.  Everything here is jnp/Pallas and jit-safe."""

from enhanced_unet_tpu.ops.losses import (
    focal_loss,
    dice_loss,
    tversky_loss,
    combined_loss,
    combined_loss_with_aux,
)

__all__ = [
    "focal_loss",
    "dice_loss",
    "tversky_loss",
    "combined_loss",
    "combined_loss_with_aux",
]
