"""torch -> Flax weight conversion (pretrained encoders, reference .pth
checkpoints)."""

from enhanced_unet_tpu.convert.torch_import import (
    convert_efficientnet,
    convert_resnet,
    graft,
    import_encoder,
    load_torch_checkpoint,
)

__all__ = [
    "convert_efficientnet",
    "convert_resnet",
    "graft",
    "import_encoder",
    "load_torch_checkpoint",
]
