"""torch -> Flax weight conversion (pretrained encoders, reference .pth
checkpoints)."""

from enhanced_unet_tpu.convert.pretrained import (
    WEIGHT_MANIFEST,
    initialize_pretrained,
    required_weights,
    verify_weight_file,
)
from enhanced_unet_tpu.convert.torch_import import (
    convert_deeplab_decoder,
    convert_efficientnet,
    convert_enhanced_unet,
    convert_resnet,
    convert_smp_deeplab,
    convert_smp_unetpp,
    convert_unetpp_decoder,
    graft,
    import_encoder,
    load_torch_checkpoint,
)

__all__ = [
    "WEIGHT_MANIFEST",
    "initialize_pretrained",
    "required_weights",
    "verify_weight_file",
    "convert_deeplab_decoder",
    "convert_efficientnet",
    "convert_enhanced_unet",
    "convert_resnet",
    "convert_smp_deeplab",
    "convert_smp_unetpp",
    "convert_unetpp_decoder",
    "graft",
    "import_encoder",
    "load_torch_checkpoint",
]
