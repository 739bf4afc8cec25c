"""Model zoo with the reference's factory API.

Parity target: reference models.py:590-624 (get_model).  Names map to the
same six slots; `*_basic` variants expose the reference's non-smp fallback
architectures.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from enhanced_unet_tpu.models.segnet import SegNet
from enhanced_unet_tpu.models.unet import BasicUNet, UNet
from enhanced_unet_tpu.models.enhanced_unet import (
    DeepLabV3Plus,
    EnhancedUNet,
    EnhancedUNetBasic,
    UNetPlusPlus,
)
from enhanced_unet_tpu.models.fcn import FCN, BasicFCN
from enhanced_unet_tpu.models.pspnet import PSPNet, BasicPSPNet
from enhanced_unet_tpu.models.linknet import LinkNet, BasicLinkNet

_REGISTRY = {
    "segnet": SegNet,
    "unet": UNet,
    "unet_basic": BasicUNet,
    "enhanced_unet": EnhancedUNet,
    "enhanced_unet_basic": EnhancedUNetBasic,
    "fcn": FCN,
    "fcn_basic": BasicFCN,
    "pspnet": PSPNet,
    "pspnet_basic": BasicPSPNet,
    "linknet": LinkNet,
    "linknet_basic": BasicLinkNet,
}


def get_model(model_name: str, num_classes: int = 3,
              dtype: Any = jnp.bfloat16, **kwargs):
    """Instantiate a model by name (reference models.py:590-624).

    All models share the call signature
    `(params_vars, x_nhwc, train=False) -> (logits_f32, aux_dict)`.
    """
    if model_name not in _REGISTRY:
        raise ValueError(
            f"Unknown model: {model_name}; expected one of {sorted(_REGISTRY)}"
        )
    return _REGISTRY[model_name](num_classes=num_classes, dtype=dtype, **kwargs)


__all__ = [
    "get_model",
    "SegNet",
    "UNet",
    "BasicUNet",
    "EnhancedUNet",
    "EnhancedUNetBasic",
    "UNetPlusPlus",
    "DeepLabV3Plus",
    "FCN",
    "BasicFCN",
    "PSPNet",
    "BasicPSPNet",
    "LinkNet",
    "BasicLinkNet",
]
