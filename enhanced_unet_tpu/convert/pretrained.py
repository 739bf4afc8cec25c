"""Pretrained ImageNet encoder initialization (reference models.py:255-275).

The reference trains from ImageNet-pretrained smp encoders: smp downloads
torchvision ResNet weights and lukemelas/efficientnet-pytorch EfficientNet
weights at model construction.  This environment has no network, so this
module ships the exact MANIFEST of upstream files (the same ones smp
fetches) plus a one-command import path: download the files anywhere with
network access, drop them in a directory, and
`initialize_pretrained(state, model_name, weights_dir)` (or
`python -m enhanced_unet_tpu.cli --mode train --pretrained-dir DIR`;
`--mode manifest` prints the required files)
grafts them into the matching encoder subtree(s) of a TrainState.

File integrity: torch.hub's convention embeds the first 8 hex chars of the
file's SHA256 in the filename; `verify_weight_file` checks it.  The full
hashes are therefore verifiable offline from the names alone.

The state-dict layouts consumed here are raw upstream formats —
torchvision (`conv1.weight`, `layer{1..4}.*`) and efficientnet-pytorch
(`_conv_stem.*`, `_blocks.{i}.*`) — which is exactly what
convert_resnet / convert_efficientnet (torch_import.py) parse, because
smp's encoders ARE those modules.
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Any, Dict, Mapping, Optional, Tuple

from enhanced_unet_tpu.convert.torch_import import (
    _ENCODER_MAP,
    import_encoder,
)

# Upstream weight files, exactly as segmentation_models_pytorch resolves
# them for the reference's six models (models.py:182-192, 255-275, 353-362,
# 430-440, 520-529).  url is informational (no egress here); the filename's
# 8-hex suffix is torch.hub's SHA256 prefix.
WEIGHT_MANIFEST: Dict[str, Dict[str, Any]] = {
    "resnet18": {
        "file": "resnet18-5c106cde.pth",
        "url": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
        "sha256_prefix": "5c106cde",
        "used_by": ["fcn", "linknet"],
    },
    "resnet34": {
        "file": "resnet34-333f7ec4.pth",
        "url": "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
        "sha256_prefix": "333f7ec4",
        "used_by": ["pspnet"],
    },
    "resnet50": {
        "file": "resnet50-19c8e357.pth",
        "url": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
        "sha256_prefix": "19c8e357",
        "used_by": ["unet"],
    },
    "efficientnet-b4": {
        "file": "efficientnet-b4-6ed6700e.pth",
        "url": ("https://github.com/lukemelas/EfficientNet-PyTorch/releases/"
                "download/1.0/efficientnet-b4-6ed6700e.pth"),
        "sha256_prefix": "6ed6700e",
        "used_by": ["enhanced_unet (deeplab branch)"],
    },
    "efficientnet-b5": {
        "file": "efficientnet-b5-b6417697.pth",
        "url": ("https://github.com/lukemelas/EfficientNet-PyTorch/releases/"
                "download/1.0/efficientnet-b5-b6417697.pth"),
        "sha256_prefix": "b6417697",
        "used_by": ["enhanced_unet (unetpp branch)"],
    },
}

# model name -> encoder role -> (manifest key, tree path comes from
# _ENCODER_MAP's matching entry)
_MODEL_VARIANTS: Dict[str, Dict[str, str]] = {
    "enhanced_unet": {"unetpp.encoder.": "efficientnet-b5",
                      "deeplab.encoder.": "efficientnet-b4"},
    "unet": {"model.encoder.": "resnet50"},
    "fcn": {"model.encoder.": "resnet18"},
    "pspnet": {"model.encoder.": "resnet34"},
    "linknet": {"model.encoder.": "resnet18"},
}


def verify_weight_file(path: str) -> bool:
    """True iff the file's SHA256 starts with the 8-hex prefix embedded in
    its torch.hub-style filename (``name-<prefix8>.pth``)."""
    m = re.match(r".*-([0-9a-f]{8})\.pth$", os.path.basename(path))
    if not m:
        raise ValueError(f"{path}: not a torch.hub-style weight filename")
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest().startswith(m.group(1))


def required_weights(model_name: str) -> Dict[str, Dict[str, Any]]:
    """Manifest entries a model's pretrained init needs (empty for the
    *_basic fallbacks and segnet, which have no smp encoders and train from
    scratch in the reference too, models.py:79-172, 199-240)."""
    roles = _MODEL_VARIANTS.get(model_name, {})
    return {v: WEIGHT_MANIFEST[v] for v in roles.values()}


def initialize_pretrained(
    state,
    model_name: str,
    weights_dir: Optional[str] = None,
    state_dicts: Optional[Mapping[str, Mapping[str, Any]]] = None,
    verify: bool = True,
    log=print,
):
    """Graft ImageNet-pretrained encoder weights into a fresh TrainState.

    weights_dir: directory holding the manifest files (downloaded
    elsewhere); state_dicts: alternative in-memory
    {variant: raw upstream state dict} mapping (tests).  Returns
    (new_state, imported_roles).  Reference behavior this reproduces: smp's
    encoder_weights="imagenet" constructor default (models.py:182-192,
    255-275).
    """
    roles = _MODEL_VARIANTS.get(model_name)
    if not roles:
        raise ValueError(
            f"{model_name} has no pretrained encoders (reference trains it "
            "from scratch)")
    enc_map = _ENCODER_MAP[model_name]

    params, stats = state.params, state.batch_stats
    imported = []
    for prefix, variant in roles.items():
        kind, variant_check, depth, tree_path = enc_map[prefix]
        assert variant == variant_check, (variant, variant_check)
        if state_dicts is not None:
            sd = state_dicts[variant]
        else:
            fname = WEIGHT_MANIFEST[variant]["file"]
            path = os.path.join(weights_dir or ".", fname)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"{path} not found; download it from "
                    f"{WEIGHT_MANIFEST[variant]['url']}")
            if verify and not verify_weight_file(path):
                raise ValueError(
                    f"{path}: SHA256 does not match the "
                    f"{WEIGHT_MANIFEST[variant]['sha256_prefix']} prefix in "
                    "its filename")
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
        # raw upstream files carry classifier heads our encoders don't
        # have (fc.* / _fc.*); the converters simply never read those keys
        params, stats = import_encoder(
            params, stats, sd, kind, variant, tree_path, depth)
        imported.append(variant)
        log(f"initialized {tree_path[-1] if tree_path else variant} "
            f"from {variant} ImageNet weights")
    return state.replace(params=params, batch_stats=stats), imported
