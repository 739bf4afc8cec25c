"""FCN model slot: FPN(resnet18, depth 4) + BasicFCN fallback.

Parity targets: reference models.py:346-420 — smp.FPN("resnet18",
encoder_depth=4) when smp is available, else a simple VGG-ish BasicFCN.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from enhanced_unet_tpu.models.blocks import ConvBNAct, max_pool_2x2
from enhanced_unet_tpu.models.encoders import ResNetEncoder
from enhanced_unet_tpu.ops.resize import resize_bilinear, upsample2x


class BasicFCN(nn.Module):
    """Reference fallback FCN (models.py:369-415): 3 conv stages with 2
    pools, light decoder, output at full resolution."""

    num_classes: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        def stage(y, c):
            y = ConvBNAct(c, use_bn=False, dtype=self.dtype)(y, train)
            return ConvBNAct(c, use_bn=False, dtype=self.dtype)(y, train)

        e1 = stage(x, 64)
        e2 = stage(max_pool_2x2(e1), 128)
        e3 = stage(max_pool_2x2(e2), 256)
        d3 = ConvBNAct(128, use_bn=False, dtype=self.dtype)(e3, train)
        d2 = ConvBNAct(64, use_bn=False, dtype=self.dtype)(upsample2x(d3), train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32)(upsample2x(d2))
        return logits.astype(jnp.float32), {}


class FPNHead(nn.Module):
    """FPN decoder: 1x1 laterals -> top-down add -> per-level seg blocks ->
    merged by sum (smp FPNDecoder semantics)."""

    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dropout: float = 0.2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats ordered fine->coarse
        laterals = [
            nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(f)
            for f in feats
        ]
        # top-down pathway
        pyramid = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = resize_bilinear(pyramid[-1], lat.shape[1:3]).astype(lat.dtype)
            pyramid.append(lat + up)
        pyramid = pyramid[::-1]  # fine->coarse again

        target_hw = pyramid[0].shape[1:3]
        merged = 0.0
        for p in pyramid:
            s = ConvBNAct(self.segmentation_channels, dtype=self.dtype)(p, train)
            s = ConvBNAct(self.segmentation_channels, dtype=self.dtype)(s, train)
            merged = merged + resize_bilinear(s, target_hw).astype(s.dtype)
        merged = nn.Dropout(self.dropout, deterministic=not train)(merged)
        return merged


class FCN(nn.Module):
    """FPN(resnet18, encoder_depth=4) — the reference's 'fcn' slot
    (models.py:353-362)."""

    num_classes: int = 3
    encoder_name: str = "resnet18"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        feats = ResNetEncoder(variant=self.encoder_name, depth=4,
                              dtype=self.dtype)(x, train)
        # use the 4 downsampled levels (s2..s16)
        y = FPNHead(dtype=self.dtype)(feats[1:], train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32)(y)
        logits = resize_bilinear(logits.astype(jnp.float32), x.shape[1:3])
        return logits, {}
