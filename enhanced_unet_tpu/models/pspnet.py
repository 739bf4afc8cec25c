"""PSPNet: pyramid scene parsing (resnet34 backbone) + basic fallback.

Parity targets: reference models.py:423-510 — smp.PSPNet("resnet34",
encoder_depth=4, psp_dropout=0.1) and the BasicPSPNet fallback with
adaptive-avg-pool pyramid {1,2,4}.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from enhanced_unet_tpu.models.blocks import (
    ConvBNAct,
    PSPModule,
    _adaptive_avg_pool,
    max_pool_2x2,
)
from enhanced_unet_tpu.models.encoders import ResNetEncoder
from enhanced_unet_tpu.ops.resize import resize_bilinear, upsample2x


class BasicPSPNet(nn.Module):
    """Reference fallback (models.py:447-505): 3 single-conv stages, pyramid
    pooling {1,2,4} with raw pooled features upsampled and concatenated."""

    num_classes: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        e1 = ConvBNAct(64, dtype=self.dtype)(x, train)
        e2 = ConvBNAct(128, dtype=self.dtype)(max_pool_2x2(e1), train)
        e3 = ConvBNAct(256, dtype=self.dtype)(max_pool_2x2(e2), train)

        h, w = e3.shape[1:3]
        pyramid = [e3]
        for b in (1, 2, 4):
            pooled = _adaptive_avg_pool(e3, b)
            pyramid.append(resize_bilinear(pooled, (h, w)).astype(e3.dtype))
        fused = jnp.concatenate(pyramid, axis=-1)
        d = ConvBNAct(128, dtype=self.dtype)(fused, train)
        d = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(d)
        return upsample2x(upsample2x(d.astype(jnp.float32))), {}


class PSPNet(nn.Module):
    """resnet34-backed PSPNet (models.py:430-440)."""

    num_classes: int = 3
    encoder_name: str = "resnet34"
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        feats = ResNetEncoder(variant=self.encoder_name, depth=4,
                              dtype=self.dtype)(x, train)
        y = PSPModule(features=feats[-1].shape[-1] // 4,
                      dtype=self.dtype)(feats[-1], train)
        y = ConvBNAct(512, (1, 1), dtype=self.dtype)(y, train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         dtype=self.dtype, param_dtype=jnp.float32)(y)
        return resize_bilinear(logits.astype(jnp.float32), x.shape[1:3]), {}
