"""LinkNet: lightweight segmentation with additive skips + basic fallback.

Parity targets: reference models.py:513-587 — smp.Linknet("resnet18",
encoder_depth=3) and BasicLinkNet (additive-skip light decoder).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from enhanced_unet_tpu.models.blocks import ConvBNAct, max_pool_2x2
from enhanced_unet_tpu.models.encoders import ResNetEncoder
from enhanced_unet_tpu.ops.resize import upsample2x


class BasicLinkNet(nn.Module):
    """Reference fallback (models.py:536-582)."""

    num_classes: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        e1 = ConvBNAct(64, dtype=self.dtype)(x, train)
        e2 = ConvBNAct(128, dtype=self.dtype)(max_pool_2x2(e1), train)
        e3 = ConvBNAct(256, dtype=self.dtype)(max_pool_2x2(e2), train)

        d3 = ConvBNAct(128, dtype=self.dtype)(e3, train)
        d2 = ConvBNAct(64, dtype=self.dtype)(upsample2x(d3) + e2, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32)(upsample2x(d2) + e1)
        return logits.astype(jnp.float32), {}


class LinkNetDecoderBlock(nn.Module):
    """LinkNet decoder unit: 1x1 bottleneck -> transposed-conv 2x upsample
    -> 1x1 expand (the classic LinkNet block)."""

    out_features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = ConvBNAct(c // 4, (1, 1), dtype=self.dtype)(x, train)
        y = nn.ConvTranspose(c // 4, (3, 3), strides=(2, 2), padding="SAME",
                             dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        return ConvBNAct(self.out_features, (1, 1), dtype=self.dtype)(y, train)


class LinkNet(nn.Module):
    """resnet18-backed LinkNet, encoder_depth=3 (models.py:520-529)."""

    num_classes: int = 3
    encoder_name: str = "resnet18"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        feats = ResNetEncoder(variant=self.encoder_name, depth=3,
                              dtype=self.dtype)(x, train)
        # feats: [input, s2, s4, s8]
        y = LinkNetDecoderBlock(feats[-2].shape[-1], dtype=self.dtype)(feats[-1], train)
        y = y + feats[-2]
        y = LinkNetDecoderBlock(feats[-3].shape[-1], dtype=self.dtype)(y, train)
        y = y + feats[-3]
        y = LinkNetDecoderBlock(32, dtype=self.dtype)(y, train)  # to stride 1
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         dtype=self.dtype, param_dtype=jnp.float32)(y)
        return logits.astype(jnp.float32), {}
