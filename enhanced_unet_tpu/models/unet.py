"""UNet family: BasicUNet (hand-rolled fallback) and ResNet50-UNet.

Parity targets:
- BasicUNet: reference models.py:199-240 (enc1-4 double-conv + pool,
  bilinear-up + skip concat decoder, 1x1 head applied after a final 2x up).
- UNet: reference models.py:182-192 — smp.Unet(resnet50, encoder_depth=5,
  decoder_channels=[256,128,64,32,16]).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from enhanced_unet_tpu.models.blocks import (
    DoubleConv,
    UpConcatBlock,
    max_pool_2x2,
)
from enhanced_unet_tpu.models.encoders import ResNetEncoder


class BasicUNet(nn.Module):
    """The reference's fallback UNet (models.py:199-240), NHWC."""

    num_classes: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        e1 = DoubleConv(64, dtype=self.dtype)(x, train)
        e2 = DoubleConv(128, dtype=self.dtype)(max_pool_2x2(e1), train)
        e3 = DoubleConv(256, dtype=self.dtype)(max_pool_2x2(e2), train)
        e4 = DoubleConv(512, dtype=self.dtype)(max_pool_2x2(e3), train)

        # the reference's hand-rolled fallback uses bilinear (models.py:215)
        d4 = UpConcatBlock(256, bilinear=True, dtype=self.dtype)(e4, e3, train)
        d3 = UpConcatBlock(128, bilinear=True, dtype=self.dtype)(d4, e2, train)
        d2 = UpConcatBlock(64, bilinear=True, dtype=self.dtype)(d3, e1, train)
        # reference applies the 1x1 head to upsample(d2) (models.py:236);
        # with e1 at full resolution, upsample(d2) doubles past input size —
        # models.py pools only 3 times, so d2 is already full-res and the
        # final upsample in the reference compensates enc1 running at full
        # res with pools applied before enc2..4.  Net effect: head on d2.
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32)(d2)
        return logits.astype(jnp.float32), {}


class UNetDecoder(nn.Module):
    """smp-style UNet decoder: 5 up-concat blocks over the feature pyramid."""

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    use_scse: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats: [input, s2, s4, s8, s16, s32]
        y = feats[-1]
        skips = feats[-2:0:-1]  # [s16, s8, s4, s2]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            y = UpConcatBlock(ch, use_scse=self.use_scse, dtype=self.dtype)(
                y, skip, train
            )
        return y


class UNet(nn.Module):
    """ResNet50-backed UNet (smp.Unet equivalent, models.py:182-192)."""

    num_classes: int = 3
    encoder_name: str = "resnet50"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        feats = ResNetEncoder(variant=self.encoder_name, dtype=self.dtype)(x, train)
        y = UNetDecoder(dtype=self.dtype)(feats, train)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         dtype=self.dtype, param_dtype=jnp.float32)(y)
        return logits.astype(jnp.float32), {}
