"""SegNet: encoder-decoder with max-pool indices.

Parity target: reference models.py:79-172.  torch's
MaxPool2d(return_indices=True)/MaxUnpool2d pair becomes the vectorized
window-argmax pool/scatter in blocks.py (no global gathers — TPU-friendly).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from enhanced_unet_tpu.models.blocks import (
    ConvBNAct,
    max_pool_with_indices,
    max_unpool_2x2,
)


class SegNet(nn.Module):
    num_classes: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        def double(y, c):
            y = ConvBNAct(c, dtype=self.dtype)(y, train)
            return ConvBNAct(c, dtype=self.dtype)(y, train)

        # encoder (models.py:87-118)
        y = double(x, 64)
        y, i1 = max_pool_with_indices(y)
        y = double(y, 128)
        y, i2 = max_pool_with_indices(y)
        y = double(y, 256)
        y, i3 = max_pool_with_indices(y)
        y = double(y, 512)
        y, i4 = max_pool_with_indices(y)

        # decoder (models.py:121-150): unpool then conv pairs narrowing
        y = max_unpool_2x2(y, i4)
        y = ConvBNAct(512, dtype=self.dtype)(y, train)
        y = ConvBNAct(256, dtype=self.dtype)(y, train)
        y = max_unpool_2x2(y, i3)
        y = ConvBNAct(256, dtype=self.dtype)(y, train)
        y = ConvBNAct(128, dtype=self.dtype)(y, train)
        y = max_unpool_2x2(y, i2)
        y = ConvBNAct(128, dtype=self.dtype)(y, train)
        y = ConvBNAct(64, dtype=self.dtype)(y, train)
        y = max_unpool_2x2(y, i1)
        y = ConvBNAct(64, dtype=self.dtype)(y, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32)(y)
        return logits.astype(jnp.float32), {}
