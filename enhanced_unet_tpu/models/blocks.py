"""Shared Flax building blocks for the model zoo.

TPU-first design notes:
- NHWC layout throughout (XLA's native conv layout on TPU; channels-last
  keeps the 128-lane dimension dense).
- `dtype` threads a compute dtype (bfloat16 by default) through convs/norms
  while params stay float32 — bf16 feeds the MXU at full rate.
- BatchNorm matches torch defaults (eps 1e-5, momentum 0.1 -> flax momentum
  0.9) and takes an optional `axis_name` so running statistics are reduced
  across data-parallel replicas inside shard_map (the reference trains
  unsynced BN on a single device, train_eval.py:1059; syncing is strictly
  better at batch 2/replica and is the documented deviation).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhanced_unet_tpu.ops.resize import (
    resize_bilinear,
    upsample2x,
    upsample2x_nearest,
)

Dtype = Any


class ConvBNAct(nn.Module):
    """Conv2d -> BatchNorm -> activation (the zoo's hottest fusion target).

    Equivalent of the reference's nn.Sequential(Conv2d, BatchNorm2d, ReLU)
    stacks (e.g. models.py:87-94).  XLA fuses BN+act into the conv epilogue;
    a Pallas variant exists for cases XLA leaves on the table.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    act: Optional[Callable] = nn.relu
    use_bias: bool = True
    use_bn: bool = True
    # "SAME" (TF/XLA asymmetric) or "torch" (symmetric k//2 — what
    # torchvision convs do; differs from SAME only for stride > 1).  The
    # ResNet encoders use "torch" so imported torchvision/smp weights
    # reproduce the reference bit-for-bit (convert/torch_import.py).
    padding: Any = "SAME"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = self.padding
        if padding == "torch":
            padding = tuple((k // 2, k // 2) for k in self.kernel_size)
        # a conv bias directly before BatchNorm is a dead parameter (BN's
        # mean subtraction cancels it; its gradient is pure fp noise) — the
        # reference keeps torch's default bias=True there (models.py:88),
        # which is functionally identical but wastes params/HBM.
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=padding,
            use_bias=self.use_bias and not self.use_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=None,
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DoubleConv(nn.Module):
    """Two ConvBNAct blocks — the UNet encoder/decoder unit
    (reference models.py:217-225 `_conv_block`)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.features, dtype=self.dtype)(x, train)
        x = ConvBNAct(self.features, dtype=self.dtype)(x, train)
        return x


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """nn.MaxPool2d(2, 2)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def max_pool_with_indices(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2x2 max-pool returning argmax indices within each window.

    TPU-native replacement for torch's MaxPool2d(return_indices=True)
    (reference models.py:152): windows are non-overlapping, so the pool is a
    reshape + vectorized argmax over a static axis — no gather/scatter of
    global indices, which XLA handles poorly.

    Returns (pooled [N,H/2,W/2,C], idx [N,H/2,W/2,C] in 0..3 row-major
    within the 2x2 window).
    """
    n, h, w, c = x.shape
    xr = x.reshape(n, h // 2, 2, w // 2, 2, c)
    xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4, c)
    idx = jnp.argmax(xr, axis=3).astype(jnp.int32)
    pooled = jnp.max(xr, axis=3)
    return pooled, idx


def max_unpool_2x2(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Inverse of max_pool_with_indices: scatter values back to their argmax
    positions, zeros elsewhere (torch MaxUnpool2d semantics,
    models.py:153).  Implemented as one-hot * value — fully vectorized."""
    n, h2, w2, c = x.shape
    onehot = jax.nn.one_hot(idx, 4, dtype=x.dtype, axis=3)  # [N,H2,W2,4,C]
    scattered = onehot * x[:, :, :, None, :]
    out = scattered.reshape(n, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(n, h2 * 2, w2 * 2, c)


class SCSEBlock(nn.Module):
    """Concurrent spatial & channel squeeze-excitation.

    The reference's UNet++ decoder uses smp's scse attention
    (models.py:261); this is the standard cSE (global-pool -> 2 FC ->
    sigmoid, channel gate) + sSE (1x1 conv -> sigmoid, spatial gate),
    summed.
    """

    reduction: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # channel squeeze-excitation
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(c // self.reduction, 1), (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(s)
        cse = x * jax.nn.sigmoid(s)
        # spatial squeeze-excitation
        t = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(x)
        sse = x * jax.nn.sigmoid(t)
        return cse + sse


class UpConcatBlock(nn.Module):
    """2x upsample + skip concat + DoubleConv — the UNet decoder step.

    Upsampling is nearest-neighbour by default: that is what smp's
    Unet/UnetPlusPlus decoder blocks use (the reference's production path);
    the reference's hand-rolled BasicUNet uses bilinear (models.py:215), so
    that model passes bilinear=True.
    """

    features: int
    use_scse: bool = False
    bilinear: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = upsample2x(x) if self.bilinear else upsample2x_nearest(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = DoubleConv(self.features, dtype=self.dtype)(x, train)
        if self.use_scse:
            x = SCSEBlock(dtype=self.dtype)(x)
        return x


class SeparableConvBNAct(nn.Module):
    """Depthwise (optionally dilated) 3x3 -> pointwise 1x1 -> BN -> ReLU.

    smp's SeparableConv2d + BN + ReLU unit (depthwise bias=False, pointwise
    bias per `pointwise_bias`), used by its DeepLabV3+ ASPP branches and
    decoder blocks.  For stride 1 the TF-SAME padding equals torch's
    symmetric padding=dilation, so imported weights reproduce torch
    exactly."""

    features: int
    kernel: int = 3
    dilation: int = 1
    pointwise_bias: bool = False
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        x = nn.Conv(
            cin, (self.kernel, self.kernel),
            padding="SAME",
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=cin,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.Conv(self.features, (1, 1), use_bias=self.pointwise_bias,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling, smp-exact (smp
    decoders/deeplabv3/decoder.py ASPP with separable=True, the
    DeepLabV3Plus configuration): a 1x1 conv branch, three SEPARABLE
    dilated 3x3 branches, and a global-pool image feature, fused by a 1x1
    projection followed by Dropout(0.5)."""

    features: int = 256
    rates: Sequence[int] = (12, 24, 36)
    # smp's ASPP projection dropout; 0 disables (deterministic harnesses)
    dropout: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        branches = [ConvBNAct(self.features, (1, 1), dtype=self.dtype)(x, train)]
        for r in self.rates:
            branches.append(
                SeparableConvBNAct(self.features, dilation=r,
                                   dtype=self.dtype)(x, train))
        # image-level pooling branch (bilinear resize from 1x1 == broadcast)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBNAct(self.features, (1, 1), dtype=self.dtype)(g, train)
        g = jnp.broadcast_to(g, (x.shape[0], h, w, self.features)).astype(x.dtype)
        branches.append(g)
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNAct(self.features, (1, 1), dtype=self.dtype)(y, train)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class PSPModule(nn.Module):
    """Pyramid scene parsing pooling (reference models.py:470-499 basic
    variant / smp PSPNet): adaptive-average-pool to fixed bins, 1x1 conv,
    upsample back, concat."""

    bin_sizes: Sequence[int] = (1, 2, 3, 6)
    features: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        outs = [x]
        for b in self.bin_sizes:
            # adaptive average pooling to (b, b): mean over equal regions
            pooled = _adaptive_avg_pool(x, b)
            pooled = ConvBNAct(self.features, (1, 1), dtype=self.dtype)(pooled, train)
            outs.append(resize_bilinear(pooled, (h, w)).astype(x.dtype))
        return jnp.concatenate(outs, axis=-1)


def _adaptive_avg_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d to (out_size, out_size) for NHWC.

    Matches torch when H, W divide evenly (the common case after /32
    snapping); otherwise uses torch's floor/ceil bin boundaries.
    """
    n, h, w, c = x.shape
    if h % out_size == 0 and w % out_size == 0:
        kh, kw = h // out_size, w // out_size
        return x.reshape(n, out_size, kh, out_size, kw, c).mean(axis=(2, 4))
    # general torch bins: start = floor(i*H/out), end = ceil((i+1)*H/out)
    rows = []
    for i in range(out_size):
        y0, y1 = (i * h) // out_size, -(-((i + 1) * h) // out_size)
        cols = []
        for j in range(out_size):
            x0, x1 = (j * w) // out_size, -(-((j + 1) * w) // out_size)
            cols.append(x[:, y0:y1, x0:x1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)
