"""Fused 3x3 conv + BatchNorm(inference) + ReLU Pallas kernel.

The zoo's hottest block (ConvBNAct, models/blocks.py) at inference time:
BN folds into a per-channel scale/shift epilogue on the conv.

Mosaic-friendly formulation (three earlier variants failed TPU lowering:
a channel-concat of shifted slices -> layout offset mismatch; a halo DMA
-> non-tile-aligned slice; in-kernel pltpu.roll -> bf16 rotate
unimplemented):
- all 9 tap shifts are materialized as XLA slices of the padded input, so
  every BlockSpec is non-overlapping and tile-aligned and the kernel body
  is pure MXU work;
- 9 per-tap [th*W, Cin] x [Cin, Cout] matmuls accumulate in fp32 with the
  scale/shift + ReLU epilogue fused.
The 9x input-read amplification makes this kernel compute-bound-only; XLA's
native conv (which shares halos in VMEM) is expected to win at small Cin —
benchmarks/kernel_bench.py records the verdict per shape.

Weights layout: [3, 3, Cin, Cout] (HWIO, flax conv convention).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_conv3x3_bn_relu_reference(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    relu: bool = True,
) -> jnp.ndarray:
    """jnp reference: conv3x3(SAME) -> y*scale + shift -> relu."""
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * scale.astype(jnp.float32) + shift.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _kernel(*refs, th: int, w_out: int, cin: int, relu: bool):
    tap_refs = refs[:9]
    w_ref, scale_ref, shift_ref, out_ref = refs[9:13]
    acc = None
    for tap in range(9):
        patch = tap_refs[tap][0].reshape(th * w_out, cin)
        part = jnp.dot(
            patch, w_ref[tap], preferred_element_type=jnp.float32
        )
        acc = part if acc is None else acc + part
    acc = acc * scale_ref[:] + shift_ref[:]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.reshape(1, th, w_out, -1).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("relu", "tile_h", "interpret"))
def fused_conv3x3_bn_relu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    relu: bool = True,
    tile_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas fused ConvBNAct inference block.

    x: [N, H, W, Cin]; w: [3, 3, Cin, Cout]; scale/shift: [Cout].
    H % tile_h == 0 and W % 128 == 0 (the /32-snapped pipeline shapes at
    the zoo's feature resolutions satisfy this).
    """
    n, h, width, cin = x.shape
    cout = w.shape[-1]
    if h % tile_h or width % 128:
        raise ValueError(f"H % {tile_h} and W % 128 must be 0, got {h}x{width}")

    # 9 tap-shifted views of the SAME-padded input (XLA slices)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        x_pad[:, dy : dy + h, dx : dx + width, :]
        for dy in range(3)
        for dx in range(3)
    ]

    w_flat = w.reshape(9, cin, cout).astype(x.dtype)
    scale_f = scale.astype(jnp.float32).reshape(1, cout)
    shift_f = shift.astype(jnp.float32).reshape(1, cout)

    grid = (n, h // tile_h)
    tap_spec = pl.BlockSpec(
        (1, tile_h, width, cin), lambda b, i: (b, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        partial(_kernel, th=tile_h, w_out=width, cin=cin, relu=relu),
        out_shape=jax.ShapeDtypeStruct((n, h, width, cout), x.dtype),
        grid=grid,
        in_specs=[tap_spec] * 9 + [
            pl.BlockSpec((9, cin, cout), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, width, cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*taps, w_flat, scale_f, shift_f)


def fold_bn_params(
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-5,
    conv_bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold BatchNorm inference params into (scale, shift) for the kernel:
    y = gamma*(conv+bias-mean)/sqrt(var+eps)+beta = conv*scale + shift."""
    inv = gamma * jax.lax.rsqrt(var + eps)
    shift = beta - mean * inv
    if conv_bias is not None:
        shift = shift + conv_bias * inv
    return inv, shift
