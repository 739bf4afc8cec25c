"""Fused 3x3 conv + BatchNorm(inference) + ReLU Pallas kernel.

The zoo's hottest block (ConvBNAct, models/blocks.py) at inference time:
BN folds into a per-channel scale/shift epilogue on the conv.  The kernel
tiles the NHWC output spatially, DMAs each input tile WITH ITS 1-PIXEL HALO
from HBM into VMEM (overlapping reads are not expressible with plain
BlockSpecs, so the input stays in ANY/HBM and the kernel issues explicit
async copies), builds the 9-tap im2col in registers via static slices, and
runs one [tile_pixels, 9*Cin] x [9*Cin, Cout] contraction on the MXU with
fp32 accumulation, applying scale/shift + ReLU in the epilogue.

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


def _kernel(x_hbm, w_ref, scale_ref, shift_ref, out_ref, x_tile, sem,
            *, th: int, tw: int, cin: int, relu: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    # DMA the (th+2, tw+2) halo tile for this output tile from HBM
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + 2), pl.ds(j * tw, tw + 2), :],
        x_tile,
        sem,
    )
    copy.start()
    copy.wait()

    # 9 shifted-slice matmuls accumulated in fp32 (a channel-concat of the
    # shifted slices trips Mosaic's layout lowering on real TPUs — offset
    # mismatch on non-concat dims — so feed the MXU per-tap instead)
    acc = None
    for tap in range(9):
        dy, dx = tap // 3, tap % 3
        patch = x_tile[dy : dy + th, dx : dx + tw, :].reshape(th * tw, cin)
        partial_ = jnp.dot(
            patch, w_ref[tap], preferred_element_type=jnp.float32
        )
        acc = partial_ if acc is None else acc + partial_
    acc = acc * scale_ref[:] + shift_ref[:]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.reshape(1, th, tw, -1).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("relu", "tile", "interpret"))
def fused_conv3x3_bn_relu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    relu: bool = True,
    tile: Tuple[int, int] = (8, 128),
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas fused ConvBNAct inference block.

    x: [N, H, W, Cin]; w: [3, 3, Cin, Cout]; scale/shift: [Cout].
    H % tile[0] == 0 and W % tile[1] == 0 (the /32-snapped pipeline shapes
    satisfy this for the default (8, 128) tile).
    """
    n, h, width, cin = x.shape
    cout = w.shape[-1]
    th, tw = tile
    if h % th or width % tw:
        raise ValueError(f"H, W ({h},{width}) must divide tile {tile}")

    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w_flat = w.reshape(9, cin, cout).astype(x.dtype)
    scale_f = scale.astype(jnp.float32).reshape(1, cout)
    shift_f = shift.astype(jnp.float32).reshape(1, cout)

    grid = (n, h // th, width // tw)
    return pl.pallas_call(
        partial(_kernel, th=th, tw=tw, cin=cin, relu=relu),
        out_shape=jax.ShapeDtypeStruct((n, h, width, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # halo reads via DMA
            pl.BlockSpec(
                (9, cin, cout), lambda b, i, j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, cout), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, cout), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, tw + 2, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_pad, w_flat, scale_f, shift_f)


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
