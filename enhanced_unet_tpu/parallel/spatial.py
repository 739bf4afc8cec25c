"""Spatial partitioning with halo exchange — the CNN analogue of sequence
parallelism (SURVEY §2 parallelism table: "spatial-partition conv (halo
exchange over ICI)").

Images are sharded along H over Mesh('space'); stencil ops (3x3 convs,
2x2 pools, bilinear 2x upsampling) need boundary rows from their
neighbours, exchanged with jax.lax.ppermute (XLA lowers it to ICI sends
on hardware).  This lets a single oversized micrograph that exceeds one
chip's HBM be processed in place, complementing the tile-based path
(parallel/tiled.py) which re-reads overlaps instead.

Three levels of API:
- `make_spatial_conv3x3` — one halo-exchanged conv (the minimal demo).
- `make_spatial_basic_unet` — a WHOLE BasicUNet inference forward
  (encoder double-convs + pools, bilinear-up + skip-concat decoder, 1x1
  head) running end-to-end on H-shards with halo exchange at every
  stencil, consuming the standard `BasicUNet` checkpoint tree unchanged.
  Equivalence vs the unsharded model is pinned by tests/test_spatial.py
  on an 8-virtual-device CPU mesh.
- `make_spatial_apply` — GSPMD spatial partitioning for ANY zoo model,
  including the flagship EnhancedUNet: the input batch is annotated
  H-sharded and XLA's SPMD partitioner derives every halo exchange
  (convs/pools), switches to gathered compute where maps get small
  (ASPP at stride 16), and reshards for the decoder — the scaling-book
  recipe (annotate, let XLA insert collectives) applied spatially.  The
  hand-rolled BasicUNet path above documents explicitly what XLA
  synthesizes here.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def halo_exchange(
    x_local: jnp.ndarray, halo: int, axis_name: str, mode: str = "zero"
) -> jnp.ndarray:
    """Pad the local H-shard with `halo` rows from each neighbour.

    x_local: [H_local, W, C] (inside shard_map).  Boundary shards get
    `mode` rows on their outer edge: "zero" (SAME-conv zero padding) or
    "edge" (row replication — what bilinear resize's coordinate clamping
    sees).  Returns [H_local + 2*halo, W, C].
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_rows = x_local[:halo]        # my top rows -> previous neighbour
    bottom_rows = x_local[-halo:]    # my bottom rows -> next neighbour

    # receive the row block ABOVE me: neighbour (idx-1)'s bottom rows
    from_above = jax.lax.ppermute(
        bottom_rows, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # receive the row block BELOW me: neighbour (idx+1)'s top rows
    from_below = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )

    if mode == "edge":
        edge_top = jnp.broadcast_to(x_local[:1], from_above.shape)
        edge_bot = jnp.broadcast_to(x_local[-1:], from_below.shape)
        from_above = jnp.where(idx == 0, edge_top, from_above)
        from_below = jnp.where(idx == n - 1, edge_bot, from_below)
    else:
        zeros = jnp.zeros_like(top_rows)
        from_above = jnp.where(idx == 0, zeros, from_above)
        from_below = jnp.where(idx == n - 1, zeros, from_below)
    return jnp.concatenate([from_above, x_local, from_below], axis=0)


def _conv_local(x_local, w, axis_name, bias=None):
    """3x3 SAME conv over an H-shard (halo 1, zero edges)."""
    xh = halo_exchange(x_local, 1, axis_name)
    y = jax.lax.conv_general_dilated(
        xh[None], w,
        window_strides=(1, 1),
        padding=((0, 0), (1, 1)),  # H already haloed; SAME on W
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )[0]
    if bias is not None:
        y = y + bias
    return y


def make_spatial_conv3x3(mesh: Mesh, axis_name: str = "space"):
    """Build a jitted conv3x3(SAME) over an H-sharded image.

    Takes a GLOBAL [H, W, Cin] image (sharded or shardable on H) and HWIO
    weights; H must divide the mesh size.  Equivalent to the unsharded conv
    (tests/test_spatial.py pins this).
    """

    def conv_local(x_local, w):
        return _conv_local(x_local, w, axis_name).astype(x_local.dtype)

    sharded = shard_map(
        conv_local,
        mesh=mesh,
        in_specs=(P(axis_name, None, None), P()),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_image_h(image: jnp.ndarray, mesh: Mesh, axis_name: str = "space"):
    """Place a [H, W, C] image H-sharded over the mesh."""
    return jax.device_put(image, NamedSharding(mesh, P(axis_name, None, None)))


# ---------------------------------------------------------------------------
# whole-model spatially-partitioned BasicUNet inference
# ---------------------------------------------------------------------------

def _pool2x2_local(x):
    """2x2 max pool on an H-shard — purely local when H_local is even."""
    h, w, c = x.shape
    xr = x.reshape(h // 2, 2, w // 2, 2, c)
    return xr.max(axis=(1, 3))


def _up2x_bilinear_h(x_local, axis_name):
    """H-dimension half of bilinear 2x (align_corners=False): output row
    2i = 0.25*in[i-1] + 0.75*in[i]; 2i+1 = 0.75*in[i] + 0.25*in[i+1],
    with edge clamping — neighbours provide in[i-1]/in[i+1] across shard
    boundaries (halo mode 'edge')."""
    xh = halo_exchange(x_local, 1, axis_name, mode="edge")
    a, b, c = xh[:-2], xh[1:-1], xh[2:]
    even = 0.25 * a + 0.75 * b
    odd = 0.75 * b + 0.25 * c
    out = jnp.stack([even, odd], axis=1)  # [H, 2, W, C]
    return out.reshape(2 * x_local.shape[0], *x_local.shape[1:])


def _up2x_bilinear_w(x):
    """W-dimension half of bilinear 2x (local: full W on every shard)."""
    xw = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="edge")
    a, b, c = xw[:, :-2], xw[:, 1:-1], xw[:, 2:]
    even = 0.25 * a + 0.75 * b
    odd = 0.75 * b + 0.25 * c
    out = jnp.stack([even, odd], axis=2)  # [H, W, 2, C]
    return out.reshape(x.shape[0], 2 * x.shape[1], x.shape[2])


def _convbnact_local(x, tree, stats, axis_name, eps=1e-5):
    """Eval-mode ConvBNAct on an H-shard: conv3x3 + folded BN + relu."""
    k = tree["Conv_0"]["kernel"].astype(jnp.float32)
    bn, bs = tree["BatchNorm_0"], stats["BatchNorm_0"]
    scale = bn["scale"] * jax.lax.rsqrt(bs["var"] + eps)
    bias = bn["bias"] - bs["mean"] * scale
    y = _conv_local(x.astype(jnp.float32), k, axis_name)
    return jax.nn.relu(y * scale + bias)


def _doubleconv_local(x, tree, stats, axis_name):
    y = _convbnact_local(x, tree["ConvBNAct_0"], stats["ConvBNAct_0"],
                         axis_name)
    return _convbnact_local(y, tree["ConvBNAct_1"], stats["ConvBNAct_1"],
                            axis_name)


def make_spatial_basic_unet(mesh: Mesh, axis_name: str = "space"):
    """Whole-model spatially-partitioned BasicUNet inference.

    Returns a jitted `fn(variables, image) -> logits` where `variables` is
    the standard `BasicUNet` checkpoint ({'params', 'batch_stats'}) and
    `image` a single [H, W, 3] micrograph; H/n_devices must be divisible
    by 8 (three 2x pools).  Every 3x3 conv halo-exchanges one row, every
    decoder bilinear-up halo-exchanges one row with edge clamping; pools
    and concats are local.  Output matches
    `BasicUNet(dtype=float32).apply(variables, image[None], train=False)`
    (tests/test_spatial.py).
    """

    def fwd_local(variables, x_local):
        params = variables["params"]
        stats = variables["batch_stats"]

        def dc(x, name):
            return _doubleconv_local(x, params[name], stats[name], axis_name)

        def upconcat(below, skip, name):
            up = _up2x_bilinear_w(_up2x_bilinear_h(below, axis_name))
            y = jnp.concatenate([up, skip.astype(up.dtype)], axis=-1)
            return _doubleconv_local(
                y, params[name]["DoubleConv_0"], stats[name]["DoubleConv_0"],
                axis_name)

        e1 = dc(x_local.astype(jnp.float32), "DoubleConv_0")
        e2 = dc(_pool2x2_local(e1), "DoubleConv_1")
        e3 = dc(_pool2x2_local(e2), "DoubleConv_2")
        e4 = dc(_pool2x2_local(e3), "DoubleConv_3")

        d4 = upconcat(e4, e3, "UpConcatBlock_0")
        d3 = upconcat(d4, e2, "UpConcatBlock_1")
        d2 = upconcat(d3, e1, "UpConcatBlock_2")

        head = params["Conv_0"]
        logits = jnp.einsum("hwc,co->hwo", d2,
                            head["kernel"][0, 0].astype(jnp.float32))
        return logits + head["bias"]

    sharded = shard_map(
        fwd_local,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None, None)),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# GSPMD spatial partitioning: any model, XLA-derived halos
# ---------------------------------------------------------------------------

def make_spatial_apply(model, mesh: Mesh, axis_name: str = "space"):
    """Spatially-partitioned inference for any zoo model (incl. the
    flagship) as one GSPMD program.

    Returns `fn(variables, x_nhwc) -> logits` with the batch H-sharded over
    `axis_name`; params replicated.  XLA's SPMD partitioner inserts the
    halo exchanges for every stencil op, turns global pools (SE/scSE/ASPP
    image pooling) into cross-shard reductions, and re-gathers where maps
    are smaller than the mesh — no per-model halo code.  H must divide the
    mesh size times the model's total stride.  Output is H-sharded; fetch
    or `device_get` assembles it.
    """
    x_sh = NamedSharding(mesh, P(None, axis_name, None, None))

    @jax.jit
    def fwd(variables, x):
        x = jax.lax.with_sharding_constraint(x, x_sh)
        out = model.apply(variables, x, train=False)
        out = out[0] if isinstance(out, tuple) else out
        return jax.lax.with_sharding_constraint(out, x_sh)

    return fwd
