"""Spatial partitioning with halo exchange — the CNN analogue of sequence
parallelism (SURVEY §2 parallelism table: "spatial-partition conv (halo
exchange over ICI)").

Images are sharded along H over Mesh('space'); stencil ops (3x3 convs,
2x2 pools) need one boundary row from each neighbour, exchanged with
jax.lax.ppermute (XLA lowers it to ICI sends on hardware).  This lets a
single oversized micrograph that exceeds one chip's HBM be convolved
in place, complementing the tile-based path (parallel/tiled.py) which
re-reads overlaps instead.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def halo_exchange(x_local: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad the local H-shard with `halo` rows from each neighbour.

    x_local: [H_local, W, C] (inside shard_map).  Boundary shards get
    zero rows on their outer edge (SAME-conv zero-padding semantics).
    Returns [H_local + 2*halo, W, C].
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

    zeros = jnp.zeros_like(top_rows)
    from_above = jnp.where(idx == 0, zeros, from_above)
    from_below = jnp.where(idx == n - 1, zeros, from_below)
    return jnp.concatenate([from_above, x_local, from_below], axis=0)


def make_spatial_conv3x3(mesh: Mesh, axis_name: str = "space"):
    """Build a jitted conv3x3(SAME) over an H-sharded image.

    Takes a GLOBAL [H, W, Cin] image (sharded or shardable on H) and HWIO
    weights; H must divide the mesh size.  Equivalent to the unsharded conv
    (tests/test_spatial.py pins this).
    """

    def conv_local(x_local, w):
        xh = halo_exchange(x_local, 1, axis_name)
        y = jax.lax.conv_general_dilated(
            xh[None],
            w,
            window_strides=(1, 1),
            padding=((0, 0), (1, 1)),  # H already haloed; SAME on W
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )[0]
        return y.astype(x_local.dtype)

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
