"""Multi-chip tiled inference: the tile batch sharded over Mesh('data').

Full-resolution micrographs produce dozens-to-hundreds of tiles
(ops/tiling.py); tiles are embarrassingly parallel, so sharding the tile
batch across chips scales inference nearly linearly over ICI (SURVEY §5
"long-context" plan: static tile grid -> sharded per-tile forward ->
overlap-blend accumulation).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from enhanced_unet_tpu.ops.tiling import _tile_positions, hann_window_2d


def tiled_inference_sharded(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    mesh: Mesh,
    tile: int = 512,
    overlap: int = 64,
    num_classes: int = 3,
    axis_name: str = "data",
) -> jnp.ndarray:
    """Full-res probabilities [H, W, C]; per-tile forwards sharded over the
    mesh, Hann-blended accumulation on the host (tiny vs the forwards)."""
    h, w = int(image.shape[0]), int(image.shape[1])
    stride = tile - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than tile")
    n_dev = mesh.devices.size

    pad_h = max(tile - h, 0)
    pad_w = max(tile - w, 0)
    if pad_h or pad_w:
        image = jnp.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    ph, pw = h + pad_h, w + pad_w

    positions = [
        (y, x)
        for y in _tile_positions(ph, tile, stride)
        for x in _tile_positions(pw, tile, stride)
    ]
    n = len(positions)
    n_pad = (-n) % n_dev

    tiles = np.stack(
        [np.asarray(image[y : y + tile, x : x + tile]) for (y, x) in positions]
    )
    if n_pad:
        tiles = np.concatenate(
            [tiles, np.zeros((n_pad, tile, tile, 3), tiles.dtype)]
        )

    sharding = NamedSharding(mesh, P(axis_name))
    tiles_d = jax.device_put(jnp.asarray(tiles), sharding)

    @jax.jit
    def fwd(tiles):
        logits = apply_fn(tiles)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    probs = np.asarray(fwd(tiles_d))[:n]

    window = hann_window_2d(tile)[..., None]
    acc = np.zeros((ph, pw, num_classes), np.float32)
    wacc = np.zeros((ph, pw, 1), np.float32)
    for i, (y, x) in enumerate(positions):
        acc[y : y + tile, x : x + tile] += probs[i] * window
        wacc[y : y + tile, x : x + tile] += window
    return jnp.asarray((acc / np.maximum(wacc, 1e-8))[:h, :w])
