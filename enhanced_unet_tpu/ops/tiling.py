"""Sliding-window tiled inference with overlap-blend stitching.

This is the framework's "long-context" subsystem (SURVEY §5, BASELINE.json
config 4): the reference handles large micrographs by *downscaling* to
max_size=640 (dataset.py:143-158); on TPU we instead segment at FULL
resolution by running a static tile grid through the model and blending
overlapping predictions with a Hann window.

TPU design:
- the tile grid is static given the image shape -> one compiled program per
  resolution, tiles batched through the MXU at a fixed batch size;
- accumulation is static-slice scatter-adds, fully fused by XLA;
- multi-chip: batched tiles can be sharded over Mesh('data') with
  shard_map (tile batches are embarrassingly parallel) — see
  parallel.data_parallel for the pattern.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _tile_positions(size: int, tile: int, stride: int) -> List[int]:
    """Start offsets covering [0, size) with the last tile snapped to the
    edge (so every pixel is covered exactly, no partial tiles)."""
    if size <= tile:
        return [0]
    pos = list(range(0, size - tile + 1, stride))
    if pos[-1] != size - tile:
        pos.append(size - tile)
    return pos


def hann_window_2d(tile: int, eps: float = 1e-3) -> np.ndarray:
    """Separable 2D Hann blending window, floored at eps so edge pixels of
    edge tiles still receive weight."""
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * (np.arange(tile) + 0.5) / tile)
    w2 = np.outer(w, w)
    return np.maximum(w2, eps).astype(np.float32)


def tiled_inference(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    tile: int = 512,
    overlap: int = 64,
    batch_size: int = 8,
    num_classes: int = 3,
    use_window: bool = True,
) -> jnp.ndarray:
    """Full-resolution probabilities [H, W, C] for an arbitrary-size image.

    apply_fn: [B, tile, tile, 3] -> [B, tile, tile, C] logits (jit-safe).
    The whole function is jit-compiled per image resolution.
    """
    h, w = int(image.shape[0]), int(image.shape[1])
    stride = tile - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than tile")

    # pad small images up to one tile (reflect, like the /32 snap pads)
    pad_h = max(tile - h, 0)
    pad_w = max(tile - w, 0)
    if pad_h or pad_w:
        image = jnp.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    ph, pw = h + pad_h, w + pad_w

    ys = _tile_positions(ph, tile, stride)
    xs = _tile_positions(pw, tile, stride)
    positions = [(y, x) for y in ys for x in xs]

    window = (
        jnp.asarray(hann_window_2d(tile)) if use_window
        else jnp.ones((tile, tile), jnp.float32)
    )

    @jax.jit
    def run(image):
        tiles = jnp.stack(
            [image[y : y + tile, x : x + tile] for (y, x) in positions]
        )
        n = tiles.shape[0]
        # fixed-size batches (pad the last) so one forward program serves all
        n_pad = (-n) % batch_size
        if n_pad:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((n_pad, tile, tile, 3), tiles.dtype)]
            )
        probs_chunks = []
        for s in range(0, tiles.shape[0], batch_size):
            logits = apply_fn(tiles[s : s + batch_size])
            probs_chunks.append(
                jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            )
        probs = jnp.concatenate(probs_chunks)[:n]

        acc = jnp.zeros((ph, pw, num_classes), jnp.float32)
        wacc = jnp.zeros((ph, pw, 1), jnp.float32)
        for i, (y, x) in enumerate(positions):
            acc = acc.at[y : y + tile, x : x + tile].add(
                probs[i] * window[..., None]
            )
            wacc = wacc.at[y : y + tile, x : x + tile].add(window[..., None])
        return (acc / jnp.maximum(wacc, 1e-8))[:h, :w]

    return run(image)


def tiled_semantic_mask(
    apply_fn,
    image: jnp.ndarray,
    tile: int = 512,
    overlap: int = 64,
    batch_size: int = 8,
) -> jnp.ndarray:
    """Full-res semantic mask via tiling + the reference threshold cascade."""
    from enhanced_unet_tpu.ops.thresholding import convert_probs_to_mask

    probs = tiled_inference(
        apply_fn, image, tile=tile, overlap=overlap, batch_size=batch_size
    )
    return convert_probs_to_mask(probs)
