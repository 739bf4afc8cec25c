"""On-device stochastic training augmentation with stateless jax.random.

Parity target: reference dataset.py:207-300 — the 8-stage train-time
pipeline (flips; live/dead-ratio-adaptive brightness & contrast; saturation;
random CLAHE; Gaussian noise; gamma LUT; sharpen; HSV color jitter).

The reference runs this per-image on the CPU with Python's `random`; here it
is a single jitted function of (key, image, mask), vmappable over the batch,
so augmentation rides the TPU's VPU and overlaps with the train step instead
of bottlenecking the host.  Exact random draws necessarily differ from
CPython's Mersenne Twister; each stage's *distribution* and arithmetic
(including uint8 truncation points) match the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from enhanced_unet_tpu.ops.preprocess import (
    _SHARPEN,
    _conv2d_same,
    _u8_round,
    _u8_trunc,
    clahe_dynamic,
    hsv_to_rgb_u8,
    lab_to_rgb_u8,
    rgb_to_hsv_u8,
    rgb_to_lab_u8,
)


def _split(key, n):
    return jax.random.split(key, n)


def augment_train(
    key: jax.Array,
    image: jnp.ndarray,
    semantic_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the full augmentation pipeline to one sample.

    image: [H,W,3] uint8-domain float32; semantic_mask: [H,W] int
    (0 bg / 1 live / 2 dead).  Returns (image, mask) same shapes/domains.
    """
    image = image.astype(jnp.float32)
    keys = _split(key, 16)

    # --- flips (dataset.py:209-222): applied to image AND mask -----------
    do_h = jax.random.uniform(keys[0]) > 0.5
    image = jnp.where(do_h, image[:, ::-1], image)
    semantic_mask = jnp.where(do_h, semantic_mask[:, ::-1], semantic_mask)
    do_v = jax.random.uniform(keys[1]) > 0.5
    image = jnp.where(do_v, image[::-1], image)
    semantic_mask = jnp.where(do_v, semantic_mask[::-1], semantic_mask)

    # --- live/dead ratio (dataset.py:229-236) -----------------------------
    live_px = jnp.sum(semantic_mask == 1)
    dead_px = jnp.sum(semantic_mask == 2)
    total = live_px + dead_px
    live_ratio = jnp.where(total > 0, live_px / jnp.maximum(total, 1), 0.5)

    # --- 1. brightness (dataset.py:242-249) --------------------------------
    u = jax.random.uniform(keys[2])
    lo = jnp.where(live_ratio > 0.6, 0.8, jnp.where(live_ratio < 0.4, 0.6, 0.7))
    hi = jnp.where(live_ratio > 0.6, 1.3, jnp.where(live_ratio < 0.4, 1.1, 1.3))
    alpha = lo + jax.random.uniform(keys[3]) * (hi - lo)
    image = jnp.where(u > 0.3, _u8_trunc(image * alpha), image)

    # --- 2. contrast shift (dataset.py:251-257) ----------------------------
    u = jax.random.uniform(keys[4])
    blo = jnp.where(live_ratio < 0.4, -20.0, -30.0)
    bhi = jnp.where(live_ratio < 0.4, 40.0, 30.0)
    beta = blo + jax.random.uniform(keys[5]) * (bhi - blo)
    image = jnp.where(u > 0.3, _u8_trunc(image + beta), image)

    # --- 3. saturation (dataset.py:259-264) --------------------------------
    u = jax.random.uniform(keys[6])
    sat = 0.8 + jax.random.uniform(keys[7]) * 0.5
    hsv = rgb_to_hsv_u8(image)
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * sat, 0, 255))
    # reference casts the float hsv back to uint8 (truncation) before
    # converting (dataset.py:264)
    sat_img = hsv_to_rgb_u8(jnp.floor(hsv))
    image = jnp.where(u > 0.5, sat_img, image)

    # --- 4. random CLAHE (dataset.py:266-272) -------------------------------
    u = jax.random.uniform(keys[8])
    clip_limit = 1.5 + jax.random.uniform(keys[9]) * 1.5
    h, w = image.shape[:2]
    tile_area = (h // 8) * (w // 8)
    clip = jnp.maximum(jnp.floor(clip_limit * tile_area / 256.0), 1).astype(jnp.int32)
    lab = rgb_to_lab_u8(image)
    l_enh = clahe_dynamic(lab[..., 0], clip)
    clahe_img = lab_to_rgb_u8(lab.at[..., 0].set(l_enh))
    image = jnp.where(u > 0.4, clahe_img, image)

    # --- 5. gaussian noise (dataset.py:274-277) -----------------------------
    u = jax.random.uniform(keys[10])
    sigma = 3.0 + jax.random.uniform(keys[11]) * 7.0
    noise = jax.random.normal(keys[12], image.shape) * sigma
    image = jnp.where(u > 0.5, _u8_trunc(image + noise), image)

    # --- 6. gamma LUT (dataset.py:279-284) ----------------------------------
    u = jax.random.uniform(keys[13])
    gamma = 0.7 + jax.random.uniform(keys[14]) * 0.6
    inv_gamma = 1.0 / gamma
    gamma_img = jnp.floor((image / 255.0) ** inv_gamma * 255.0)
    image = jnp.where(u > 0.5, gamma_img, image)

    # --- 7. sharpen (dataset.py:286-292) ------------------------------------
    k2 = _split(keys[15], 4)
    u = jax.random.uniform(k2[0])
    strength = 0.1 + jax.random.uniform(k2[1]) * 0.2
    sharp = _u8_trunc(_u8_round(_conv2d_same(image, _SHARPEN * strength)))
    image = jnp.where(u > 0.6, sharp, image)

    # --- 8. HSV color jitter (dataset.py:294-300) ----------------------------
    u = jax.random.uniform(k2[2])
    dh = -10.0 + jax.random.uniform(k2[3]) * 20.0
    dv = 0.9 + jax.random.uniform(jax.random.fold_in(k2[3], 1)) * 0.2
    hsv = rgb_to_hsv_u8(image)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + dh) % 180.0)
    hsv = hsv.at[..., 2].set(jnp.clip(hsv[..., 2] * dv, 0, 255))
    jit_img = hsv_to_rgb_u8(jnp.floor(hsv))
    image = jnp.where(u > 0.6, jit_img, image)

    return image, semantic_mask


augment_batch = jax.jit(jax.vmap(augment_train, in_axes=(0, 0, 0)))
"""Batched augmentation: (keys [B], images [B,H,W,3], masks [B,H,W])."""
