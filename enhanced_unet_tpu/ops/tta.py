"""Test-time augmentation inference.

Parity target: reference train_eval.py:397-453 (_run_model_single /
_run_tta_inference): identity + hflip + vflip + 0.75x + 1.25x multi-scale,
probabilities averaged.  Flips share one compiled program; each scale
compiles its own (3 programs total per input shape — static shapes are the
TPU constraint the reference never had).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from enhanced_unet_tpu.ops.resize import pad_to_multiple, resize_bilinear

ApplyFn = Callable[[jnp.ndarray], jnp.ndarray]
# ApplyFn: [1,H,W,3] float images -> [1,H,W,C] float32 logits


def run_model_single(apply_fn: ApplyFn, image: jnp.ndarray) -> jnp.ndarray:
    """Pad-to-32 -> forward -> softmax -> crop (train_eval.py:397-417).

    image: [H,W,3] in [0,1].  Returns [H,W,C] probabilities.
    """
    h, w = image.shape[:2]
    padded, (hp, wp) = pad_to_multiple(image[None], 32, mode="reflect")
    logits = apply_fn(padded)
    # shape guard kept from the reference (train_eval.py:411) — our models
    # emit input-resolution logits so this is a no-op resize
    if logits.shape[1:3] != padded.shape[1:3]:
        logits = resize_bilinear(logits, padded.shape[1:3])
    probs = jax.nn.softmax(logits[0].astype(jnp.float32), axis=-1)
    return probs[:h, :w]


def tta_probs(
    apply_fn: ApplyFn,
    image: jnp.ndarray,
    enable_tta: bool = True,
    scales: Tuple[float, ...] = (0.75, 1.25),
) -> jnp.ndarray:
    """Averaged TTA probabilities (train_eval.py:419-453).

    The same-shape trio (identity, hflip, vflip) runs as ONE batch-3
    forward — identical math to the reference's three sequential
    forwards, but it amortises per-op costs on TPU; the two rescaled
    forwards keep their own programs (static shapes)."""
    if not enable_tta:
        return run_model_single(apply_fn, image)
    h, w = image.shape[:2]

    trio = jnp.stack([image, image[:, ::-1], image[::-1]])  # [3,H,W,3]
    padded, _ = pad_to_multiple(trio, 32, mode="reflect")
    logits = apply_fn(padded)
    if logits.shape[1:3] != padded.shape[1:3]:
        logits = resize_bilinear(logits, padded.shape[1:3])
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, :h, :w]
    acc = [probs[0], probs[1][:, ::-1], probs[2][::-1]]

    # multi-scale: resize image, run, resize probs back
    for s in scales:
        sh, sw = int(h * s), int(w * s)
        scaled = resize_bilinear(image, (sh, sw))
        p = run_model_single(apply_fn, scaled)
        acc.append(resize_bilinear(p, (h, w)))

    return jnp.mean(jnp.stack(acc, axis=0), axis=0)


def tta_probs_batch(
    apply_fn: ApplyFn,
    images: jnp.ndarray,
    enable_tta: bool = True,
    scales: Tuple[float, ...] = (0.75, 1.25),
) -> jnp.ndarray:
    """Batched TTA: [B,H,W,3] -> [B,H,W,C] averaged probabilities.

    Identical math to per-image tta_probs (reference train_eval.py:419-453)
    but every view of every image rides one large MXU-friendly forward: the
    same-shape trio becomes a single [3B,...] batch, and each scale runs as
    one [B,...] batch — 3 compiled programs total regardless of B, versus
    the reference's 5 sequential batch-1 forwards per image.
    """
    b, h, w = images.shape[:3]

    if not enable_tta:
        padded, _ = pad_to_multiple(images, 32, mode="reflect")
        logits = apply_fn(padded)
        if logits.shape[1:3] != padded.shape[1:3]:
            logits = resize_bilinear(logits, padded.shape[1:3])
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, :h, :w]

    trio = jnp.concatenate([images, images[:, :, ::-1], images[:, ::-1]])
    padded, _ = pad_to_multiple(trio, 32, mode="reflect")
    logits = apply_fn(padded)
    if logits.shape[1:3] != padded.shape[1:3]:
        logits = resize_bilinear(logits, padded.shape[1:3])
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, :h, :w]
    acc = [probs[:b], probs[b : 2 * b][:, :, ::-1], probs[2 * b :][:, ::-1]]

    for s in scales:
        sh, sw = int(h * s), int(w * s)
        scaled = resize_bilinear(images, (sh, sw))
        padded, _ = pad_to_multiple(scaled, 32, mode="reflect")
        logits = apply_fn(padded)
        if logits.shape[1:3] != padded.shape[1:3]:
            logits = resize_bilinear(logits, padded.shape[1:3])
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, :sh, :sw]
        acc.append(resize_bilinear(p, (h, w)))

    return jnp.mean(jnp.stack(acc, axis=0), axis=0)
