"""Fused, batched training losses.

Parity targets:
- FocalLoss            reference train_eval.py:28-60
- Trainer.dice_loss    reference train_eval.py:134-157
- Trainer.tversky_loss reference train_eval.py:159-181
- _compute_combined_loss          train_eval.py:183-197
- _apply_auxiliary_supervision    train_eval.py:199-234

The reference evaluates each loss per-sample on a batch of 1 inside a Python
loop (train_eval.py:262-335) and averages.  With uniform sample shapes that
is mathematically identical to one batched evaluation, so here the whole
bundle is a single jitted function over [B, H, W, C] logits: softmax and
one-hot are computed once and shared by all three losses, letting XLA fuse
the entire bundle into the backward pass.

Logits layout is NHWC (TPU-native), targets are [B, H, W] int class ids.
An optional `valid_mask` excludes padded pixels (static-shape batching);
with an all-ones mask the math reduces exactly to the reference's.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from enhanced_unet_tpu.config import LossConfig


def _one_hot(targets: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: Tuple[float, ...],
    gamma: float,
    class_weights: Tuple[float, ...],
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Class-weighted focal cross-entropy (train_eval.py:37-60).

    Keeps the reference's quirk that the CE term is *pre-weighted* before
    pt = exp(-ce): pt therefore depends on the class weight, exactly as
    F.cross_entropy(weight=..., reduction='none') produces.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = targets.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights, dtype=jnp.float32)
    a = jnp.asarray(alpha, dtype=jnp.float32)
    ce = w[tgt] * nll
    pt = jnp.exp(-ce)
    focal = a[tgt] * (1.0 - pt) ** gamma * ce
    if valid_mask is None:
        return jnp.mean(focal)
    m = valid_mask.astype(jnp.float32)
    return jnp.sum(focal * m) / jnp.maximum(jnp.sum(m), 1.0)


def _soft_overlap_terms(
    probs: jnp.ndarray,
    targets: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample per-class (tp, fp, fn) sums shared by Dice and Tversky.

    probs: [B, H, W, C] softmax; targets: [B, H, W].
    Returns [B, C] each.
    """
    num_classes = probs.shape[-1]
    onehot = _one_hot(targets, num_classes)
    if valid_mask is not None:
        m = valid_mask.astype(jnp.float32)[..., None]
        probs = probs * m
        onehot = onehot * m
    tp = jnp.sum(probs * onehot, axis=(1, 2))
    fp = jnp.sum(probs * (1.0 - onehot), axis=(1, 2))
    fn = jnp.sum((1.0 - probs) * onehot, axis=(1, 2))
    return tp, fp, fn


def dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Tuple[float, ...],
    eps: float = 1e-6,
    valid_mask: Optional[jnp.ndarray] = None,
    probs: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted soft Dice (train_eval.py:134-157): per-sample dice per class,
    weighted, mean over batch, mean over classes."""
    if probs is None:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    tp, fp, fn = _soft_overlap_terms(probs, targets, valid_mask)
    # reference: union = pred.sum + target.sum = (tp+fp) + (tp+fn)
    union = 2.0 * tp + fp + fn
    dice = (2.0 * tp + eps) / (union + eps)
    w = jnp.asarray(class_weights, dtype=jnp.float32)
    per_class = jnp.mean((1.0 - dice) * w[None, :], axis=0)  # mean over batch
    return jnp.mean(per_class)  # sum/len over classes


def tversky_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Tuple[float, ...],
    alpha: float = 0.7,
    eps: float = 1e-6,
    valid_mask: Optional[jnp.ndarray] = None,
    probs: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted Tversky (train_eval.py:159-181)."""
    if probs is None:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    tp, fp, fn = _soft_overlap_terms(probs, targets, valid_mask)
    tversky = (tp + eps) / (tp + alpha * fp + (1.0 - alpha) * fn + eps)
    w = jnp.asarray(class_weights, dtype=jnp.float32)
    per_class = jnp.mean((1.0 - tversky) * w[None, :], axis=0)
    return jnp.mean(per_class)


def combined_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: LossConfig,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """focal_w*focal + dice_w*dice + tversky_w*tversky
    (train_eval.py:183-197), with softmax computed once."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    f = focal_loss(
        logits, targets, cfg.focal_alpha, cfg.focal_gamma,
        cfg.ce_class_weights, valid_mask,
    )
    d = dice_loss(
        logits, targets, cfg.dice_class_weights, cfg.eps, valid_mask, probs=probs
    )
    t = tversky_loss(
        logits, targets, cfg.tversky_class_weights, cfg.tversky_alpha,
        cfg.eps, valid_mask, probs=probs,
    )
    return cfg.focal_weight * f + cfg.dice_weight * d + cfg.tversky_weight * t


def combined_loss_with_aux(
    logits: jnp.ndarray,
    aux_logits: Dict[str, jnp.ndarray],
    targets: jnp.ndarray,
    cfg: LossConfig,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Main combined loss + deep supervision on aux branches + MSE
    consistency between branch and fused probabilities
    (train_eval.py:199-234).

    Aux branch logits must already be at target resolution (the models emit
    full-resolution aux heads, so no interpolate step is needed here; the
    reference only interpolates as a shape guard, train_eval.py:218-224).
    """
    total = combined_loss(logits, targets, cfg, valid_mask)
    if not cfg.aux_branch_weights:
        return total

    fused_probs = None
    if cfg.consistency_weight > 0:
        fused_probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    for branch_name, weight in cfg.aux_branch_weights:
        branch = aux_logits.get(branch_name)
        if branch is None:
            continue
        total = total + weight * combined_loss(branch, targets, cfg, valid_mask)
        if fused_probs is not None:
            branch_probs = jax.nn.softmax(branch.astype(jnp.float32), axis=-1)
            consistency = jnp.mean((branch_probs - fused_probs) ** 2)
            total = total + weight * cfg.consistency_weight * consistency
    return total
