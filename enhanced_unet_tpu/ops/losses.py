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
per-class masks are computed once and shared by all three losses, letting
XLA fuse the entire bundle into the backward pass.

TPU layout note: the public API takes NHWC logits, but internally every
loss runs CHANNEL-FIRST on [B, C, H*W] planes.  A [B, 512, 512, 3] fp32
tensor lane-pads 3 -> 128 (42x) on TPU, and the round-1 formulation's
elementwise/gather/reduce passes over such tensors cost ~93 ms of a 385 ms
train step (three identical 31 ms loss fusions, benchmarks/op_trace.py
train).  One moveaxis per branch converts to dense [B, P]-plane math;
class gathers (w[tgt], a[tgt], one-hot) become sums over C static
per-class masks (C=3).

An optional `valid_mask` excludes padded pixels (static-shape batching);
with an all-ones mask the math reduces exactly to the reference's.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from enhanced_unet_tpu.config import LossConfig


def _to_cf(logits: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> channel-first [B, C, P] fp32 (P = H*W)."""
    b, h, w, c = logits.shape
    return jnp.moveaxis(logits.astype(jnp.float32), -1, 1).reshape(b, c, h * w)


def _flat(x: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """[B, H, W] -> [B, P]."""
    if x is None:
        return None
    return x.reshape(x.shape[0], -1)


def _class_masks(tgt: jnp.ndarray, num_classes: int):
    """Per-class {0,1} masks [C x (B, P)] — the channel-first substitute
    for one_hot/gather on tiny-C tensors."""
    return [(tgt == c).astype(jnp.float32) for c in range(num_classes)]


def _log_softmax_cf(logits_cf: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(logits_cf, axis=1)


def _focal_cf(
    logp: jnp.ndarray,
    masks,
    alpha: Tuple[float, ...],
    gamma: float,
    class_weights: Tuple[float, ...],
    valid: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Class-weighted focal cross-entropy (train_eval.py:37-60).

    Keeps the reference's quirk that the CE term is *pre-weighted* before
    pt = exp(-ce): pt therefore depends on the class weight, exactly as
    F.cross_entropy(weight=..., reduction='none') produces.
    """
    c = logp.shape[1]
    nll = sum(-logp[:, i] * masks[i] for i in range(c))        # [B, P]
    wmap = sum(class_weights[i] * masks[i] for i in range(c))
    amap = sum(alpha[i] * masks[i] for i in range(c))
    ce = wmap * nll
    pt = jnp.exp(-ce)
    focal = amap * (1.0 - pt) ** gamma * ce
    if valid is None:
        return jnp.mean(focal)
    return jnp.sum(focal * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def _overlap_terms_cf(probs_cf, masks, valid):
    """Per-sample per-class (tp, fp, fn) sums shared by Dice and Tversky.
    Returns [B, C] each."""
    c = probs_cf.shape[1]
    tps, fps, fns = [], [], []
    for i in range(c):
        p = probs_cf[:, i]
        m = masks[i]
        if valid is not None:
            p = p * valid
            m = m * valid
        pm = jnp.sum(p * m, axis=1)
        tps.append(pm)
        fps.append(jnp.sum(p, axis=1) - pm)           # p*(1-m)
        fns.append(jnp.sum(m, axis=1) - pm)           # (1-p)*m
    return (jnp.stack(tps, 1), jnp.stack(fps, 1), jnp.stack(fns, 1))


def _dice_from_terms(tp, fp, fn, class_weights, eps):
    """Weighted soft Dice (train_eval.py:134-157): per-sample dice per
    class, weighted, mean over batch, mean over classes."""
    # reference: union = pred.sum + target.sum = (tp+fp) + (tp+fn)
    union = 2.0 * tp + fp + fn
    dice = (2.0 * tp + eps) / (union + eps)
    w = jnp.asarray(class_weights, dtype=jnp.float32)
    per_class = jnp.mean((1.0 - dice) * w[None, :], axis=0)  # mean over batch
    return jnp.mean(per_class)  # sum/len over classes


def _tversky_from_terms(tp, fp, fn, class_weights, alpha, eps):
    """Weighted Tversky (train_eval.py:159-181)."""
    tversky = (tp + eps) / (tp + alpha * fp + (1.0 - alpha) * fn + eps)
    w = jnp.asarray(class_weights, dtype=jnp.float32)
    per_class = jnp.mean((1.0 - tversky) * w[None, :], axis=0)
    return jnp.mean(per_class)


# ---------------------------------------------------------------------------
# public API (NHWC logits, [B,H,W] int targets) — unchanged signatures
# ---------------------------------------------------------------------------

def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: Tuple[float, ...],
    gamma: float,
    class_weights: Tuple[float, ...],
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    lcf = _to_cf(logits)
    tgt = _flat(targets.astype(jnp.int32))
    masks = _class_masks(tgt, lcf.shape[1])
    valid = None if valid_mask is None else _flat(valid_mask).astype(jnp.float32)
    return _focal_cf(_log_softmax_cf(lcf), masks, alpha, gamma,
                     class_weights, valid)


def dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Tuple[float, ...],
    eps: float = 1e-6,
    valid_mask: Optional[jnp.ndarray] = None,
    probs: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """probs, when given, must be NHWC softmax of the logits (shared
    between dice and tversky by combined_loss)."""
    pcf = _to_cf(probs) if probs is not None else jax.nn.softmax(
        _to_cf(logits), axis=1)
    tgt = _flat(targets.astype(jnp.int32))
    masks = _class_masks(tgt, pcf.shape[1])
    valid = None if valid_mask is None else _flat(valid_mask).astype(jnp.float32)
    tp, fp, fn = _overlap_terms_cf(pcf, masks, valid)
    return _dice_from_terms(tp, fp, fn, class_weights, eps)


def tversky_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Tuple[float, ...],
    alpha: float = 0.7,
    eps: float = 1e-6,
    valid_mask: Optional[jnp.ndarray] = None,
    probs: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    pcf = _to_cf(probs) if probs is not None else jax.nn.softmax(
        _to_cf(logits), axis=1)
    tgt = _flat(targets.astype(jnp.int32))
    masks = _class_masks(tgt, pcf.shape[1])
    valid = None if valid_mask is None else _flat(valid_mask).astype(jnp.float32)
    tp, fp, fn = _overlap_terms_cf(pcf, masks, valid)
    return _tversky_from_terms(tp, fp, fn, class_weights, alpha, eps)


def combined_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: LossConfig,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """focal_w*focal + dice_w*dice + tversky_w*tversky
    (train_eval.py:183-197), with one layout conversion and one softmax
    shared by all three losses."""
    return _combined_loss_cf(_to_cf(logits), targets, cfg, valid_mask)


def _combined_loss_cf(lcf, targets, cfg, valid_mask):
    tgt = _flat(targets.astype(jnp.int32))
    masks = _class_masks(tgt, lcf.shape[1])
    valid = None if valid_mask is None else _flat(valid_mask).astype(jnp.float32)
    logp = _log_softmax_cf(lcf)
    probs = jnp.exp(logp)
    f = _focal_cf(logp, masks, cfg.focal_alpha, cfg.focal_gamma,
                  cfg.ce_class_weights, valid)
    tp, fp, fn = _overlap_terms_cf(probs, masks, valid)
    d = _dice_from_terms(tp, fp, fn, cfg.dice_class_weights, cfg.eps)
    t = _tversky_from_terms(tp, fp, fn, cfg.tversky_class_weights,
                            cfg.tversky_alpha, cfg.eps)
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
    lcf = _to_cf(logits)
    total = _combined_loss_cf(lcf, targets, cfg, valid_mask)
    if not cfg.aux_branch_weights:
        return total

    fused_probs = None
    if cfg.consistency_weight > 0:
        fused_probs = jax.nn.softmax(lcf, axis=1)

    for branch_name, weight in cfg.aux_branch_weights:
        branch = aux_logits.get(branch_name)
        if branch is None:
            continue
        bcf = _to_cf(branch)
        total = total + weight * _combined_loss_cf(bcf, targets, cfg,
                                                   valid_mask)
        if fused_probs is not None:
            branch_probs = jax.nn.softmax(bcf, axis=1)
            consistency = jnp.mean((branch_probs - fused_probs) ** 2)
            total = total + weight * cfg.consistency_weight * consistency
    return total
