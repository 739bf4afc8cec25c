"""Probability -> semantic-mask conversion: the reference's ~10-rule
confidence heuristic, vectorized and jit-safe.

Parity target: reference train_eval.py:455-568 (_convert_probs_to_mask),
ported rule-for-rule.  The reference's two *data-dependent* density
re-threshold branches (`if live_pixel_ratio > 0.5`, the three
dead-ratio regimes) become scalar-predicate selects so the whole pass
stays inside jit (SURVEY §7 hard parts).  Golden tests compare against a
literal numpy restatement of the reference.

Input layout is [H, W, 3] (bg, live, dead) softmax probabilities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def convert_probs_to_mask(probs: jnp.ndarray) -> jnp.ndarray:
    """Apply the smart-threshold cascade; returns int32 [H, W] mask."""
    bg = probs[..., 0]
    live = probs[..., 1]
    dead = probs[..., 2]

    pred = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    max_prob = jnp.max(probs, axis=-1)

    # live low-confidence -> background (train_eval.py:478-482)
    live_low = (pred == 1) & ((live < 0.42) | (live <= bg * 1.15))
    pred = jnp.where(live_low, 0, pred)

    # dead low-confidence -> background (train_eval.py:486-492)
    dead_low = (pred == 2) & (
        (dead < 0.5) | (dead <= bg * 1.3) | (bg > 0.3) | (live > dead * 0.9)
    )
    pred = jnp.where(dead_low, 0, pred)

    # background reclaimed as live (train_eval.py:496-500)
    bg_high_live = (
        (pred == 0) & (live > 0.42) & (live > bg * 1.15) & (live > dead * 1.05)
    )
    pred = jnp.where(bg_high_live, 1, pred)

    # background reclaimed as dead (train_eval.py:503-509); evaluated after
    # the live reclaim so pred==0 already excludes those pixels, plus the
    # explicit ~bg_high_live guard
    bg_high_dead = (
        (pred == 0)
        & (dead > 0.5)
        & (dead > bg * 1.3)
        & (dead > live * 1.1)
        & (bg < 0.3)
        & (~bg_high_live)
    )
    pred = jnp.where(bg_high_dead, 2, pred)

    # class swaps (train_eval.py:515-520)
    live_to_dead = (pred == 1) & (dead > live * 1.15) & (dead > 0.45)
    pred = jnp.where(live_to_dead, 2, pred)
    dead_to_live = (pred == 2) & (live > dead * 1.15) & (live > 0.42)
    pred = jnp.where(dead_to_live, 1, pred)

    # noise floor (train_eval.py:523-524)
    pred = jnp.where(max_prob < 0.3, 0, pred)

    # --- density-adaptive re-thresholding (train_eval.py:527-563) ---------
    n_px = pred.shape[0] * pred.shape[1]
    live_ratio = jnp.sum(pred == 1) / n_px
    dead_ratio = jnp.sum(pred == 2) / n_px

    # live: if > 50% of the image, keep only high-confidence live pixels
    live_high = (live > 0.5) & (live > bg * 1.3) & (bg < 0.3)
    live_cut = (live_ratio > 0.5) & (pred == 1) & (~live_high)
    pred = jnp.where(live_cut, 0, pred)

    # dead: three severity regimes select increasingly strict thresholds
    thr = jnp.where(dead_ratio > 0.4, 0.65, jnp.where(dead_ratio > 0.25, 0.6, 0.55))
    mult = jnp.where(dead_ratio > 0.4, 1.6, jnp.where(dead_ratio > 0.25, 1.5, 1.4))
    bg_thr = jnp.where(dead_ratio > 0.4, 0.2, 0.25)
    live_guard = jnp.where(
        dead_ratio > 0.4,
        live < dead * 0.7,
        jnp.where(dead_ratio > 0.25, live < dead * 0.8, True),
    )
    dead_high = (dead > thr) & (dead > bg * mult) & (bg < bg_thr) & live_guard
    dead_cut = (dead_ratio > 0.15) & (pred == 2) & (~dead_high)
    pred = jnp.where(dead_cut, 0, pred)

    return pred
