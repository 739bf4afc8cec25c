"""Golden tests for the probability->mask cascade vs a literal numpy
restatement of reference train_eval.py:455-568."""

import numpy as np
import pytest

import jax.numpy as jnp

from enhanced_unet_tpu.ops.thresholding import convert_probs_to_mask


def _oracle(probs_hwc: np.ndarray) -> np.ndarray:
    """Literal numpy port of the reference's rule sequence (oracle)."""
    bg, live, dead = probs_hwc[..., 0], probs_hwc[..., 1], probs_hwc[..., 2]
    pred = np.argmax(probs_hwc, axis=-1).astype(np.int64)
    max_prob = probs_hwc.max(axis=-1)
    h, w = pred.shape

    live_low = (pred == 1) & ((live < 0.42) | (live <= bg * 1.15))
    pred[live_low] = 0
    dead_low = (pred == 2) & (
        (dead < 0.5) | (dead <= bg * 1.3) | (bg > 0.3) | (live > dead * 0.9)
    )
    pred[dead_low] = 0
    bg_high_live = (pred == 0) & (live > 0.42) & (live > bg * 1.15) & (live > dead * 1.05)
    pred[bg_high_live] = 1
    bg_high_dead = (
        (pred == 0)
        & (dead > 0.5)
        & (dead > bg * 1.3)
        & (dead > live * 1.1)
        & (bg < 0.3)
        & (~bg_high_live)
    )
    pred[bg_high_dead] = 2
    l2d = (pred == 1) & (dead > live * 1.15) & (dead > 0.45)
    pred[l2d] = 2
    d2l = (pred == 2) & (live > dead * 1.15) & (live > 0.42)
    pred[d2l] = 1
    pred[max_prob < 0.3] = 0

    live_ratio = (pred == 1).sum() / (h * w)
    dead_ratio = (pred == 2).sum() / (h * w)
    if live_ratio > 0.5:
        lm = pred == 1
        high = (live > 0.5) & (live > bg * 1.3) & (bg < 0.3)
        pred[lm & ~high] = 0
    if dead_ratio > 0.15:
        dm = pred == 2
        if dead_ratio > 0.4:
            high = (dead > 0.65) & (dead > bg * 1.6) & (bg < 0.2) & (live < dead * 0.7)
        elif dead_ratio > 0.25:
            high = (dead > 0.6) & (dead > bg * 1.5) & (bg < 0.25) & (live < dead * 0.8)
        else:
            high = (dead > 0.55) & (dead > bg * 1.4) & (bg < 0.25)
        pred[dm & ~high] = 0
    return pred


def _rand_probs(rng, h=32, w=32, bias=None):
    logits = rng.normal(size=(h, w, 3))
    if bias is not None:
        logits = logits + np.asarray(bias)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True)).astype(np.float32)


BIASES = [
    None,            # balanced
    (2.0, 0, 0),     # bg-dominant
    (0, 2.5, 0),     # live-dominant (triggers live density filter)
    (0, 0, 2.5),     # dead-dominant (regime >0.4)
    (0, 0, 1.2),     # dead moderate (regime 0.25-0.4)
    (0, 0, 0.7),     # dead mild (regime 0.15-0.25)
    (0, 1.5, 1.5),   # live/dead contested (swap rules)
]


@pytest.mark.parametrize("bias", BIASES)
def test_matches_oracle(bias):
    rng = np.random.default_rng(42)
    for _ in range(3):
        probs = _rand_probs(rng, bias=bias)
        expected = _oracle(probs.copy())
        ours = np.asarray(convert_probs_to_mask(jnp.asarray(probs)))
        np.testing.assert_array_equal(ours, expected)


def test_confident_prediction_passes_through():
    h = w = 16
    probs = np.zeros((h, w, 3), np.float32)
    probs[..., 0] = 0.9
    probs[:4, :4] = (0.05, 0.9, 0.05)   # confident live patch
    probs[8:10, 8:10] = (0.05, 0.05, 0.9)  # confident dead patch
    out = np.asarray(convert_probs_to_mask(jnp.asarray(probs)))
    assert (out[:4, :4] == 1).all()
    assert (out[8:10, 8:10] == 2).all()
    assert (out[12:, 12:] == 0).all()


def test_low_confidence_zeroed():
    probs = np.full((8, 8, 3), 1 / 3, np.float32)  # max prob < 0.42
    out = np.asarray(convert_probs_to_mask(jnp.asarray(probs)))
    assert (out == 0).all()
