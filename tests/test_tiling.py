"""Tiled inference tests: coverage, stitching consistency, shape handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhanced_unet_tpu.ops.tiling import (
    _tile_positions,
    hann_window_2d,
    tiled_inference,
)


class TestPositions:
    def test_exact_fit(self):
        assert _tile_positions(128, 64, 64) == [0, 64]

    def test_snap_last(self):
        assert _tile_positions(100, 64, 48) == [0, 36]

    def test_small_image(self):
        assert _tile_positions(32, 64, 48) == [0]

    def test_full_coverage(self):
        for size in (100, 128, 200, 511):
            pos = _tile_positions(size, 64, 48)
            covered = np.zeros(size, bool)
            for p in pos:
                covered[p : p + 64] = True
            assert covered.all(), size


def test_hann_window_properties():
    w = hann_window_2d(64)
    assert w.shape == (64, 64)
    assert w.min() >= 1e-3
    assert w.max() <= 1.0
    # symmetric
    np.testing.assert_allclose(w, w[::-1], atol=1e-6)
    np.testing.assert_allclose(w, w[:, ::-1], atol=1e-6)


def _linear_apply(tiles):
    """A shift-invariant 'model': logits = [x_mean, 1-x_mean, 0] pointwise.

    Shift invariance means tiling + blending must reproduce the whole-image
    result exactly (weighted average of identical values).
    """
    m = tiles.mean(axis=-1, keepdims=True)
    return jnp.concatenate([m, 1.0 - m, jnp.zeros_like(m)], axis=-1)


class TestTiledInference:
    def test_matches_whole_image_for_pointwise_model(self, rng):
        img = jnp.asarray(rng.random((100, 140, 3)), jnp.float32)
        probs = tiled_inference(_linear_apply, img, tile=64, overlap=16,
                                batch_size=4)
        whole = jax.nn.softmax(_linear_apply(img[None])[0], axis=-1)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(whole),
                                   atol=1e-5)

    def test_output_shape_and_normalization(self, rng):
        img = jnp.asarray(rng.random((90, 70, 3)), jnp.float32)
        probs = tiled_inference(_linear_apply, img, tile=64, overlap=32,
                                batch_size=3)
        assert probs.shape == (90, 70, 3)
        np.testing.assert_allclose(
            np.asarray(probs.sum(-1)), np.ones((90, 70)), atol=1e-5
        )

    def test_image_smaller_than_tile(self, rng):
        img = jnp.asarray(rng.random((40, 40, 3)), jnp.float32)
        probs = tiled_inference(_linear_apply, img, tile=64, overlap=16)
        assert probs.shape == (40, 40, 3)
        whole = jax.nn.softmax(_linear_apply(img[None])[0], axis=-1)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(whole),
                                   atol=1e-5)

    def test_overlap_must_be_less_than_tile(self, rng):
        img = jnp.zeros((64, 64, 3), jnp.float32)
        with pytest.raises(ValueError):
            tiled_inference(_linear_apply, img, tile=64, overlap=64)
