"""TTA inference tests (reference train_eval.py:397-453)."""

import jax
import jax.numpy as jnp
import numpy as np

from enhanced_unet_tpu.ops.tta import run_model_single, tta_probs


def _mean_model(x):
    """Pointwise 'model': logits from per-pixel mean — flip-equivariant."""
    m = x.mean(axis=-1, keepdims=True)
    return jnp.concatenate([m, 1.0 - m, m * 0.5], axis=-1)


def _asymmetric_model(x):
    """Positionally-biased model: TTA must change its output."""
    h = x.shape[1]
    bias = jnp.linspace(0.0, 1.0, h).reshape(1, h, 1, 1)
    m = x.mean(axis=-1, keepdims=True) + bias
    return jnp.concatenate([m, 1.0 - m, m * 0.0], axis=-1)


def test_single_runs_and_crops(rng):
    img = jnp.asarray(rng.random((30, 45, 3)), jnp.float32)  # pads to 32x64
    probs = run_model_single(_mean_model, img)
    assert probs.shape == (30, 45, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_tta_equals_single_for_equivariant_model(rng):
    """For a pointwise flip-equivariant model, every TTA view agrees, so
    the average equals the single forward."""
    img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    single = run_model_single(_mean_model, img)
    tta = tta_probs(_mean_model, img, enable_tta=True, scales=())
    np.testing.assert_allclose(np.asarray(tta), np.asarray(single), atol=1e-5)


def test_tta_differs_for_asymmetric_model(rng):
    img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    single = run_model_single(_asymmetric_model, img)
    tta = tta_probs(_asymmetric_model, img, enable_tta=True, scales=())
    assert np.abs(np.asarray(tta) - np.asarray(single)).max() > 1e-3


def test_tta_disabled_is_single(rng):
    img = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
    a = tta_probs(_asymmetric_model, img, enable_tta=False)
    b = run_model_single(_asymmetric_model, img)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multiscale_runs(rng):
    img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    tta = tta_probs(_mean_model, img, enable_tta=True, scales=(0.75, 1.25))
    assert tta.shape == (64, 64, 3)
    np.testing.assert_allclose(np.asarray(tta.sum(-1)), 1.0, atol=1e-4)


def test_tta_batch_matches_per_image(rng):
    """tta_probs_batch == per-image tta_probs for each batch element."""
    from enhanced_unet_tpu.ops.tta import tta_probs_batch

    imgs = jnp.asarray(rng.random((3, 64, 64, 3)), jnp.float32)
    batched = tta_probs_batch(
        _asymmetric_model, imgs, enable_tta=True, scales=(0.75, 1.25))
    assert batched.shape == (3, 64, 64, 3)
    for i in range(3):
        single = tta_probs(
            _asymmetric_model, imgs[i], enable_tta=True, scales=(0.75, 1.25))
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), atol=1e-5)


def test_tta_batch_disabled_matches_per_image(rng):
    from enhanced_unet_tpu.ops.tta import tta_probs_batch

    imgs = jnp.asarray(rng.random((2, 30, 45, 3)), jnp.float32)
    batched = tta_probs_batch(_asymmetric_model, imgs, enable_tta=False)
    for i in range(2):
        single = run_model_single(_asymmetric_model, imgs[i])
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), atol=1e-6)
