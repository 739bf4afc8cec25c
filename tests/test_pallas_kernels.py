"""Pallas kernel correctness vs jnp references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhanced_unet_tpu.ops.pallas.conv_fused import (

    fold_bn_params,
    fused_conv3x3_bn_relu,
    fused_conv3x3_bn_relu_reference,
)

pytestmark = pytest.mark.slow  # compile-heavy lane (see pyproject.toml)


@pytest.mark.parametrize("cin,cout", [(8, 16), (16, 8)])
def test_fused_conv_matches_reference(rng, cin, cout):
    x = jnp.asarray(rng.normal(size=(2, 16, 128, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.5 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    expected = fused_conv3x3_bn_relu_reference(x, w, scale, shift)
    got = fused_conv3x3_bn_relu(x, w, scale, shift, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_fused_conv_no_relu(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 128, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32)
    scale = jnp.ones((8,), jnp.float32)
    shift = jnp.zeros((8,), jnp.float32)
    expected = fused_conv3x3_bn_relu_reference(x, w, scale, shift, relu=False)
    got = fused_conv3x3_bn_relu(x, w, scale, shift, relu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)
    assert (np.asarray(got) < 0).any()  # relu really off


def test_bn_folding_math(rng):
    """Folded (scale, shift) must reproduce full BatchNorm inference."""
    cout = 8
    gamma = jnp.asarray(rng.normal(size=(cout,)) + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    var = jnp.asarray(rng.random(cout) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(4, cout)), jnp.float32)

    scale, shift = fold_bn_params(gamma, beta, mean, var, 1e-5, conv_bias=bias)
    folded = y * scale + shift
    direct = gamma * ((y + bias) - mean) / jnp.sqrt(var + 1e-5) + beta
    np.testing.assert_allclose(np.asarray(folded), np.asarray(direct),
                               rtol=1e-5)
