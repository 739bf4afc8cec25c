"""Model zoo shape/structure tests (fp32 on CPU; small inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhanced_unet_tpu.models import get_model
from enhanced_unet_tpu.models.blocks import (

    max_pool_with_indices,
    max_unpool_2x2,
)

pytestmark = pytest.mark.slow  # compile-heavy lane (see pyproject.toml)

ALL_MODELS = [
    "segnet",
    "unet",
    "unet_basic",
    "enhanced_unet_basic",
    "fcn",
    "fcn_basic",
    "pspnet",
    "pspnet_basic",
    "linknet",
    "linknet_basic",
]


def _init_and_run(name, size=64, train=False):
    model = get_model(name, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, size, size, 3)),
                    dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )
    out, mut = model.apply(
        variables, x, train=train,
        rngs={"dropout": jax.random.key(2)} if train else None,
        mutable=["batch_stats"] if train else False,
    ) if train else (model.apply(variables, x, train=False), None)
    return out


@pytest.mark.parametrize("name", ALL_MODELS)
def test_output_shape(name):
    logits, aux = _init_and_run(name)
    assert logits.shape == (1, 64, 64, 3), name
    assert logits.dtype == jnp.float32
    assert aux == {}
    assert not np.isnan(np.asarray(logits)).any()


def test_enhanced_unet_basic_residual_enhance():
    """The fallback's enhance head contributes residually: output differs
    from the inner BasicUNet logits but shares shape (models.py:334-339)."""
    from enhanced_unet_tpu.models import EnhancedUNetBasic

    model = EnhancedUNetBasic(dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    logits, aux = model.apply(variables, x, train=False)
    assert logits.shape == (1, 32, 32, 3) and aux == {}
    # zeroing the enhance head's params must reduce to the plain BasicUNet out
    import flax

    params = flax.core.unfreeze(variables["params"])
    enhance_keys = [k for k in params if k.startswith("Conv")]
    assert enhance_keys, list(params)
    zeroed = jax.tree.map(jnp.zeros_like,
                          {k: params[k] for k in enhance_keys})
    params2 = {**params, **zeroed}
    base_logits, _ = model.apply(
        {"params": params2, "batch_stats": variables["batch_stats"]},
        x, train=False)
    assert not np.allclose(np.asarray(logits), np.asarray(base_logits))


def test_enhanced_unet_shapes():
    logits, aux = _init_and_run("enhanced_unet", size=64)
    assert logits.shape == (1, 64, 64, 3)
    assert set(aux) == {"unetpp", "deeplab"}
    assert aux["unetpp"].shape == (1, 64, 64, 3)
    assert aux["deeplab"].shape == (1, 64, 64, 3)


def test_enhanced_unet_fast_fusion_variant():
    """fusion_stride=2 runs the identical head at half resolution and
    upsamples back — same output shape/API."""
    model = get_model("enhanced_unet", dtype=jnp.float32, fusion_stride=2)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )
    logits, aux = model.apply(variables, x, train=False)
    assert logits.shape == (1, 64, 64, 3)
    assert set(aux) == {"unetpp", "deeplab"}
    assert not np.isnan(np.asarray(logits)).any()


def test_pool_unpool_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), dtype=jnp.float32)
    pooled, idx = max_pool_with_indices(x)
    assert pooled.shape == (2, 4, 4, 4)
    # pooled equals plain max pool
    from flax import linen as nn

    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2)))
    )
    unpooled = max_unpool_2x2(pooled, idx)
    assert unpooled.shape == x.shape
    # each 2x2 window has exactly one nonzero equal to the max
    u = np.asarray(unpooled).reshape(2, 4, 2, 4, 2, 4)
    nz = (u != 0).sum(axis=(2, 4))
    assert (nz <= 1).all()  # ties in random floats ~impossible; zeros possible
    # values preserved at argmax positions (sum works even for negative
    # maxima, where the zero filler would win a max)
    np.testing.assert_allclose(u.sum(axis=(2, 4)), np.asarray(pooled), rtol=1e-6)


def test_depthwise_shift_fma_matches_lax_conv():
    """The shift-FMA depthwise variant == lax.conv on the same params
    (benchmark artifact kept param-compatible; ADVICE r2)."""
    from enhanced_unet_tpu.models.encoders import DepthwiseConv

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 8, 4)),
                    jnp.float32)
    ref = DepthwiseConv(features=4, kernel=3, dtype=jnp.float32)
    fma = DepthwiseConv(features=4, kernel=3, shift_fma=True,
                        dtype=jnp.float32)
    variables = ref.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(ref.apply(variables, x)),
        np.asarray(fma.apply(variables, x)),
        rtol=1e-5, atol=1e-5,
    )


def test_train_mode_runs_with_mutable_batch_stats():
    model = get_model("unet_basic", dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    (logits, aux), mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    assert logits.shape == (2, 32, 32, 3)
    assert "batch_stats" in mutated
