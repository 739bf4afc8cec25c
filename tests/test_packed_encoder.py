"""Channel-major packed encoder twins (models/packed_blocks.py
PackedMBConvCM + EfficientNetEncoder(packed_highres=True)): same param
tree, same math as the plain blocks — the round-4 encoder bandwidth
rework (reference anchor: the smp EfficientNet encoders the reference
instantiates at models.py:255-275; the packing itself has no reference
equivalent, it is the TPU layout redesign, cf. ops/s2d.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from enhanced_unet_tpu.models.encoders import EfficientNetEncoder, MBConvBlock
from enhanced_unet_tpu.models.packed_blocks import PackedMBConvCM
from enhanced_unet_tpu.ops.s2d import (
    depth_to_space_cm,
    dw_s2_kernel_cm,
    space_to_depth_cm,
)


@pytest.fixture
def x16(rng):
    return jnp.asarray(rng.random((2, 16, 16, 8)), jnp.float32)


def test_cm_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 10, 5)), jnp.float32)
    assert np.array_equal(np.asarray(depth_to_space_cm(space_to_depth_cm(x))),
                          np.asarray(x))


def test_dw_s2_kernel_matches_strided_depthwise(rng):
    """Packed 2x2 grouped conv == logical TF-SAME stride-2 depthwise."""
    c = 8
    x = jnp.asarray(rng.random((2, 16, 16, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 1, c)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jax.lax.conv_general_dilated(
        space_to_depth_cm(x), dw_s2_kernel_cm(w), (1, 1), ((0, 1), (0, 1)),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("expand,cin,cout", [(1, 8, 8), (6, 8, 8), (6, 8, 16)])
def test_packed_mbconv_matches_plain(rng, expand, cin, cout, x16):
    x = jnp.asarray(rng.random((2, 16, 16, cin)), jnp.float32)
    plain = MBConvBlock(cin, cout, expand, (1, 1), 3, dtype=jnp.float32)
    packed = PackedMBConvCM(cin, cout, expand, dtype=jnp.float32)
    variables = plain.init(jax.random.key(0), x, True)
    pv = packed.init(jax.random.key(0), space_to_depth_cm(x), True)
    # identical param trees (same names, same logical shapes)
    assert (jax.tree.structure(variables["params"])
            == jax.tree.structure(pv["params"]))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(variables["params"])[0],
            jax.tree_util.tree_flatten_with_path(pv["params"])[0]):
        assert np.shape(a) == np.shape(b), (ka, np.shape(a), np.shape(b))

    # inference equivalence
    ref = plain.apply(variables, x, False)
    got = depth_to_space_cm(
        packed.apply(variables, space_to_depth_cm(x), False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # train-mode equivalence incl. batch-stat updates
    ref_t, mut_a = plain.apply(variables, x, True,
                               mutable=["batch_stats"])
    got_t, mut_b = packed.apply(variables, space_to_depth_cm(x), True,
                                mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(depth_to_space_cm(got_t)),
                               np.asarray(ref_t), rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(mut_a), jax.tree.leaves(mut_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_packed_mbconv_stride2_exit(rng):
    cin, cout, expand = 8, 16, 6
    x = jnp.asarray(rng.random((2, 16, 16, cin)), jnp.float32)
    plain = MBConvBlock(cin, cout, expand, (2, 2), 3, dtype=jnp.float32)
    packed = PackedMBConvCM(cin, cout, expand, stride2_exit=True,
                            dtype=jnp.float32)
    variables = plain.init(jax.random.key(0), x, True)
    ref = plain.apply(variables, x, False)
    got = packed.apply(variables, space_to_depth_cm(x), False)
    assert got.shape == ref.shape  # unpacked half-res out
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("train", [False, True])
def test_packed_highres_encoder_equivalence(rng, train):
    """Whole-encoder: packed_highres=True computes the identical feature
    pyramid on the identical param tree (efficientnet-b0, 64^2)."""
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    plain = EfficientNetEncoder(variant="efficientnet-b0",
                                pallas_infer=False, dtype=jnp.float32)
    packed = EfficientNetEncoder(variant="efficientnet-b0",
                                 pallas_infer=False, packed_highres=True,
                                 dtype=jnp.float32)
    variables = plain.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, True)
    pv = packed.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, True)
    assert (jax.tree.structure(variables["params"])
            == jax.tree.structure(pv["params"]))

    kwargs = dict(mutable=["batch_stats"]) if train else {}
    rngs = {"dropout": jax.random.key(2)} if train else None
    ref = plain.apply(variables, x, train, rngs=rngs, **kwargs)
    got = packed.apply(variables, x, train, rngs=rngs, **kwargs)
    # train-mode batch stats are computed in a different (but exact)
    # reduction order (per-packed-channel then per-logical-channel); the
    # fp32 noise normalizes activations by slightly different means/vars
    # and compounds over 16 BN layers — measured max 1.6e-3 at b0/64^2
    tol = 3e-3 if train else 3e-4
    if train:
        ref, mut_a = ref
        got, mut_b = got
        # stochastic depth uses make_rng per block — identical module
        # structure means identical rng folding, so outputs match exactly
        for a, b in zip(jax.tree.leaves(mut_a), jax.tree.leaves(mut_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=tol, atol=tol)
    assert len(got) == len(ref)
    for fa, fb in zip(ref, got):
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                                   rtol=tol, atol=tol)
