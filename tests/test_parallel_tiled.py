"""Sharded tiled inference == single-device tiled inference (8 CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np

from enhanced_unet_tpu.ops.tiling import tiled_inference
from enhanced_unet_tpu.parallel import make_mesh, tiled_inference_sharded


def _pointwise_apply(tiles):
    m = tiles.mean(axis=-1, keepdims=True)
    return jnp.concatenate([m, 1.0 - m, jnp.zeros_like(m)], axis=-1)


def test_sharded_matches_single_device(rng):
    img = jnp.asarray(rng.random((150, 200, 3)), jnp.float32)
    mesh = make_mesh(8)
    sharded = tiled_inference_sharded(
        _pointwise_apply, img, mesh, tile=64, overlap=16
    )
    single = tiled_inference(
        _pointwise_apply, img, tile=64, overlap=16, batch_size=8
    )
    assert sharded.shape == (150, 200, 3)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-5
    )


def test_tile_count_not_divisible_by_devices(rng):
    # 3x3 = 9 tiles over 8 devices -> padding path
    img = jnp.asarray(rng.random((160, 160, 3)), jnp.float32)
    mesh = make_mesh(8)
    out = tiled_inference_sharded(_pointwise_apply, img, mesh, tile=64,
                                  overlap=16)
    whole = jax.nn.softmax(_pointwise_apply(img[None])[0], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(whole), atol=1e-5)
