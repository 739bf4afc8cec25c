"""Fused Pallas MBConv (ops/pallas/mbconv.py) == stock XLA block.

Runs the kernels in interpret mode on CPU (the production gate routes
them only on TPU; `pallas_infer="force"` / direct nchw calls bypass it
for these tests).  Weights come from the SAME initialised tree, so this
pins the whole fold (BN into conv, SE gate into projection) and both
kernel passes against the stock path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhanced_unet_tpu.models.encoders import EfficientNetEncoder, MBConvBlock

pytestmark = pytest.mark.slow  # compile-heavy lane (see pyproject.toml)


def _rel_err(got, ref):
    got, ref = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    return np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6)


@pytest.mark.parametrize("ratio", [1, 6])
def test_mbconv_block_pallas_matches_stock(rng, ratio):
    c = 8
    block = MBConvBlock(c, c, ratio, (1, 1), 3, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, c)) * 0.5, jnp.float32)
    v = block.init({"params": jax.random.key(0)}, x, False)
    ref = block.apply(v, x, False)
    got = block.apply(v, jnp.transpose(x, (0, 3, 1, 2)), False, nchw=True)
    got = jnp.transpose(got, (0, 2, 3, 1))
    assert _rel_err(got, ref) < 3e-2  # bf16 reassociation noise


def test_encoder_pallas_route_matches_stock(rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)) * 0.5, jnp.float32)
    stock = EfficientNetEncoder(variant="efficientnet-b0",
                                max_stages=2, pallas_infer=False,
                                dtype=jnp.bfloat16)
    routed = EfficientNetEncoder(variant="efficientnet-b0",
                                 max_stages=2, pallas_infer="force",
                                 dtype=jnp.bfloat16)
    v = stock.init(jax.random.key(1), x, False)
    ref = stock.apply(v, x, False)
    got = routed.apply(v, x, False)
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        assert a.shape == b.shape
        assert _rel_err(a, b) < 3e-2
