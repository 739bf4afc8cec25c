"""Numerical parity of the Flax compute stack vs torch (the reference's
framework): conv3x3+BN+ReLU blocks and a full BasicUNet forward with
identical weights must agree within fp32 tolerance (BASELINE.json
"bit-for-bit within fp tolerance" requirement)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from enhanced_unet_tpu.models import get_model
from enhanced_unet_tpu.models.blocks import ConvBNAct

pytestmark = pytest.mark.slow  # compile-heavy lane (see pyproject.toml)


import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from torch_mirror import build_basic_unet_mirror, to_torch_conv

_to_torch_conv = to_torch_conv


class TestConvBNActParity:
    def test_eval_forward_matches_torch(self, rng):
        cin, cout = 5, 7
        block = ConvBNAct(cout, dtype=jnp.float32)
        x = rng.normal(size=(2, 16, 16, cin)).astype(np.float32)
        variables = block.init(jax.random.key(0), jnp.asarray(x), train=False)

        params = variables["params"]
        stats = variables["batch_stats"]
        # randomize BN stats so the test isn't trivially identity
        stats = jax.tree.map(
            lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.3 + 1.0,
                                  jnp.float32),
            stats,
        )
        ours = block.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x), train=False,
        )

        conv = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        bn = tnn.BatchNorm2d(cout, eps=1e-5)
        with torch.no_grad():
            conv.weight.copy_(_to_torch_conv(params["Conv_0"]["kernel"]))
            bn.weight.copy_(torch.from_numpy(np.asarray(params["BatchNorm_0"]["scale"])))
            bn.bias.copy_(torch.from_numpy(np.asarray(params["BatchNorm_0"]["bias"])))
            bn.running_mean.copy_(torch.from_numpy(np.asarray(stats["BatchNorm_0"]["mean"])))
            bn.running_var.copy_(torch.from_numpy(np.asarray(stats["BatchNorm_0"]["var"])))
        bn.eval()
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        with torch.no_grad():
            theirs = torch.relu(bn(conv(xt)))
        theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


class TestBasicUNetParity:
    def test_full_forward_matches_torch(self, rng):
        model = get_model("unet_basic", dtype=jnp.float32)
        x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
        variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
        params, stats = variables["params"], variables["batch_stats"]
        # randomize BN stats
        stats = jax.tree.map(
            lambda a: jnp.asarray(rng.random(a.shape).astype(np.float32) + 0.5),
            stats,
        )
        ours, _ = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x), train=False,
        )
        mirror = build_basic_unet_mirror(
            jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, stats)
        )
        with torch.no_grad():
            theirs = mirror(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5)
