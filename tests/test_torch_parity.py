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


def _to_torch_conv(kernel_hwio):
    # flax HWIO -> torch OIHW
    return torch.from_numpy(np.transpose(np.asarray(kernel_hwio), (3, 2, 0, 1)))


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
    def _build_torch_mirror(self, params, stats, num_classes=3):
        """torch mirror of our BasicUNet (same topology) with copied weights."""

        def conv_bn(p, s):
            cin = p["Conv_0"]["kernel"].shape[2]
            cout = p["Conv_0"]["kernel"].shape[3]
            conv = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
            bn = tnn.BatchNorm2d(cout, eps=1e-5)
            with torch.no_grad():
                conv.weight.copy_(_to_torch_conv(p["Conv_0"]["kernel"]))
                bn.weight.copy_(torch.from_numpy(np.asarray(p["BatchNorm_0"]["scale"])))
                bn.bias.copy_(torch.from_numpy(np.asarray(p["BatchNorm_0"]["bias"])))
                bn.running_mean.copy_(torch.from_numpy(np.asarray(s["BatchNorm_0"]["mean"])))
                bn.running_var.copy_(torch.from_numpy(np.asarray(s["BatchNorm_0"]["var"])))
            bn.eval()
            return tnn.Sequential(conv, bn, tnn.ReLU())

        def double(p, s):
            return tnn.Sequential(
                conv_bn(p["ConvBNAct_0"], s["ConvBNAct_0"]),
                conv_bn(p["ConvBNAct_1"], s["ConvBNAct_1"]),
            )

        class Mirror(tnn.Module):
            def __init__(self):
                super().__init__()
                self.enc1 = double(params["DoubleConv_0"], stats["DoubleConv_0"])
                self.enc2 = double(params["DoubleConv_1"], stats["DoubleConv_1"])
                self.enc3 = double(params["DoubleConv_2"], stats["DoubleConv_2"])
                self.enc4 = double(params["DoubleConv_3"], stats["DoubleConv_3"])
                self.dec4 = double(
                    params["UpConcatBlock_0"]["DoubleConv_0"],
                    stats["UpConcatBlock_0"]["DoubleConv_0"],
                )
                self.dec3 = double(
                    params["UpConcatBlock_1"]["DoubleConv_0"],
                    stats["UpConcatBlock_1"]["DoubleConv_0"],
                )
                self.dec2 = double(
                    params["UpConcatBlock_2"]["DoubleConv_0"],
                    stats["UpConcatBlock_2"]["DoubleConv_0"],
                )
                head = tnn.Conv2d(64, num_classes, 1)
                with torch.no_grad():
                    k = params["Conv_0"]["kernel"]  # [1,1,cin,cout]
                    head.weight.copy_(_to_torch_conv(k))
                    head.bias.copy_(
                        torch.from_numpy(np.asarray(params["Conv_0"]["bias"]))
                    )
                self.head = head
                self.pool = tnn.MaxPool2d(2)
                self.up = tnn.Upsample(scale_factor=2, mode="bilinear",
                                       align_corners=False)

            def forward(self, x):
                e1 = self.enc1(x)
                e2 = self.enc2(self.pool(e1))
                e3 = self.enc3(self.pool(e2))
                e4 = self.enc4(self.pool(e3))
                d4 = self.dec4(torch.cat([self.up(e4), e3], 1))
                d3 = self.dec3(torch.cat([self.up(d4), e2], 1))
                d2 = self.dec2(torch.cat([self.up(d3), e1], 1))
                return self.head(d2)

        return Mirror()

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
        mirror = self._build_torch_mirror(
            jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, stats)
        )
        with torch.no_grad():
            theirs = mirror(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5)
