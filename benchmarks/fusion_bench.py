"""Fusion-stage variants: attack the small-channel layout waste.

Per-op trace of the full model (benchmarks/op_trace.py full): the fusion
head's 256->128 conv is at ~roofline (12.8 ms), but the tiny-channel ops
around it are layout-bound: the 64->3 logits conv alone is 6.8 ms at 0.24
TF/s (XLA picks a batch-in-lanes layout for 3-channel outputs), the 6->256
conv1 4.2 ms, the 6-channel gate ~3 ms.

Variants (batch 16, 512^2, 6-channel input):
  base    : current EnhancedUNet fusion stage (_FusionOnly)
  pad8    : head + residual 1x1 convs emit 8 channels (kernel zero-padded),
            slice [:3] after the add — dense sublane layout, same math
  bf16g   : gate/attention arithmetic in bf16 (fp32 only at the end)
  packedg : gate + residual in s2d packed space (6ch@512^2 -> 24ch@256^2),
            d2s back before conv1

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fusion_bench.py
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

sys.path.insert(0, "/root/repo/benchmarks")
from microtime import time_op

from enhanced_unet_tpu.models.blocks import ConvBNAct
from enhanced_unet_tpu.ops.s2d import (
    depth_to_space,
    s2d_kernel_same,
    space_to_depth,
)

DT = jnp.bfloat16
B, H, W = 16, 512, 512


class FusionVariant(nn.Module):
    pad8: bool = False
    bf16_gate: bool = False
    packed_gate: bool = False

    @nn.compact
    def __call__(self, fused, train: bool = False):
        fc = fused.shape[-1]
        gdt = DT if self.bf16_gate else jnp.float32

        if self.packed_gate:
            fp = space_to_depth(fused.astype(DT))  # [B,256,256,24]
            wa = self.param("wa", nn.initializers.lecun_normal(),
                            (3, 3, fc, fc // 2), jnp.float32)
            a = jax.lax.conv_general_dilated(
                fp, s2d_kernel_same(wa).astype(DT), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=DT,
                             param_dtype=jnp.float32)(a)
            a = nn.gelu(a)
            wb = self.param("wb", nn.initializers.lecun_normal(),
                            (1, 1, fc // 2, fc), jnp.float32)
            kb = jnp.kron(jnp.eye(4, dtype=DT), wb[0, 0].astype(DT))
            a = jax.lax.conv_general_dilated(
                a, kb.reshape(1, 1, 4 * (fc // 2), 4 * fc), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=DT,
                             param_dtype=jnp.float32)(a)
            gated_p = fp * nn.sigmoid(a)
            gated = depth_to_space(gated_p).astype(jnp.float32)
        else:
            a = nn.Conv(fc // 2, (3, 3), padding="SAME", use_bias=False,
                        dtype=DT, param_dtype=jnp.float32)(fused.astype(DT))
            a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=DT,
                             param_dtype=jnp.float32)(a)
            a = nn.gelu(a)
            a = nn.Conv(fc, (1, 1), use_bias=False, dtype=DT,
                        param_dtype=jnp.float32)(a)
            a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=DT,
                             param_dtype=jnp.float32)(a)
            attention = nn.sigmoid(a.astype(gdt))
            gated = fused.astype(gdt) * attention

        y = gated.astype(DT)
        y = ConvBNAct(256, use_bias=False, dtype=DT)(y, train)
        y = ConvBNAct(128, use_bias=False, dtype=DT)(y, train)
        y = ConvBNAct(64, use_bias=False, dtype=DT)(y, train)
        out_c = 8 if self.pad8 else 3
        head = nn.Conv(out_c, (1, 1), dtype=DT,
                       param_dtype=jnp.float32)(y).astype(jnp.float32)
        residual = nn.Conv(out_c, (1, 1), dtype=jnp.float32,
                           param_dtype=jnp.float32)(gated.astype(jnp.float32))
        logits = head + residual
        if self.pad8:
            logits = logits[..., :3]
        return logits


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, 6)), jnp.float32)

    for name, m in [
        ("base", FusionVariant()),
        ("pad8", FusionVariant(pad8=True)),
        ("bf16g", FusionVariant(bf16_gate=True)),
        ("pad8+bf16g", FusionVariant(pad8=True, bf16_gate=True)),
        ("packedg", FusionVariant(packed_gate=True)),
        ("packedg+pad8", FusionVariant(packed_gate=True, pad8=True)),
    ]:
        v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, H, W, 6)),
                   False)

        def fwd(z, m=m, v=v):
            return m.apply(v, z, False)

        try:
            ms = time_op(jax.jit(fwd), x, iters=20)
            print(json.dumps({"bench": name, "ms": round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"bench": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
