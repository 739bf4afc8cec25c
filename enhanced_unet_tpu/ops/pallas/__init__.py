"""Pallas TPU kernels for the hot model blocks (BASELINE.json north star).

Every kernel has a jnp reference fallback (`*_reference`) used for
correctness tests (interpret mode on CPU) and as the default when
use_pallas=False; kernels are only routed in production where they beat the
XLA-generated code on the target TPU (measured by benchmarks/, recorded in
BASELINE.md).
"""

from enhanced_unet_tpu.ops.pallas.conv_fused import (
    fused_conv3x3_bn_relu,
    fused_conv3x3_bn_relu_reference,
)

__all__ = [
    "fused_conv3x3_bn_relu",
    "fused_conv3x3_bn_relu_reference",
]
