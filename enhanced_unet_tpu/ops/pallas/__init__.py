"""Pallas TPU kernel experiments — benchmarked and RETIRED from the
production path (docs/ARCHITECTURE.md "Pallas verdict").

What was tried, with receipts:
- fused conv3x3+BN+ReLU (conv_fused.py, benchmarks/kernel_bench.py): wins
  only at Cin=Cout=128; loses elsewhere to XLA's conv emitters (9x input
  read amplification without halo sharing).
- fused MBConv inference block, NCHW two-pass with SE-gate weight folding
  (benchmarks/pallas_mbconv_proto.py + pallas_mbconv_instr.py): 2.9 ms vs
  XLA's 2.6 ms at the stage-0 shape — the in-VMEM 9-tap depthwise
  (unaligned sublane/lane shifts) and per-grid-cell overheads eat the
  layout-copy savings.

The custom-kernel budget went to the space-to-depth packed decoder instead
(ops/s2d.py + models/packed_blocks.py): an XLA-level layout redesign with
zero-stuffed and upsample-folded conv kernels that measured 80 -> 48 ms on
the UNet++ branch.  The conv_fused kernel stays importable as the
benchmark exhibit and interpreter-mode test target.
"""

from enhanced_unet_tpu.ops.pallas.conv_fused import (
    fused_conv3x3_bn_relu,
    fused_conv3x3_bn_relu_reference,
)

__all__ = [
    "fused_conv3x3_bn_relu",
    "fused_conv3x3_bn_relu_reference",
]
