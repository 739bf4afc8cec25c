"""Space-to-depth (packed) twins of the decoder blocks.

Each module here computes EXACTLY the same function as its plain twin in
`models/blocks.py`, but on tensors in the natural s2d packing
([N,H/2,W/2,4C] — see ops/s2d.py), and declares parameters under the SAME
names and logical shapes as the plain twin, so the two are interchangeable
on one checkpoint/param tree: `UNetPlusPlus(packed_decoder=True/False)`
load the same weights (tests/test_s2d.py asserts tree equality and forward
equivalence).

Why this exists: the UNet++ decoder's 16-32-channel tensors at 256-512px
lane-pad up to 8x on TPU; packing 2x2 spatial blocks into channels removes
the padding on every pass and fills the MXU's 128 output lanes
(benchmarks/decoder_bench.py).  Convs run as zero-stuffed SAME convs on the
natural packing, and nearest-upsampled operands (the `up(below)` skip and
the full-res head input) are folded into the conv kernel so the upsample is
never materialised (ops/s2d.py, benchmarks/head_bench.py).  Reference
equivalent: none — the reference runs these convs through cuDNN NCHW
(models.py:217-225); this is the TPU-native layout redesign of the same
math.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

import os

from enhanced_unet_tpu.ops.s2d import (
    aligned22_kernel_multi,
    conv3x3_aligned22,
    conv3x3_s2d,
    fused_up_kernel,
    packed_1x1_spatial_kernel,
    s2d_kernel_same_multi,
)

Dtype = Any


# Packed-conv lowering: "stuffed" (3x3 zero-stuffed kernel, 4x MACs) or
# "aligned22" (2x2 VALID + output slices, 16/9 MACs).  Same math either way
# (tests/test_s2d.py); the default is the variant that measures faster on
# TPU (benchmarks/packed_conv_variants.py).  Read ONCE at import: traced
# programs bake the choice in, so a post-compile env change could not take
# effect anyway — set EUNET_S2D_IMPL before importing the package.
_S2D_IMPL = os.environ.get("EUNET_S2D_IMPL", "stuffed")


def _s2d_impl() -> str:
    return _S2D_IMPL


class PackedBatchNorm(nn.Module):
    """BatchNorm over packed [N,h,w,4C] equal to nn.BatchNorm over the
    logical [N,2h,2w,C]: per-logical-channel statistics are the mean over
    the four sub-position blocks (exact — same set of elements).

    Param/stat tree matches flax nn.BatchNorm: params {scale, bias},
    batch_stats {mean, var}, each of logical shape [C].
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # stats over (N, h, w) per packed channel, then over the four
            # sub-position replicas per logical channel (exact: the union
            # is all logical positions)
            xf = x.astype(jnp.float32)
            m4 = jnp.mean(xf, axis=(0, 1, 2))            # [4C]
            v4 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            mean = m4.reshape(4, c).mean(axis=0)
            var = v4.reshape(4, c).mean(axis=0) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        # tile [C] -> [4C] to match the packed channel layout
        inv4 = jnp.tile(inv, 4).astype(self.dtype)
        b4 = jnp.tile(bias - mean * inv, 4).astype(self.dtype)
        return x.astype(self.dtype) * inv4 + b4


class PackedConv3x3(nn.Module):
    """Bare packed 3x3 SAME conv, param-compatible with nn.Conv
    (param "kernel" of logical shape [3,3,Cin,Cout]; "bias" when use_bias).

    Input is a list of packed parts plus (optionally) one trailing UNPACKED
    `up_part` whose logical contribution is conv(nearest_up2x(up_part)) —
    its kernel slice is the LAST `up_features` input channels.  `split`
    lists the logical channels of the packed parts only.
    """

    features: int
    in_features_total: int  # logical Cin incl. the up slice
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, parts, split: Sequence[int],
                 up_part: Optional[jnp.ndarray] = None,
                 up_features: int = 0):
        if not isinstance(parts, (list, tuple)):
            parts = [parts]
            split = [self.in_features_total - up_features]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features_total, self.features), jnp.float32)
        offs, slices = 0, []
        for c in split:
            slices.append(kernel[:, :, offs:offs + c, :])
            offs += c
        uk = None
        if up_part is not None:
            uk = fused_up_kernel(kernel[:, :, offs:offs + up_features, :]
                                 ).astype(self.dtype)
            up_part = up_part.astype(self.dtype)
        if _s2d_impl() == "aligned22" and slices:
            pk = aligned22_kernel_multi(slices).astype(self.dtype)
            xs = [p.astype(self.dtype) for p in parts]
            x = jnp.concatenate(xs, axis=-1) if len(xs) > 1 else xs[0]
            y = conv3x3_aligned22(x, pk)
            if up_part is not None:
                y = y + conv3x3_s2d(None, None, up_input=up_part, up_kernel=uk)
        else:
            pk = (s2d_kernel_same_multi(slices).astype(self.dtype)
                  if slices else None)
            y = conv3x3_s2d([p.astype(self.dtype) for p in parts], pk,
                            up_input=up_part, up_kernel=uk)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + jnp.tile(bias, 4).astype(y.dtype)
        return y


class PackedConv1x1(nn.Module):
    """Logical 1x1 conv on the natural packing, param-compatible with
    nn.Conv(features, (1, 1)) (param "kernel" [1,1,Cin,Cout], "bias"
    [Cout] when use_bias): the per-pixel projection applied to each of the
    four sub-positions via a block-diagonal kron(I4, w) kernel.  Used by
    the packed fusion gate (attention 1x1) and residual path."""

    features: int
    in_features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, self.features),
                            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        pk, pb = packed_1x1_spatial_kernel(
            kernel.astype(self.dtype),
            None if bias is None else bias.astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), pk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if pb is not None:
            y = y + pb
        return y


class PackedConvBNAct(nn.Module):
    """Packed twin of ConvBNAct (3x3, stride 1, SAME, BN, act).  Takes a
    LIST of packed tensors (the concat parts, in order) plus optionally a
    trailing unpacked nearest-upsampled operand (see PackedConv3x3); the
    conv parameter covers their combined logical channels.

    Only the decoder configuration is supported (kernel 3x3, stride 1,
    use_bn=True, no bias) — exactly what NestedBlock/DoubleConv use.
    """

    features: int
    in_features: Sequence[int]  # logical channels of each concat part
    act: Optional[Any] = nn.relu
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, parts, train: bool = False,
                 up_part: Optional[jnp.ndarray] = None):
        if not isinstance(parts, (list, tuple)):
            parts = [parts]
        up_features = 0
        split = list(self.in_features)
        if up_part is not None:
            up_features = split[-1]  # up slice is the last concat part
            split = split[:-1]
        cin = sum(self.in_features)
        # same name/shape as nn.Conv inside plain ConvBNAct ("Conv_0")
        kernel = PackedConv3x3(self.features, cin, name="Conv_0",
                               dtype=self.dtype)
        y = kernel(parts, split, up_part=up_part, up_features=up_features)
        y = PackedBatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            name="BatchNorm_0")(y)
        if self.act is not None:
            y = self.act(y)
        return y


class PackedDoubleConv(nn.Module):
    """Packed twin of DoubleConv: two PackedConvBNActs, names matching."""

    features: int
    in_features: Sequence[int]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, parts, train: bool = False,
                 up_part: Optional[jnp.ndarray] = None):
        y = PackedConvBNAct(self.features, self.in_features,
                            dtype=self.dtype, name="ConvBNAct_0")(
            parts, train, up_part=up_part)
        y = PackedConvBNAct(self.features, (self.features,),
                            dtype=self.dtype, name="ConvBNAct_1")(y, train)
        return y


class PackedSCSE(nn.Module):
    """Packed twin of SCSEBlock.

    cSE: the global pool collapses the packing (mean over packed space and
    the 4 sub-blocks = mean over logical space), so the two 1x1 convs run
    on the tiny [N,1,1,C] pooled tensor with stock nn.Conv — identical
    params.  sSE: the per-pixel projection becomes a block-diagonal
    4C->4 1x1 conv in packed space; its 4 outputs are the (a,b) sub-pixel
    gates, broadcast back per block.
    """

    reduction: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 4
        # channel squeeze-excitation on the pooled logical vector
        s4 = jnp.mean(x, axis=(1, 2), keepdims=True)          # [N,1,1,4C]
        s = s4.reshape(s4.shape[0], 1, 4, c).mean(axis=2,
                                                  keepdims=True)  # [N,1,1,C]
        s = nn.Conv(max(c // self.reduction, 1), (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="Conv_0")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="Conv_1")(s)
        cse_gate = jnp.tile(jax.nn.sigmoid(s), (1, 1, 1, 4))   # [N,1,1,4C]
        # spatial squeeze-excitation: block-diagonal packed 1x1 under the
        # plain SCSEBlock's third conv name
        t = _PackedSSEConv(name="Conv_2", dtype=self.dtype)(x)  # [N,h,w,4]
        sse_gate = jnp.repeat(jax.nn.sigmoid(t), c, axis=-1)   # [N,h,w,4C]
        return x * cse_gate + x * sse_gate


class _PackedSSEConv(nn.Module):
    """sSE 1x1 conv (C logical channels -> 1) in packed space; params match
    nn.Conv(1, (1,1)): kernel [1,1,C,1] + bias [1]."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 4
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, c, 1), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        pk, pb = packed_1x1_spatial_kernel(w.astype(self.dtype),
                                           b.astype(self.dtype))
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), pk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + pb


class _PackedSSEConvMulti(nn.Module):
    """sSE 1x1 conv over the packed CONCAT of a parts list, emitting the
    per-sub-pixel gate [N,h,w,4] with ONE conv.  Params match
    nn.Conv(1,(1,1)) on the logical concat: kernel [1,1,Ctot,1] + bias [1];
    each part's slice is expanded block-diagonally (sub-position s of the
    gate reads only that part's sub-position-s channels) and the slices are
    stacked along the packed input axis in concat order."""

    in_features: Sequence[int]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ctot = sum(self.in_features)
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, ctot, 1), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        pks, off = [], 0
        for c in self.in_features:
            pk, _ = packed_1x1_spatial_kernel(
                w[:, :, off:off + c, :].astype(self.dtype),
                jnp.zeros((1,), self.dtype))
            pks.append(pk)                          # [1,1,4c,4]
            off += c
        kernel = jnp.concatenate(pks, axis=2)        # [1,1,sum(4c),4]
        t = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return t + jnp.tile(b.astype(t.dtype), 4)


class PackedSCSEMulti(nn.Module):
    """scSE over the packed concat of a parts list — the packed twin of
    SCSEBlock applied to the logical concat (smp DecoderBlock attention1).
    Param tree matches plain SCSEBlock (Conv_0/Conv_1 cSE, Conv_2 sSE) on
    the logical concat, so imported attention1 weights land directly.

    Takes and returns ONE tensor (the packed concat, channel layout
    [part0:(s,c) | part1:(s,c) | ...]): one global-mean reduction, one sSE
    conv, and one fused gating pass over the whole concat — the per-part
    formulation spent ~3 extra HBM passes per block in separate reduces,
    convs and multiplies (benchmarks/op_trace.py round-3 attribution)."""

    in_features: Sequence[int]
    reduction: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        ctot = sum(self.in_features)
        # logical per-channel global means, in concat order: one reduction
        # over (h,w), then tiny per-part sub-position averages on [N,4C]
        m = jnp.mean(x, axis=(1, 2))                 # [N, sum(4C)]
        means, off = [], 0
        for c in self.in_features:
            means.append(m[:, off:off + 4 * c].reshape(n, 4, c).mean(axis=1))
            off += 4 * c
        s = jnp.concatenate(means, axis=-1)[:, None, None, :]  # [N,1,1,Ctot]
        s = nn.Conv(max(ctot // self.reduction, 1), (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="Conv_0")(s)
        s = nn.relu(s)
        s = nn.Conv(ctot, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="Conv_1")(s)
        cse = jax.nn.sigmoid(s)                      # [N,1,1,Ctot]
        # broadcast the cse gate back to the packed concat layout (tiny)
        cparts, off = [], 0
        for c in self.in_features:
            cparts.append(jnp.tile(cse[..., off:off + c], (1, 1, 1, 4)))
            off += c
        cse_p = jnp.concatenate(cparts, axis=-1).astype(x.dtype)
        t = _PackedSSEConvMulti(self.in_features, dtype=self.dtype,
                                name="Conv_2")(x)
        sse = jax.nn.sigmoid(t)                      # [N,h,w,4]
        # expand the sub-pixel gate to the concat layout; XLA fuses the
        # repeats+adds+multiply into one elementwise pass over x
        sse_p = jnp.concatenate(
            [jnp.repeat(sse, c, axis=-1) for c in self.in_features],
            axis=-1).astype(x.dtype)
        return x * (cse_p + sse_p)


class PackedNestedBlock(nn.Module):
    """Packed twin of the smp-exact NestedBlock: parts in smp concat order
    [up(below), same[j-1], ..., same[0]] -> attention1 (PackedSCSEMulti)
    -> DoubleConv -> attention2 (PackedSCSE), all in packed space.

    The s2d packing of nearest_up2x(below) is a channel tile x4 (every
    sub-position equals `below`), so the upsample is one cheap concat —
    but because attention1 gates per logical pixel, the up operand can no
    longer be folded into the conv kernel (fused_up_kernel needs a pure
    nearest-upsample input); it rides as a normal packed part."""

    features: int
    in_features: Sequence[int]  # logical channels: up(below), same[j-1..0]
    use_scse: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, same_level_packed, below_plain, train: bool = False):
        up_packed = jnp.tile(below_plain.astype(self.dtype), (1, 1, 1, 4))
        parts = [up_packed] + [p.astype(self.dtype)
                               for p in same_level_packed[::-1]]
        # concat once; attention1 and the convs all run single-tensor passes
        # (the conv kernel still slices per part — the packed concat layout
        # is part-major, not a packing of the logical concat)
        x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        if self.use_scse:
            x = PackedSCSEMulti(self.in_features, dtype=self.dtype,
                                name="SCSEBlock_0")(x)
        y = PackedDoubleConv(self.features, self.in_features,
                             dtype=self.dtype, name="DoubleConv_0")(
            [x], train)
        if self.use_scse:
            y = PackedSCSE(dtype=self.dtype, name="SCSEBlock_1")(y)
        return y


# ---------------------------------------------------------------------------
# CHANNEL-MAJOR packed encoder blocks (EfficientNet high-res segment)
#
# The encoder's high-res stages (stem output through stage 1) run 24-48
# channel tensors at 256-512px: every depthwise / SE / BN pass pays 3-5x
# lane-padded HBM traffic, and XLA's depthwise emitter holds the stages at
# 2-3% MFU (docs/ARCHITECTURE.md "Pallas verdict").  These modules compute
# the SAME math on the channel-major packing (ops/s2d.py space_to_depth_cm)
# where the depthwise becomes a fg=C grouped conv and 1x1s become
# block-diagonal kron kernels.  Param trees match MBConvBlock exactly
# (same Conv_i / BatchNorm_i names and logical shapes), so
# EfficientNetEncoder(packed_highres=True/False) share one checkpoint.
# Receipt: benchmarks/enc_packed_bench.py.
# ---------------------------------------------------------------------------

from enhanced_unet_tpu.ops.s2d import (  # noqa: E402
    dw_kernel_cm,
    dw_s2_kernel_cm,
    pw_kernel_cm,
)


class PackedBatchNormCM(nn.Module):
    """BatchNorm over CHANNEL-MAJOR packed [N,h,w,4C] equal to nn.BatchNorm
    over the logical [N,2h,2w,C] (cf. PackedBatchNorm, which handles the
    natural/position-major layout).  Param/stat tree matches nn.BatchNorm.
    """

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            m4 = jnp.mean(xf, axis=(0, 1, 2))            # [4C]
            v4 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            # channel-major: the four sub-position replicas of logical
            # channel c are contiguous -> reshape (C, 4)
            mean = m4.reshape(c, 4).mean(axis=1)
            var = v4.reshape(c, 4).mean(axis=1) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        inv4 = jnp.repeat(inv, 4).astype(self.dtype)
        b4 = jnp.repeat(bias - mean * inv, 4).astype(self.dtype)
        return x.astype(self.dtype) * inv4 + b4


class _PackedPointwiseCM(nn.Module):
    """1x1 conv on the channel-major packing, param-compatible with nn.Conv
    (param "kernel" of logical shape [1,1,Cin,Cout])."""

    features: int
    in_features: int
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, self.features),
                            jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), pw_kernel_cm(kernel).astype(self.dtype),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + jnp.repeat(bias, 4).astype(y.dtype)
        return y


class _PackedDepthwiseCM(nn.Module):
    """Depthwise 3x3 on the channel-major packing, param-compatible with
    DepthwiseConv (param "kernel" [3,3,1,C]).  stride2_exit computes the
    logical stride-2 depthwise and emits the UNPACKED half-res tensor."""

    features: int
    stride2_exit: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, self.features), jnp.float32)
        x = x.astype(self.dtype)
        if self.stride2_exit:
            # TF-SAME stride-2 k3 at even sizes pads (0,1): see
            # ops/s2d.py dw_s2_kernel_cm
            return jax.lax.conv_general_dilated(
                x, dw_s2_kernel_cm(kernel).astype(self.dtype), (1, 1),
                ((0, 1), (0, 1)), feature_group_count=self.features,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, dw_kernel_cm(kernel).astype(self.dtype), (1, 1), "SAME",
            feature_group_count=self.features,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class PackedMBConvCM(nn.Module):
    """Channel-major packed twin of MBConvBlock (k=3, dilation 1): same
    param tree, same math.  stride2_exit=True implements the stride-2
    transition block — packed input, UNPACKED output (the depthwise
    consumes the packing), with the SE/project stage running plain.
    """

    in_features: int
    out_features: int
    expand_ratio: int
    stride2_exit: bool = False
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xp, train: bool = False):
        ci = iter(range(10))
        bi = iter(range(10))

        def bn_packed(y):
            return PackedBatchNormCM(
                use_running_average=not train, dtype=self.dtype,
                name=f"BatchNorm_{next(bi)}")(y)

        def bn_plain(y):
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name=f"BatchNorm_{next(bi)}")(y)

        residual = xp
        mid = self.in_features * self.expand_ratio
        y = xp
        if self.expand_ratio != 1:
            y = _PackedPointwiseCM(mid, self.in_features, dtype=self.dtype,
                                   name=f"Conv_{next(ci)}")(y)
            y = nn.silu(bn_packed(y))
        y = _PackedDepthwiseCM(mid, stride2_exit=self.stride2_exit,
                               dtype=self.dtype,
                               name=f"Conv_{next(ci)}")(y)
        if self.stride2_exit:
            # unpacked from here on: plain BN/SE/project
            y = nn.silu(bn_plain(y))
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
        else:
            y = nn.silu(bn_packed(y))
            s4 = jnp.mean(y, axis=(1, 2), keepdims=True)      # [N,1,1,4mid]
            s = s4.reshape(s4.shape[0], 1, 1, mid, 4).mean(-1)  # logical pool
        se_c = max(1, int(self.in_features * self.se_ratio))
        s = nn.Conv(se_c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"Conv_{next(ci)}")(s)
        s = nn.silu(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"Conv_{next(ci)}")(s)
        gate = nn.sigmoid(s)
        if self.stride2_exit:
            y = y * gate
            y = nn.Conv(self.out_features, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"Conv_{next(ci)}")(y)
            y = bn_plain(y)
            return y  # stride 2: never a skip
        y = y * jnp.repeat(gate, 4, axis=-1)
        y = _PackedPointwiseCM(self.out_features, mid, dtype=self.dtype,
                               name=f"Conv_{next(ci)}")(y)
        y = bn_packed(y)
        if self.in_features == self.out_features:
            if train and self.drop_rate > 0.0:
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jnp.floor(
                    keep + jax.random.uniform(rng, (y.shape[0], 1, 1, 1))
                ).astype(y.dtype)
                y = y / keep * mask
            y = y + residual
        return y
