"""Multi-scale feature encoders: ResNet-18/34/50 and EfficientNet-B0..B7.

The reference delegates encoders to segmentation_models_pytorch
(models.py:182-192 resnet50, 353-362 resnet18, 430-440 resnet34, 520-529
resnet18, 255-275 efficientnet-b5/b4).  These are clean-room Flax
implementations of the same architectures, emitting the smp-style feature
pyramid: a list [f0..f5] where f_i has stride 2^i (f0 is the input), so the
decoders can be written once against a uniform contract.

Pretrained ImageNet weights are not available in this offline environment;
models train from scratch (documented deviation — BASELINE.md).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhanced_unet_tpu.models.blocks import ConvBNAct

Dtype = Any


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------

class BasicResBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBNAct(self.features, (3, 3), self.strides, use_bias=False,
                      padding="torch", dtype=self.dtype)(x, train)
        y = ConvBNAct(self.features, (3, 3), act=None, use_bias=False,
                      padding="torch", dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = ConvBNAct(self.features, (1, 1), self.strides, act=None,
                                 use_bias=False, dtype=self.dtype)(x, train)
        return nn.relu(y + residual)


class BottleneckResBlock(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBNAct(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x, train)
        y = ConvBNAct(self.features, (3, 3), self.strides, use_bias=False,
                      padding="torch", dtype=self.dtype)(y, train)
        y = ConvBNAct(self.features * 4, (1, 1), act=None, use_bias=False,
                      dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = ConvBNAct(self.features * 4, (1, 1), self.strides,
                                 act=None, use_bias=False,
                                 dtype=self.dtype)(x, train)
        return nn.relu(y + residual)


_RESNET_SPECS = {
    "resnet18": (BasicResBlock, (2, 2, 2, 2)),
    "resnet34": (BasicResBlock, (3, 4, 6, 3)),
    "resnet50": (BottleneckResBlock, (3, 4, 6, 3)),
}


class ResNetEncoder(nn.Module):
    """torchvision-style ResNet emitting [input, s2, s4, s8, s16, s32]."""

    variant: str = "resnet50"
    depth: int = 5  # how many downsampling stages to run (smp encoder_depth)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        block_cls, layers = _RESNET_SPECS[self.variant]
        feats = [x]
        # stem: 7x7/2 conv + BN + ReLU (stride-2 feature), then 3x3/2 maxpool
        y = ConvBNAct(64, (7, 7), (2, 2), use_bias=False, padding="torch",
                      dtype=self.dtype)(x, train)
        feats.append(y)
        if self.depth < 2:
            return feats
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for stage, (w, n_blocks) in enumerate(zip(widths, layers)):
            if stage + 2 > self.depth:
                break
            for b in range(n_blocks):
                strides = (2, 2) if (b == 0 and stage > 0) else (1, 1)
                y = block_cls(w, strides, dtype=self.dtype)(y, train)
            feats.append(y)
        return feats


# ---------------------------------------------------------------------------
# EfficientNet
# ---------------------------------------------------------------------------

# base (B0) stage spec: (expand_ratio, channels, repeats, stride, kernel)
_EFFNET_BASE = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# (width_mult, depth_mult)
_EFFNET_SCALE = {
    # structure-identical minimal variant (1 block per stage, 8-80 ch):
    # same stage count / stride pattern / taps / SE / stochastic-depth as
    # the real scalings, at a fraction of the graph — used by compile-bound
    # harnesses (the virtual-CPU-mesh dryrun, the flagship training oracle)
    "efficientnet-tiny": (0.25, 0.25),
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
    "efficientnet-b5": (1.6, 2.2),
    "efficientnet-b6": (1.8, 2.6),
    "efficientnet-b7": (2.0, 3.1),
}


def _round_filters(c: int, width_mult: float, divisor: int = 8) -> int:
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


class DepthwiseConv(nn.Module):
    """Depthwise kxk conv, param-compatible with flax nn.Conv
    (kernel [k,k,1,C], feature_group_count=C).

    shift_fma=True computes it as k^2 shifted FMAs (elementwise adds over a
    SAME-padded tensor) instead of lax.conv.  Measured SLOWER in-situ on
    v5e (23 vs 17 ms for effnet-b5 stages 0-1 despite winning standalone —
    the padded materialisation defeats XLA's fusion), so the default stays
    lax.conv; the module exists to pin the depthwise param name and as the
    routing point for fused kernels.

    dilation > 1 supports the output_stride-16 encoder mode (smp
    make_dilated equivalent) used by the DeepLabV3+ branch."""

    features: int
    kernel: int
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1
    shift_fma: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, 1, self.features), jnp.float32)
        kb = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if not self.shift_fma or self.strides != (1, 1) or self.dilation != 1:
            return jax.lax.conv_general_dilated(
                x, kb, self.strides, "SAME", feature_group_count=self.features,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        p = k // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        y = None
        for u in range(k):
            for v in range(k):
                t = jax.lax.dynamic_slice(
                    xp, (0, u, v, 0), x.shape) * kb[u, v, 0]
                y = t if y is None else y + t
        return y


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation (EfficientNet unit).

    BN uses eps 1e-3 (torch efficientnet convention).  Stochastic depth is
    applied on residual blocks when train=True.
    """

    in_features: int
    out_features: int
    expand_ratio: int
    strides: Tuple[int, int]
    kernel: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dilation: int = 1
    dtype: Dtype = jnp.bfloat16

    def _pallas_infer(self, x_nchw):
        """Fused two-pass Pallas inference path (ops/pallas/mbconv.py) on
        an NCHW input, reading this block's own param tree — the stock
        path below stays bit-identical and is the only one used for
        init/training/CPU (the kernel has no VJP)."""
        from enhanced_unet_tpu.ops.pallas.mbconv import (
            fold_mbconv_weights,
            mbconv_infer_nchw,
        )

        P = self.variables["params"]
        S = self.variables["batch_stats"]

        def bn(name):
            return {"scale": P[name]["scale"], "bias": P[name]["bias"],
                    "mean": S[name]["mean"], "var": S[name]["var"]}

        if self.expand_ratio != 1:
            w = {"expand": P["Conv_0"]["kernel"], "bn0": bn("BatchNorm_0"),
                 "dw": P["Conv_1"]["kernel"], "bn1": bn("BatchNorm_1"),
                 "se1": P["Conv_2"], "se2": P["Conv_3"],
                 "project": P["Conv_4"]["kernel"], "bn2": bn("BatchNorm_2")}
        else:
            w = {"expand": None, "bn0": None,
                 "dw": P["Conv_0"]["kernel"], "bn1": bn("BatchNorm_0"),
                 "se1": P["Conv_1"], "se2": P["Conv_2"],
                 "project": P["Conv_3"]["kernel"], "bn2": bn("BatchNorm_1")}
        p = fold_mbconv_weights(w, x_nchw.shape[2], x_nchw.shape[3])
        residual = (self.strides == (1, 1)
                    and self.in_features == self.out_features)
        return mbconv_infer_nchw(x_nchw.astype(jnp.bfloat16), p,
                                 residual=residual)

    @nn.compact
    def __call__(self, x, train: bool = False, nchw: bool = False):
        if nchw:
            # only reachable at inference on an already-initialised tree
            # (EfficientNetEncoder routes it); params are read, not defined
            return self._pallas_infer(x)
        # explicit names reproduce flax's auto-numbering from when the
        # depthwise was a plain nn.Conv, so checkpoints and the torch
        # importer (convert/torch_import.py) see an unchanged param tree
        ci = iter(range(10))
        bi = iter(range(10))

        def bn(y):
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name=f"BatchNorm_{next(bi)}")(y)

        residual = x
        mid = self.in_features * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"Conv_{next(ci)}")(y)
            y = nn.silu(bn(y))
        # depthwise (see DepthwiseConv for the TPU lowering choice)
        y = DepthwiseConv(mid, self.kernel, self.strides,
                          dilation=self.dilation, dtype=self.dtype,
                          name=f"Conv_{next(ci)}")(y)
        y = nn.silu(bn(y))
        # squeeze-excitation (the spatial mean fuses into XLA's depthwise
        # emitter — an MXU ones-matmul pool was benchmarked neutral here)
        se_c = max(1, int(self.in_features * self.se_ratio))
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"Conv_{next(ci)}")(s)
        s = nn.silu(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"Conv_{next(ci)}")(s)
        y = y * nn.sigmoid(s)
        # project
        y = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"Conv_{next(ci)}")(y)
        y = bn(y)
        if self.strides == (1, 1) and self.in_features == self.out_features:
            if train and self.drop_rate > 0.0:
                # stochastic depth (per-sample drop of the residual branch)
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jnp.floor(
                    keep + jax.random.uniform(rng, (y.shape[0], 1, 1, 1))
                ).astype(y.dtype)
                y = y / keep * mask
            y = y + residual
        return y


class EfficientNetEncoder(nn.Module):
    """EfficientNet feature pyramid [input, s2, s4, s8, s16, s32].

    The stride-2 feature is the STEM output (before the stage-0 MBConvs),
    matching smp's EfficientNet encoder stage boundaries (b5 channels
    (3, 48, 40, 64, 176, 512)) so reference checkpoints and the reference's
    decoder channel arithmetic transfer exactly.

    output_stride=16 reproduces smp's encoder.make_dilated: the last
    stride-2 transition (entering stage 5) keeps stride 1 and stages 5-6
    run their depthwise convs with dilation 2, so the deepest feature stays
    at stride 16 — what smp.DeepLabV3Plus(output_stride=16) does.
    """

    variant: str = "efficientnet-b5"
    drop_connect_rate: float = 0.2
    output_stride: int = 32
    # profiling ablation (benchmarks/): stop after this many stages (7=all)
    max_stages: int = 7
    # route high-res stride-1 blocks through the fused Pallas MBConv at
    # inference on TPU (ops/pallas/mbconv.py); stock XLA otherwise.
    # "force" routes regardless of backend (CPU interpret-mode tests).
    # CAVEAT: the Pallas kernel has no VJP — differentiating an eval-mode
    # (train=False) forward on TPU (e.g. saliency maps) fails; set
    # pallas_infer=False for that use.  Training (train=True) always takes
    # the stock XLA path and is unaffected.
    pallas_infer: Any = True
    # run stages 0-1 (the 2-3%-MFU high-res segment) on the channel-major
    # s2d packing: depthwise -> fg=C grouped conv, 1x1 -> block-diagonal
    # kron kernel — same math, same param tree (PackedMBConvCM), ~4x less
    # lane-padded HBM traffic.  Receipt: benchmarks/enc_packed_bench.py.
    packed_highres: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        width_mult, depth_mult = _EFFNET_SCALE[self.variant]
        feats = [x]

        stem_c = _round_filters(32, width_mult)
        y = nn.Conv(stem_c, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(y)
        y = nn.silu(y)
        # stride-2 tap = stem output (smp stage boundary; b5: 48ch)
        feats.append(y)

        total_blocks = sum(_round_repeats(r, depth_mult) for _, _, r, _, _ in _EFFNET_BASE)
        block_idx = 0
        in_c = stem_c
        # Fused-Pallas routing: high-res stride-1 k3 blocks (stages 0-1)
        # run the two-pass NCHW kernel at inference on TPU; XLA's layouts
        # for these shapes are 2-3% MFU (docs/ARCHITECTURE.md).  Stays on
        # the stock path for init/training/CPU and everything else.
        pallas_ok = (bool(self.pallas_infer) and not train
                     and not self.is_initializing()
                     and (self.pallas_infer == "force"
                          or jax.default_backend() == "tpu"))
        is_nchw = False  # current layout of y

        def to_nhwc(y, is_nchw):
            return (jnp.transpose(y, (0, 2, 3, 1)), False) if is_nchw else (y, False)

        # stride-2 transitions occur entering stages 1, 2, 3, 5 (0-indexed);
        # the smp stage boundaries tap features just before the transitions
        # entering stages 2, 3, 5 (the stride-2 tap is the stem, above).
        tap_stages = {2, 3, 5}
        # output_stride 16: the transition entering stage 5 keeps stride 1
        # and stages 5-6 dilate their depthwise convs (smp make_dilated)
        dilated_stages = {5, 6} if self.output_stride == 16 else set()
        from enhanced_unet_tpu.models.packed_blocks import PackedMBConvCM
        from enhanced_unet_tpu.ops.s2d import (
            depth_to_space_cm,
            space_to_depth_cm,
        )

        packed_now = False  # y currently channel-major packed
        for stage_idx, (e, c, r, s, k) in enumerate(_EFFNET_BASE):
            if stage_idx >= self.max_stages:
                break
            out_c = _round_filters(c, width_mult)
            repeats = _round_repeats(r, depth_mult)
            # the packed segment: stages 0-1 (k3, never dilated)
            in_segment = (bool(self.packed_highres) and stage_idx <= 1
                          and k == 3 and stage_idx not in dilated_stages)
            for b in range(repeats):
                strides = (s, s) if b == 0 else (1, 1)
                dilation = 1
                if stage_idx in dilated_stages:
                    strides = (1, 1)
                    dilation = 2
                if b == 0 and stage_idx in tap_stages:
                    y, is_nchw = to_nhwc(y, is_nchw)
                    if packed_now:
                        y = depth_to_space_cm(y)
                        packed_now = False
                    feats.append(y)
                drop = self.drop_connect_rate * block_idx / max(total_blocks, 1)
                # evenness must be tested on the true spatial dims: y may
                # still be NCHW here (left by a Pallas-eligible block)
                h_dim, w_dim = (2, 3) if is_nchw else (1, 2)
                if in_segment and not packed_now and strides == (1, 1) \
                        and y.shape[h_dim] % 2 == 0 and y.shape[w_dim] % 2 == 0:
                    y, is_nchw = to_nhwc(y, is_nchw)
                    y = space_to_depth_cm(y)
                    packed_now = True
                if packed_now:
                    y = PackedMBConvCM(
                        in_c, out_c, e, stride2_exit=strides == (2, 2),
                        drop_rate=drop, dtype=self.dtype,
                        name=f"MBConvBlock_{block_idx}")(y, train)
                    if strides == (2, 2):
                        # the stride-2 depthwise consumed the packing;
                        # re-pack for the rest of the segment if possible
                        packed_now = False
                        if (b + 1 < repeats and y.shape[1] % 2 == 0
                                and y.shape[2] % 2 == 0):
                            y = space_to_depth_cm(y)
                            packed_now = True
                    in_c = out_c
                    block_idx += 1
                    continue
                block = MBConvBlock(
                    in_c, out_c, e, strides, k,
                    drop_rate=drop, dilation=dilation, dtype=self.dtype,
                    name=f"MBConvBlock_{block_idx}",
                )
                # stage 0 only: the expand (ratio-6) blocks of stage 1
                # measured ~4x SLOWER in the fused kernel (per-block trace
                # in docs/ARCHITECTURE.md "Pallas verdict"); the ratio-1
                # stage-0 blocks win (~1.6 vs ~2.5 ms at b16)
                # gate: H multiple of 8 (sublane block rows) AND W multiple
                # of 128 (lane width — Mosaic rejects the kernel's
                # [mid, bh*w] reshape for narrower maps, observed at 32x32)
                h_dim, w_dim = (2, 3) if is_nchw else (1, 2)
                eligible = (pallas_ok and stage_idx == 0 and k == 3
                            and strides == (1, 1)
                            and y.shape[h_dim] % 8 == 0
                            and y.shape[w_dim] % 128 == 0)
                if eligible:
                    if not is_nchw:
                        y = jnp.transpose(y, (0, 3, 1, 2))
                        is_nchw = True
                    y = block(y, train, nchw=True)
                else:
                    y, is_nchw = to_nhwc(y, is_nchw)
                    y = block(y, train)
                in_c = out_c
                block_idx += 1
        y, is_nchw = to_nhwc(y, is_nchw)
        if packed_now:
            y = depth_to_space_cm(y)
        feats.append(y)
        return feats


def build_encoder(name: str, depth: int = 5, output_stride: int = 32,
                  dtype: Dtype = jnp.bfloat16):
    if name.startswith("resnet"):
        return ResNetEncoder(variant=name, depth=depth, dtype=dtype)
    if name.startswith("efficientnet"):
        return EfficientNetEncoder(variant=name, output_stride=output_stride,
                                   dtype=dtype)
    raise ValueError(f"unknown encoder {name}")
