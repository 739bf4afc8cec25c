"""EnhancedUNet — the flagship dual-branch multi-scale fusion model.

Parity target: reference models.py:246-343.
- main branch: UNet++ (nested dense-skip decoder, scSE attention) over an
  EfficientNet-B5 encoder (smp.UnetPlusPlus equivalent, models.py:255-266)
- aux branch: DeepLabV3+ (ASPP context head + low-level fusion decoder)
  over EfficientNet-B4 (models.py:268-275)
- fusion: concat both logit maps -> attention gate
  (conv3-BN-GELU-conv1-BN-sigmoid, models.py:278-285) -> 3-conv fusion head
  with dropout (models.py:287-300) + 1x1 residual path (models.py:302)
- aux outputs exposed for deep supervision (models.py:329-333,341-343)

TPU-first: NHWC, bf16 compute; both branch logit maps are produced at full
input resolution so deep supervision needs no resize.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from enhanced_unet_tpu.models.blocks import (
    ASPP,
    ConvBNAct,
    DoubleConv,
    SCSEBlock,
    SeparableConvBNAct,
)
from enhanced_unet_tpu.models.encoders import EfficientNetEncoder
from enhanced_unet_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_align_corners,
    resize_bilinear_align_corners_s2d,
    upsample2x_nearest,
)


class EnhancedUNetBasic(nn.Module):
    """The reference's non-smp EnhancedUNet fallback (models.py:304-314).

    BasicUNet backbone plus a residual "enhance" head applied to the
    logits: conv3(C->64)-BN-ReLU-conv1(64->C), added back residually
    (models.py:334-339: `out = out + self.enhance(out)`).  No aux outputs
    (the fallback sets _aux_outputs=None, models.py:313).
    """

    num_classes: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        from enhanced_unet_tpu.models.unet import BasicUNet

        out, _ = BasicUNet(num_classes=self.num_classes, dtype=self.dtype)(
            x, train
        )
        y = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(out.astype(self.dtype))
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        return (out + y.astype(jnp.float32)), {}


class NestedBlock(nn.Module):
    """UNet++ node, smp-exact DecoderBlock (smp decoders/unetplusplus):

        up = nearest_2x(below)
        cat = concat([up, same_level[j-1], ..., same_level[1], enc])
        cat -> attention1 (scSE) -> conv1 -> conv2 -> attention2 (scSE)

    The concat puts the upsampled deeper node FIRST, then the same-row
    dense skips newest-to-oldest, encoder feature last — torch.cat([x,
    skip]) with smp's skip ordering — so imported conv1 kernels line up
    without permutation."""

    features: int
    use_scse: bool = True  # ablation knob for profiling (benchmarks/)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, same_level, below, train: bool = False):
        up = upsample2x_nearest(below)  # smp UNet++ decoder uses nearest
        parts = [up] + [f.astype(up.dtype) for f in same_level[::-1]]
        y = jnp.concatenate(parts, axis=-1)
        if self.use_scse:
            y = SCSEBlock(dtype=self.dtype, name="SCSEBlock_0")(y)
        y = DoubleConv(self.features, dtype=self.dtype,
                       name="DoubleConv_0")(y, train)
        if self.use_scse:
            y = SCSEBlock(dtype=self.dtype, name="SCSEBlock_1")(y)
        return y


class UNetPlusPlus(nn.Module):
    """Nested UNet decoder over an EfficientNet encoder, smp-exact
    (smp decoders/unetplusplus/decoder.py UnetPlusPlusDecoder).

    Grid X[i][j]: i = resolution row (0 = stride 2 ... 4 = stride 32),
    j = dense-skip column.  X[i][0] are encoder features; X[i][j] fuses
    up(X[i+1][j-1]) with all X[i][<j].  smp's channel plan: INTERMEDIATE
    nodes (j < 4-i) output the row's encoder skip width (their out_ch is
    `skip_channels[layer]`); only the FINAL node of each row (j == 4-i)
    uses decoder_channels[3-i].  The head consumes X[0][4] through one
    more DecoderBlock (2x up, no skip, decoder_channels[4]) and a 3x3
    segmentation conv.  smp's node x_{d}_{l} == X[3-l][l-d+1].
    """

    num_classes: int = 3
    encoder_name: str = "efficientnet-b5"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    use_scse: bool = True  # ablation knob for profiling (benchmarks/)
    # ablation knob (benchmarks/profile_r2.py): False replaces the full-res
    # DoubleConv tail with a stride-2 logits conv + bilinear x2 (NOT parity)
    full_res_head: bool = True
    # compute row 0 (stride 2) and the full-res head in space-to-depth
    # packed layout — EXACTLY the same math and the same param tree, but
    # without the 4-8x lane-padding waste of small-channel tensors at
    # 256-512px (ops/s2d.py; tests/test_s2d.py pins equivalence)
    packed_decoder: bool = True
    remat: bool = False
    # return the head logits still in the natural s2d packing
    # [N,H/2,W/2,4*num_classes] (the packed fusion gate consumes them
    # without ever materialising the full-res 3-channel tensor); the
    # caller depth_to_spaces when it needs full resolution
    packed_output: bool = False
    # encoder stochastic depth (efficientnet-pytorch default 0.2); 0
    # disables — deterministic harnesses (the cross-framework training
    # oracle) need dropout off symmetrically
    drop_connect_rate: float = 0.2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from enhanced_unet_tpu.models.packed_blocks import (
            PackedConv3x3,
            PackedDoubleConv,
            PackedNestedBlock,
            PackedSCSE,
        )
        from enhanced_unet_tpu.ops.s2d import depth_to_space, space_to_depth

        packed = self.packed_decoder and self.full_res_head
        enc_cls = (
            nn.remat(EfficientNetEncoder, static_argnums=(2,))
            if self.remat else EfficientNetEncoder
        )
        feats = enc_cls(variant=self.encoder_name,
                        drop_connect_rate=self.drop_connect_rate,
                        dtype=self.dtype)(x, train)
        enc_ch = [f.shape[-1] for f in feats[1:]]  # rows 0..4 = strides 2..32
        grid = {(i, 0): feats[i + 1] for i in range(5)}
        width = {(i, 0): enc_ch[i] for i in range(5)}
        if packed:
            grid[(0, 0)] = space_to_depth(grid[(0, 0)])
        block_idx = 0
        for j in range(1, 5):
            for i in range(0, 5 - j):
                is_final = j == 4 - i
                feat_c = (self.decoder_channels[3 - i] if is_final
                          else enc_ch[i])
                name = f"NestedBlock_{block_idx}"
                same = [grid[(i, k)] for k in range(j)]
                below = grid[(i + 1, j - 1)]
                if packed and i == 0:
                    # logical channels in smp concat order:
                    # [up(below), same[j-1], ..., same[1], same[0]=enc]
                    in_features = ([width[(i + 1, j - 1)]]
                                   + [width[(i, k)] for k in
                                      range(j - 1, -1, -1)])
                    grid[(i, j)] = PackedNestedBlock(
                        feat_c, in_features, use_scse=self.use_scse,
                        dtype=self.dtype, name=name,
                    )(same, below, train)
                else:
                    grid[(i, j)] = NestedBlock(
                        feat_c, use_scse=self.use_scse,
                        dtype=self.dtype, name=name,
                    )(same, below, train)
                width[(i, j)] = feat_c
                block_idx += 1
        y = grid[(0, 4)]  # stride 2 (packed: [N,H/4,W/4,4*dec_ch[3]])
        head_c = self.decoder_channels[4]
        if not self.full_res_head:
            logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                             dtype=self.dtype, param_dtype=jnp.float32)(y)
            logits = resize_bilinear(logits.astype(jnp.float32), x.shape[1:3])
            return space_to_depth(logits) if self.packed_output else logits
        # final up block to full resolution (smp's x_0_4: no skip, so no
        # attention1; conv1+conv2+attention2, then the 3x3 head conv)
        if packed:
            # the nearest-up of the logical row-0 output is folded into the
            # first conv's kernel (fused_up_kernel) — the full-res tensor
            # is never materialised
            y = PackedDoubleConv(
                head_c, (self.decoder_channels[3],),
                dtype=self.dtype, name="DoubleConv_0")(
                [], train, up_part=depth_to_space(y))
            if self.use_scse:
                y = PackedSCSE(dtype=self.dtype, name="SCSEBlock_0")(y)
            logits_p = PackedConv3x3(
                self.num_classes, head_c, use_bias=True,
                dtype=self.dtype, name="Conv_0")(y, (head_c,))
            if self.packed_output:
                return logits_p.astype(jnp.float32)
            return depth_to_space(logits_p).astype(jnp.float32)
        y = upsample2x_nearest(y)
        y = DoubleConv(head_c, dtype=self.dtype, name="DoubleConv_0")(y, train)
        if self.use_scse:
            y = SCSEBlock(dtype=self.dtype, name="SCSEBlock_0")(y)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="Conv_0")(y)
        if self.packed_output:
            return space_to_depth(logits.astype(jnp.float32))
        return logits.astype(jnp.float32)


class DeepLabV3Plus(nn.Module):
    """ASPP context head + low-level feature fusion decoder, smp-exact
    (smp decoders/deeplabv3/decoder.py DeepLabV3PlusDecoder, the structure
    the reference instantiates with all defaults at models.py:268-275):

        ASPP(separable, Dropout 0.5) -> SeparableConv3x3-BN-ReLU
        -> UpsamplingBilinear2d(x4, align_corners=True) -> cat with
        block1(1x1-BN-ReLU on the stride-4 feature, 48ch)
        -> block2 (SeparableConv3x3-BN-ReLU, 256) -> 1x1 head
        -> UpsamplingBilinear2d(x4)

    output_stride=16 matches smp.DeepLabV3Plus's default: the encoder's
    last downsampling is replaced by dilation, so ASPP sees stride-16
    features with rates (12, 24, 36).
    """

    num_classes: int = 3
    encoder_name: str = "efficientnet-b4"
    aspp_channels: int = 256
    output_stride: int = 16
    remat: bool = False
    # emit the final x4-upsampled logits in the natural s2d packing
    # [N,H/2,W/2,4*num_classes] via the phase-sampled align-corners resize
    # (ops/resize.py resize_bilinear_align_corners_s2d) — same math, no
    # full-res 3-channel tensor
    packed_output: bool = False
    # see UNetPlusPlus: 0 disables for deterministic harnesses
    drop_connect_rate: float = 0.2
    aspp_dropout: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_cls = (
            nn.remat(EfficientNetEncoder, static_argnums=(2,))
            if self.remat else EfficientNetEncoder
        )
        feats = enc_cls(variant=self.encoder_name,
                        output_stride=self.output_stride,
                        drop_connect_rate=self.drop_connect_rate,
                        dtype=self.dtype)(x, train)
        y = ASPP(self.aspp_channels, dropout=self.aspp_dropout,
                 dtype=self.dtype)(feats[-1], train)
        y = SeparableConvBNAct(self.aspp_channels, dtype=self.dtype)(y, train)
        low = feats[2]  # stride 4
        y = resize_bilinear_align_corners(y, low.shape[1:3]).astype(low.dtype)
        low = ConvBNAct(48, (1, 1), dtype=self.dtype)(low, train)  # block1
        y = jnp.concatenate([y, low], axis=-1)
        y = SeparableConvBNAct(256, dtype=self.dtype)(y, train)  # block2
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32)(y)
        if self.packed_output:
            return resize_bilinear_align_corners_s2d(
                logits.astype(jnp.float32), x.shape[1:3])
        return resize_bilinear_align_corners(
            logits.astype(jnp.float32), x.shape[1:3])


class EnhancedUNet(nn.Module):
    """Dual-branch fusion model (reference models.py:246-343).

    fusion_stride: resolution the fusion head runs at.  1 reproduces the
    reference exactly (3x3 convs 256->128->64 at FULL input resolution —
    57% of the model's FLOPs, models.py:287-300); 2 computes the identical
    head on 2x-downsampled branch logits and bilinearly upsamples the
    result, cutting total forward FLOPs ~2.3x with the same fusion
    capability (gate + head + residual see the same 6-channel signal).
    """

    num_classes: int = 3
    fusion_dropout: Tuple[float, float] = (0.2, 0.15)
    fusion_stride: int = 1
    # (UNet++ branch, DeepLabV3+ branch) encoders; the reference pairing is
    # (b5, b4) (models.py:255-275).  Overridable so compile-bound harnesses
    # (virtual-CPU-mesh dryruns) can run the identical dual-branch structure
    # on a smaller encoder.
    encoder_names: Tuple[str, str] = ("efficientnet-b5", "efficientnet-b4")
    # jax.checkpoint the encoders: trades recompute for activation memory —
    # useful for large-batch/large-resolution training (512x512 training is
    # HBM-bound on v5e)
    remat: bool = False
    # route the UNet++ decoder through the s2d packed layout (ModelConfig
    # .packed_decoder; same params/math either way, tests/test_s2d.py)
    packed_decoder: bool = True
    # compute the fusion ENTRY (branch-logit concat -> attention gate ->
    # residual 1x1) in the natural s2d packing: the [N,H,W,6] full-res
    # fusion tensors — the measured source of ~10 ms/iter of XLA layout
    # copies at b16 (benchmarks/op_trace.py) — never materialise; the one
    # depth_to_space happens right before the 256-channel head convs,
    # which stay full-res (they are at their MXU roofline; zero-stuffing
    # would 4x their FLOPs).  Same params, same math (tests/test_s2d.py
    # pins forward equivalence).  Active only with packed_decoder and
    # fusion_stride == 1 on even-sized inputs.
    #
    # MEASURED AND RETIRED as the default (r5 receipt, v5e b64/512^2
    # same-session A/B): packed 109.62 vs unpacked 110.49 img/s — the
    # phase-merge concat + the depth_to_space feeding the head cost what
    # the eliminated relayouts saved.  Kept as a tested knob
    # (BENCH_PACKED_FUSION) because the balance may differ at other
    # batch/resolution points.
    packed_fusion: bool = False
    # 0 disables encoder stochastic depth + ASPP dropout — deterministic
    # harnesses (the cross-framework training oracle) turn ALL stochastic
    # regularisers off symmetrically (with fusion_dropout=(0, 0))
    drop_connect_rate: float = 0.2
    aspp_dropout: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Dict]:
        packed_fusion = (
            self.packed_fusion and self.packed_decoder
            and self.fusion_stride == 1
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        )
        out_main = UNetPlusPlus(self.num_classes, remat=self.remat,
                                encoder_name=self.encoder_names[0],
                                packed_decoder=self.packed_decoder,
                                packed_output=packed_fusion,
                                drop_connect_rate=self.drop_connect_rate,
                                dtype=self.dtype)(x, train)
        out_aux = DeepLabV3Plus(self.num_classes, remat=self.remat,
                                encoder_name=self.encoder_names[1],
                                packed_output=packed_fusion,
                                drop_connect_rate=self.drop_connect_rate,
                                aspp_dropout=self.aspp_dropout,
                                dtype=self.dtype)(x, train)

        if packed_fusion:
            logits, aux = self._packed_fusion(out_main, out_aux, train)
            return logits, aux

        fused = jnp.concatenate([out_main, out_aux], axis=-1)  # [N,H,W,6]
        full_hw = fused.shape[1:3]
        if self.fusion_stride > 1:
            fused = resize_bilinear(
                fused,
                (full_hw[0] // self.fusion_stride,
                 full_hw[1] // self.fusion_stride),
            )
        fc = fused.shape[-1]

        # attention gate (models.py:278-285)
        a = nn.Conv(fc // 2, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="Conv_0")(fused.astype(self.dtype))
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="BatchNorm_0")(a)
        # reference nn.GELU() is exact erf GELU; flax default is tanh approx
        a = nn.gelu(a, approximate=False)
        a = nn.Conv(fc, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="Conv_1")(a)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="BatchNorm_1")(a)
        attention = nn.sigmoid(a.astype(jnp.float32))
        gated = fused * attention

        logits = self._fusion_head(gated, train)
        if self.fusion_stride > 1:
            logits = resize_bilinear(logits, full_hw)

        aux = {"unetpp": out_main, "deeplab": out_aux}
        return logits, aux

    def _fusion_head(self, gated, train: bool):
        """fusion head + residual path (models.py:287-302), full-res."""
        y = gated.astype(self.dtype)
        y = ConvBNAct(256, use_bias=False, dtype=self.dtype,
                      name="ConvBNAct_0")(y, train)
        y = nn.Dropout(self.fusion_dropout[0], deterministic=not train,
                       name="Dropout_0")(y)
        y = ConvBNAct(128, use_bias=False, dtype=self.dtype,
                      name="ConvBNAct_1")(y, train)
        y = nn.Dropout(self.fusion_dropout[1], deterministic=not train,
                       name="Dropout_1")(y)
        y = ConvBNAct(64, use_bias=False, dtype=self.dtype,
                      name="ConvBNAct_2")(y, train)
        head = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32,
                       name="Conv_2")(y).astype(jnp.float32)
        # residual path (models.py:302, 326-328)
        residual = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                           param_dtype=jnp.float32, name="Conv_3")(gated)
        return head + residual

    def _packed_fusion(self, main_p, aux_p, train: bool):
        """Fusion entry in the natural s2d packing: concat + attention gate
        + residual run at half resolution with 4x the lanes; the only
        depth_to_space feeds the (full-res, roofline-bound) 256-channel
        head convs.  Identical math and param tree to the unpacked branch
        above (PackedConv3x3/PackedConv1x1/PackedBatchNorm are exact
        rewrites; tests/test_s2d.py)."""
        from enhanced_unet_tpu.models.packed_blocks import (
            PackedBatchNorm,
            PackedConv1x1,
            PackedConv3x3,
        )
        from enhanced_unet_tpu.ops.s2d import depth_to_space

        n, h2, w2, _ = main_p.shape
        c = self.num_classes
        # natural packing of the logical channel concat [main, aux]: per
        # phase, main's channels then aux's
        fused_p = jnp.concatenate(
            [main_p.reshape(n, h2, w2, 4, c),
             aux_p.reshape(n, h2, w2, 4, c)],
            axis=-1).reshape(n, h2, w2, 4 * 2 * c)
        fc = 2 * c

        # attention gate (models.py:278-285), packed
        a = PackedConv3x3(fc // 2, fc, use_bias=False, dtype=self.dtype,
                          name="Conv_0")(fused_p.astype(self.dtype), (fc,))
        a = PackedBatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            name="BatchNorm_0")(a)
        a = nn.gelu(a, approximate=False)
        a = PackedConv1x1(fc, fc // 2, use_bias=False, dtype=self.dtype,
                          name="Conv_1")(a)
        a = PackedBatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            name="BatchNorm_1")(a)
        attention = nn.sigmoid(a.astype(jnp.float32))
        gated_p = fused_p * attention

        gated = depth_to_space(gated_p)  # full-res entry to the head convs
        y = gated.astype(self.dtype)
        y = ConvBNAct(256, use_bias=False, dtype=self.dtype,
                      name="ConvBNAct_0")(y, train)
        y = nn.Dropout(self.fusion_dropout[0], deterministic=not train,
                       name="Dropout_0")(y)
        y = ConvBNAct(128, use_bias=False, dtype=self.dtype,
                      name="ConvBNAct_1")(y, train)
        y = nn.Dropout(self.fusion_dropout[1], deterministic=not train,
                       name="Dropout_1")(y)
        y = ConvBNAct(64, use_bias=False, dtype=self.dtype,
                      name="ConvBNAct_2")(y, train)
        head = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32,
                       name="Conv_2")(y).astype(jnp.float32)
        # residual path, packed (models.py:302): block-diagonal 1x1
        residual_p = PackedConv1x1(c, fc, use_bias=True, dtype=jnp.float32,
                                   name="Conv_3")(gated_p)
        logits = head + depth_to_space(residual_p)

        aux = {"unetpp": depth_to_space(main_p),
               "deeplab": depth_to_space(aux_p)}
        return logits, aux
