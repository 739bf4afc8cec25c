"""Torch mirrors of segmentation_models_pytorch (smp) modules with
state-dict-EXACT naming, used as oracles for the full reference-checkpoint
importer (convert/torch_import.py) and the smp-exact Flax decoders.

The reference's models are smp nets (models.py:182-192, 255-275;
requirements.txt pins segmentation-models-pytorch>=0.3.0).  These mirrors
restate smp 0.3.x module structures:
- base/modules.py: Conv2dReLU, SCSEModule, Attention, SeparableConv2d
- unet/decoder.py: DecoderBlock (shared by unet++)
- unetplusplus/decoder.py: UnetPlusPlusDecoder
- deeplabv3/decoder.py: ASPP, ASPPSeparableConv, ASPPPooling,
  DeepLabV3PlusDecoder
- base/heads.py: SegmentationHead
- encoders/efficientnet.py boundaries via TorchEfficientNet below
  (efficientnet-pytorch layout, smp get_stages taps, make_dilated).

state_dict() keys from these mirrors match what a real reference .pth
contains, so `convert_enhanced_unet` can be tested end to end without smp
installed.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# smp base/modules.py
# ---------------------------------------------------------------------------

class SCSEModule(nn.Module):
    def __init__(self, in_channels, reduction=16):
        super().__init__()
        mid = max(in_channels // reduction, 1)  # smp never hits the clamp
        self.cSE = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(in_channels, mid, 1),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, in_channels, 1),
            nn.Sigmoid(),
        )
        self.sSE = nn.Sequential(nn.Conv2d(in_channels, 1, 1), nn.Sigmoid())

    def forward(self, x):
        return x * self.cSE(x) + x * self.sSE(x)


class Attention(nn.Module):
    def __init__(self, name, **params):
        super().__init__()
        if name is None:
            self.attention = nn.Identity()
        elif name == "scse":
            self.attention = SCSEModule(**params)
        else:
            raise ValueError(name)

    def forward(self, x):
        return self.attention(x)


class Conv2dReLU(nn.Sequential):
    def __init__(self, in_channels, out_channels, kernel_size, padding=0,
                 stride=1, use_batchnorm=True):
        conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                         stride=stride, padding=padding,
                         bias=not use_batchnorm)
        relu = nn.ReLU(inplace=True)
        bn = nn.BatchNorm2d(out_channels)
        super().__init__(conv, bn, relu)


class SeparableConv2d(nn.Sequential):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, bias=True):
        dephtwise_conv = nn.Conv2d(
            in_channels, in_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=in_channels,
            bias=False)
        pointwise_conv = nn.Conv2d(in_channels, out_channels, 1, bias=bias)
        super().__init__(dephtwise_conv, pointwise_conv)


# ---------------------------------------------------------------------------
# smp unet/decoder.py DecoderBlock + unetplusplus/decoder.py
# ---------------------------------------------------------------------------

class DecoderBlock(nn.Module):
    def __init__(self, in_channels, skip_channels, out_channels,
                 use_batchnorm=True, attention_type=None):
        super().__init__()
        self.conv1 = Conv2dReLU(in_channels + skip_channels, out_channels,
                                kernel_size=3, padding=1,
                                use_batchnorm=use_batchnorm)
        self.attention1 = Attention(attention_type,
                                    in_channels=in_channels + skip_channels)
        self.conv2 = Conv2dReLU(out_channels, out_channels, kernel_size=3,
                                padding=1, use_batchnorm=use_batchnorm)
        self.attention2 = Attention(attention_type, in_channels=out_channels)

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
            x = self.attention1(x)
        x = self.conv1(x)
        x = self.conv2(x)
        x = self.attention2(x)
        return x


class UnetPlusPlusDecoder(nn.Module):
    def __init__(self, encoder_channels, decoder_channels, n_blocks=5,
                 use_batchnorm=True, attention_type=None):
        super().__init__()
        encoder_channels = encoder_channels[1:]
        encoder_channels = encoder_channels[::-1]
        head_channels = encoder_channels[0]
        self.in_channels = [head_channels] + list(decoder_channels[:-1])
        self.skip_channels = list(encoder_channels[1:]) + [0]
        self.out_channels = decoder_channels
        kwargs = dict(use_batchnorm=use_batchnorm,
                      attention_type=attention_type)
        blocks = {}
        for layer_idx in range(len(self.in_channels) - 1):
            for depth_idx in range(layer_idx + 1):
                if depth_idx == 0:
                    in_ch = self.in_channels[layer_idx]
                    skip_ch = self.skip_channels[layer_idx] * (layer_idx + 1)
                    out_ch = self.out_channels[layer_idx]
                else:
                    out_ch = self.skip_channels[layer_idx]
                    skip_ch = self.skip_channels[layer_idx] * (
                        layer_idx + 1 - depth_idx)
                    in_ch = self.skip_channels[layer_idx - 1]
                blocks[f"x_{depth_idx}_{layer_idx}"] = DecoderBlock(
                    in_ch, skip_ch, out_ch, **kwargs)
        blocks[f"x_{0}_{len(self.in_channels) - 1}"] = DecoderBlock(
            self.in_channels[-1], 0, self.out_channels[-1], **kwargs)
        self.blocks = nn.ModuleDict(blocks)
        self.depth = len(self.in_channels) - 1

    def forward(self, *features):
        features = features[1:]
        features = features[::-1]
        dense_x = {}
        for layer_idx in range(len(self.in_channels) - 1):
            for depth_idx in range(self.depth - layer_idx):
                if layer_idx == 0:
                    output = self.blocks[f"x_{depth_idx}_{depth_idx}"](
                        features[depth_idx], features[depth_idx + 1])
                    dense_x[f"x_{depth_idx}_{depth_idx}"] = output
                else:
                    dense_l_i = depth_idx + layer_idx
                    cat_features = [
                        dense_x[f"x_{idx}_{dense_l_i}"]
                        for idx in range(depth_idx + 1, dense_l_i + 1)
                    ]
                    cat_features = torch.cat(
                        cat_features + [features[dense_l_i + 1]], dim=1)
                    dense_x[f"x_{depth_idx}_{dense_l_i}"] = self.blocks[
                        f"x_{depth_idx}_{dense_l_i}"
                    ](dense_x[f"x_{depth_idx}_{dense_l_i - 1}"], cat_features)
        dense_x[f"x_{0}_{self.depth}"] = self.blocks[f"x_{0}_{self.depth}"](
            dense_x[f"x_{0}_{self.depth - 1}"])
        return dense_x[f"x_{0}_{self.depth}"]


class SegmentationHead(nn.Sequential):
    def __init__(self, in_channels, out_channels, kernel_size=3,
                 upsampling=1):
        conv2d = nn.Conv2d(in_channels, out_channels, kernel_size,
                           padding=kernel_size // 2)
        up = (nn.UpsamplingBilinear2d(scale_factor=upsampling)
              if upsampling > 1 else nn.Identity())
        super().__init__(conv2d, up, nn.Identity())


# ---------------------------------------------------------------------------
# smp deeplabv3/decoder.py
# ---------------------------------------------------------------------------

class ASPPConv(nn.Sequential):
    def __init__(self, in_channels, out_channels, dilation):
        super().__init__(
            nn.Conv2d(in_channels, out_channels, 3, padding=dilation,
                      dilation=dilation, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(),
        )


class ASPPSeparableConv(nn.Sequential):
    def __init__(self, in_channels, out_channels, dilation):
        super().__init__(
            SeparableConv2d(in_channels, out_channels, 3, padding=dilation,
                            dilation=dilation, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(),
        )


class ASPPPooling(nn.Sequential):
    def __init__(self, in_channels, out_channels):
        super().__init__(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(in_channels, out_channels, 1, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(),
        )

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode="bilinear",
                             align_corners=False)


class ASPP(nn.Module):
    def __init__(self, in_channels, out_channels, atrous_rates,
                 separable=False):
        super().__init__()
        modules = [nn.Sequential(
            nn.Conv2d(in_channels, out_channels, 1, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(),
        )]
        rate1, rate2, rate3 = tuple(atrous_rates)
        ASPPConvModule = ASPPConv if not separable else ASPPSeparableConv
        modules.append(ASPPConvModule(in_channels, out_channels, rate1))
        modules.append(ASPPConvModule(in_channels, out_channels, rate2))
        modules.append(ASPPConvModule(in_channels, out_channels, rate3))
        modules.append(ASPPPooling(in_channels, out_channels))
        self.convs = nn.ModuleList(modules)
        self.project = nn.Sequential(
            nn.Conv2d(5 * out_channels, out_channels, 1, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(),
            nn.Dropout(0.5),
        )

    def forward(self, x):
        res = [conv(x) for conv in self.convs]
        res = torch.cat(res, dim=1)
        return self.project(res)


class DeepLabV3PlusDecoder(nn.Module):
    def __init__(self, encoder_channels, out_channels=256,
                 atrous_rates=(12, 24, 36), output_stride=16):
        super().__init__()
        self.aspp = nn.Sequential(
            ASPP(encoder_channels[-1], out_channels, atrous_rates,
                 separable=True),
            SeparableConv2d(out_channels, out_channels, kernel_size=3,
                            padding=1, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(),
        )
        scale_factor = 2 if output_stride == 8 else 4
        self.up = nn.UpsamplingBilinear2d(scale_factor=scale_factor)
        highres_in_channels = encoder_channels[-4]
        highres_out_channels = 48
        self.block1 = nn.Sequential(
            nn.Conv2d(highres_in_channels, highres_out_channels,
                      kernel_size=1, bias=False),
            nn.BatchNorm2d(highres_out_channels),
            nn.ReLU(),
        )
        self.block2 = nn.Sequential(
            SeparableConv2d(highres_out_channels + out_channels,
                            out_channels, kernel_size=3, padding=1,
                            bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(),
        )

    def forward(self, *features):
        aspp_features = self.aspp(features[-1])
        aspp_features = self.up(aspp_features)
        high_res_features = self.block1(features[-4])
        concat_features = torch.cat([aspp_features, high_res_features],
                                    dim=1)
        return self.block2(concat_features)


# ---------------------------------------------------------------------------
# efficientnet-pytorch-layout encoder mirror (smp stage taps, make_dilated)
# ---------------------------------------------------------------------------

def tf_same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])


# efficientnet-pytorch: bn_mom = 1 - batch_norm_momentum(0.99) = 0.01
# (slow stat adaptation — our flax encoder BNs mirror it as momentum=0.99);
# the smp DECODER BNs keep torch's default 0.1
_EFFNET_BN_MOM = 0.01


class TorchMBConv(nn.Module):
    def __init__(self, cin, cout, expand, stride, k, dilation=1):
        super().__init__()
        self.stride, self.k, self.dilation = stride, k, dilation
        self.has_skip = stride == 1 and cin == cout
        mid = cin * expand
        if expand != 1:
            self._expand_conv = nn.Conv2d(cin, mid, 1, bias=False)
            self._bn0 = nn.BatchNorm2d(mid, eps=1e-3, momentum=_EFFNET_BN_MOM)
        self.expand = expand
        self._depthwise_conv = nn.Conv2d(
            mid, mid, k, stride, groups=mid, bias=False,
            dilation=dilation)
        self._bn1 = nn.BatchNorm2d(mid, eps=1e-3, momentum=_EFFNET_BN_MOM)
        se_c = max(1, int(cin * 0.25))
        self._se_reduce = nn.Conv2d(mid, se_c, 1)
        self._se_expand = nn.Conv2d(se_c, mid, 1)
        self._project_conv = nn.Conv2d(mid, cout, 1, bias=False)
        self._bn2 = nn.BatchNorm2d(cout, eps=1e-3, momentum=_EFFNET_BN_MOM)

    def forward(self, x):
        y = x
        if self.expand != 1:
            y = F.silu(self._bn0(self._expand_conv(y)))
        if self.dilation > 1:
            # smp replace_strides_with_dilation: symmetric (k//2)*d padding
            # (== TF SAME for stride 1)
            p = (self.k // 2) * self.dilation
            y = F.pad(y, [p, p, p, p])
        else:
            y = tf_same_pad(y, self.k, self.stride)
        y = F.silu(self._bn1(self._depthwise_conv(y)))
        s = y.mean((2, 3), keepdim=True)
        s = self._se_expand(F.silu(self._se_reduce(s)))
        y = y * torch.sigmoid(s)
        y = self._bn2(self._project_conv(y))
        if self.has_skip:
            y = y + x
        return y


class TorchEfficientNet(nn.Module):
    """efficientnet-pytorch layout (_conv_stem/_bn0/_blocks.i...) emitting
    the smp feature pyramid: [input, stem, after stages 1, 2, 4, end].
    output_stride=16 reproduces smp make_dilated (stages 5-6 stride 1,
    dilation 2)."""

    def __init__(self, variant="efficientnet-b0", output_stride=32):
        super().__init__()
        from enhanced_unet_tpu.models.encoders import (
            _EFFNET_BASE,
            _EFFNET_SCALE,
            _round_filters,
            _round_repeats,
        )

        wm, dm = _EFFNET_SCALE[variant]
        stem_c = _round_filters(32, wm)
        self._conv_stem = nn.Conv2d(3, stem_c, 3, 2, bias=False)
        self._bn0 = nn.BatchNorm2d(stem_c, eps=1e-3, momentum=_EFFNET_BN_MOM)
        blocks = []
        self._capture = []
        cin = stem_c
        tap_stages = {2, 3, 5}
        dilated_stages = {5, 6} if output_stride == 16 else set()
        for si, (e, c, r, s, k) in enumerate(_EFFNET_BASE):
            cout = _round_filters(c, wm)
            for b in range(_round_repeats(r, dm)):
                if b == 0 and si in tap_stages:
                    self._capture.append(len(blocks))
                stride = s if b == 0 else 1
                dilation = 1
                if si in dilated_stages:
                    stride, dilation = 1, 2
                blocks.append(TorchMBConv(cin, cout, e, stride, k,
                                          dilation=dilation))
                cin = cout
        self._blocks = nn.ModuleList(blocks)

    def forward(self, x):
        feats = [x]
        y = tf_same_pad(x, 3, 2)
        y = F.silu(self._bn0(self._conv_stem(y)))
        feats.append(y)  # stride-2 tap = stem output (smp stage boundary)
        for i, blk in enumerate(self._blocks):
            if i in self._capture:
                feats.append(y)
            y = blk(y)
        feats.append(y)
        return feats


# ---------------------------------------------------------------------------
# full smp models + the reference's EnhancedUNet (models.py:246-343)
# ---------------------------------------------------------------------------

_EFFNET_OUT = {
    # smp encoders/efficientnet.py out_channels
    "efficientnet-tiny": (3, 8, 8, 16, 32, 80),  # see encoders._EFFNET_SCALE
    "efficientnet-b0": (3, 32, 24, 40, 112, 320),
    "efficientnet-b4": (3, 48, 32, 56, 160, 448),
    "efficientnet-b5": (3, 48, 40, 64, 176, 512),
}


class SMPUnetPlusPlus(nn.Module):
    def __init__(self, encoder_name="efficientnet-b5", classes=3,
                 decoder_channels=(256, 128, 64, 32, 16),
                 decoder_attention_type="scse"):
        super().__init__()
        self.encoder = TorchEfficientNet(encoder_name)
        self.decoder = UnetPlusPlusDecoder(
            _EFFNET_OUT[encoder_name], decoder_channels,
            attention_type=decoder_attention_type)
        self.segmentation_head = SegmentationHead(
            decoder_channels[-1], classes, kernel_size=3, upsampling=1)

    def forward(self, x):
        feats = self.encoder(x)
        y = self.decoder(*feats)
        return self.segmentation_head(y)


class SMPDeepLabV3Plus(nn.Module):
    def __init__(self, encoder_name="efficientnet-b4", classes=3):
        super().__init__()
        self.encoder = TorchEfficientNet(encoder_name, output_stride=16)
        self.decoder = DeepLabV3PlusDecoder(_EFFNET_OUT[encoder_name])
        self.segmentation_head = SegmentationHead(
            256, classes, kernel_size=1, upsampling=4)

    def forward(self, x):
        feats = self.encoder(x)
        y = self.decoder(*feats)
        return self.segmentation_head(y)


class SMPEnhancedUNet(nn.Module):
    """The reference's EnhancedUNet smp branch (models.py:246-343).

    encoders: (UNet++ branch, DeepLabV3+ branch) — (b5, b4) is the
    reference pairing; the training oracle runs the identical structure on
    efficientnet-tiny."""

    def __init__(self, num_classes=3,
                 encoders=("efficientnet-b5", "efficientnet-b4")):
        super().__init__()
        self.unetpp = SMPUnetPlusPlus(classes=num_classes,
                                      encoder_name=encoders[0])
        self.deeplab = SMPDeepLabV3Plus(classes=num_classes,
                                        encoder_name=encoders[1])
        fusion_channels = num_classes * 2
        self.attention_gate = nn.Sequential(
            nn.Conv2d(fusion_channels, fusion_channels // 2, kernel_size=3,
                      padding=1, bias=False),
            nn.BatchNorm2d(fusion_channels // 2),
            nn.GELU(),
            nn.Conv2d(fusion_channels // 2, fusion_channels, kernel_size=1,
                      bias=False),
            nn.BatchNorm2d(fusion_channels),
            nn.Sigmoid(),
        )
        self.fusion_head = nn.Sequential(
            nn.Conv2d(num_classes * 2, 256, kernel_size=3, padding=1,
                      bias=False),
            nn.BatchNorm2d(256),
            nn.ReLU(inplace=True),
            nn.Dropout2d(0.2),
            nn.Conv2d(256, 128, kernel_size=3, padding=1, bias=False),
            nn.BatchNorm2d(128),
            nn.ReLU(inplace=True),
            nn.Dropout2d(0.15),
            nn.Conv2d(128, 64, kernel_size=3, padding=1, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.Conv2d(64, num_classes, kernel_size=1),
        )
        self.fusion_residual = nn.Conv2d(num_classes * 2, num_classes,
                                         kernel_size=1)

    def forward(self, x):
        out_main = self.unetpp(x)
        out_aux = self.deeplab(x)
        fused_features = torch.cat([out_main, out_aux], dim=1)
        attention = self.attention_gate(fused_features)
        fused_features = fused_features * attention
        fused = self.fusion_head(fused_features)
        fused = fused + self.fusion_residual(fused_features)
        self._aux_outputs = {"unetpp": out_main, "deeplab": out_aux}
        return fused
