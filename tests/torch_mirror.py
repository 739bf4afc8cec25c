"""Torch mirrors of the Flax stack, used as training/inference oracles.

The mirror modules rebuild our BasicUNet topology in torch with copied
weights (HWIO -> OIHW); the loss functions re-state the reference's
Focal/Dice/Tversky semantics (train_eval.py:28-197) in torch so a full
training run can be compared step-for-step against the jitted JAX stack
(VERDICT r2 #3: the north-star "Dice within 0.5%" oracle).
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F


def to_torch_conv(kernel_hwio):
    """flax HWIO -> torch OIHW."""
    return torch.from_numpy(np.transpose(np.asarray(kernel_hwio), (3, 2, 0, 1)))


def build_basic_unet_mirror(params, stats, num_classes=3):
    """torch mirror of our BasicUNet (same topology) with copied weights.

    Returned in eval() mode; call .train() to use batch statistics and
    update running stats exactly as the flax module does in train mode
    (momentum 0.1 == flax 0.9, eps 1e-5 — models/blocks.py).
    """

    def conv_bn(p, s):
        cin = p["Conv_0"]["kernel"].shape[2]
        cout = p["Conv_0"]["kernel"].shape[3]
        conv = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        bn = tnn.BatchNorm2d(cout, eps=1e-5)
        with torch.no_grad():
            conv.weight.copy_(to_torch_conv(p["Conv_0"]["kernel"]))
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
                head.weight.copy_(to_torch_conv(k))
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

    m = Mirror()
    m.eval()
    return m


def build_enhanced_unet_basic_mirror(params, stats, num_classes=3):
    """torch mirror of EnhancedUNetBasic (the reference's non-smp flagship
    fallback, models.py:304-314, 334-339): BasicUNet backbone + residual
    enhance head `out + conv1(relu(bn(conv3(out))))`."""

    backbone = build_basic_unet_mirror(
        params["BasicUNet_0"], stats["BasicUNet_0"], num_classes
    )
    conv3 = tnn.Conv2d(num_classes, 64, 3, padding=1)
    bn = tnn.BatchNorm2d(64, eps=1e-5)
    conv1 = tnn.Conv2d(64, num_classes, 1)
    with torch.no_grad():
        conv3.weight.copy_(to_torch_conv(params["Conv_0"]["kernel"]))
        conv3.bias.copy_(torch.from_numpy(np.asarray(params["Conv_0"]["bias"])))
        bn.weight.copy_(torch.from_numpy(np.asarray(params["BatchNorm_0"]["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(params["BatchNorm_0"]["bias"])))
        bn.running_mean.copy_(
            torch.from_numpy(np.asarray(stats["BatchNorm_0"]["mean"])))
        bn.running_var.copy_(
            torch.from_numpy(np.asarray(stats["BatchNorm_0"]["var"])))
        conv1.weight.copy_(to_torch_conv(params["Conv_1"]["kernel"]))
        conv1.bias.copy_(torch.from_numpy(np.asarray(params["Conv_1"]["bias"])))

    class Mirror(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = backbone
            self.enhance = tnn.Sequential(conv3, bn, tnn.ReLU(), conv1)

        def forward(self, x):
            out = self.backbone(x)
            return out + self.enhance(out)

    m = Mirror()
    m.eval()
    return m


def torch_combined_loss(logits, targets, cfg):
    """Reference loss bundle in torch: focal (pre-weighted-CE pt quirk,
    train_eval.py:37-60) + weighted soft Dice (134-157) + Tversky
    (159-181), combined per train_eval.py:183-197.

    logits [B,C,H,W] float, targets [B,H,W] long.
    """
    b, c = logits.shape[:2]
    logp = F.log_softmax(logits, dim=1)
    probs = logp.exp()
    onehot = F.one_hot(targets, c).permute(0, 3, 1, 2).float()

    nll = -(logp * onehot).sum(1)                       # [B,H,W]
    w = torch.tensor(cfg.ce_class_weights, dtype=logits.dtype)
    a = torch.tensor(cfg.focal_alpha, dtype=logits.dtype)
    ce = w[targets] * nll                               # pre-weighted CE
    pt = torch.exp(-ce)
    focal = (a[targets] * (1.0 - pt) ** cfg.focal_gamma * ce).mean()

    p = probs.reshape(b, c, -1)
    m = onehot.reshape(b, c, -1)
    tp = (p * m).sum(-1)
    fp = p.sum(-1) - tp
    fn = m.sum(-1) - tp
    eps = cfg.eps
    dice = (2.0 * tp + eps) / (2.0 * tp + fp + fn + eps)
    dw = torch.tensor(cfg.dice_class_weights, dtype=logits.dtype)
    d = ((1.0 - dice) * dw[None, :]).mean()
    tv = (tp + eps) / (tp + cfg.tversky_alpha * fp
                       + (1.0 - cfg.tversky_alpha) * fn + eps)
    tw = torch.tensor(cfg.tversky_class_weights, dtype=logits.dtype)
    t = ((1.0 - tv) * tw[None, :]).mean()

    return (cfg.focal_weight * focal + cfg.dice_weight * d
            + cfg.tversky_weight * t)
