"""torch->Flax weight conversion round-trips (VERDICT round-1 item 2).

Torch mirrors are built with the EXACT state-dict layouts the reference's
encoders use (torchvision ResNet naming; efficientnet-pytorch naming, which
is what smp's EfficientNet encoders are) and random weights + BN stats.
Converted Flax encoders must reproduce the torch forward within fp32
tolerance at every feature-pyramid level — the "random torch model ->
convert -> Flax forward matches" criterion.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from enhanced_unet_tpu.convert import (
    convert_efficientnet,
    convert_resnet,
    load_torch_checkpoint,
)
from enhanced_unet_tpu.models.encoders import (
    EfficientNetEncoder,
    ResNetEncoder,
)

torch.manual_seed(0)


def _randomize_bn(m: tnn.Module, gen: torch.Generator):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * 0.2)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=gen) + 0.5)
                mod.weight.copy_(
                    torch.rand(mod.weight.shape, generator=gen) + 0.5)
                mod.bias.copy_(
                    torch.randn(mod.bias.shape, generator=gen) * 0.1)


# ---------------------------------------------------------------------------
# torchvision-layout ResNet mirror
# ---------------------------------------------------------------------------

class _TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class _TorchBottleneck(tnn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        cout = width * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idn)


class _TorchResNet(tnn.Module):
    """torchvision-layout ResNet trunk emitting the smp feature pyramid."""

    def __init__(self, variant: str):
        super().__init__()
        specs = {
            "resnet18": (_TorchBasicBlock, (2, 2, 2, 2), 1),
            "resnet34": (_TorchBasicBlock, (3, 4, 6, 3), 1),
            "resnet50": (_TorchBottleneck, (3, 4, 6, 3), 4),
        }
        block, layers, expansion = specs[variant]
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, (width, n) in enumerate(zip((64, 128, 256, 512), layers)):
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and li > 0) else 1
                blocks.append(block(cin, width, stride))
                cin = width * expansion
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        feats = [x]
        y = F.relu(self.bn1(self.conv1(x)))
        feats.append(y)
        y = self.maxpool(y)
        for li in range(4):
            y = getattr(self, f"layer{li + 1}")(y)
            feats.append(y)
        return feats


@pytest.mark.parametrize("variant", ["resnet18", "resnet50"])
def test_resnet_convert_forward_parity(variant, rng):
    gen = torch.Generator().manual_seed(1)
    mirror = _TorchResNet(variant).eval()
    _randomize_bn(mirror, gen)

    params, stats = convert_resnet(mirror.state_dict(), variant)
    enc = ResNetEncoder(variant=variant, dtype=jnp.float32)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.5

    ours = enc.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        theirs = mirror(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))

    assert len(ours) == len(theirs) == 6
    for lvl, (o, t) in enumerate(zip(ours, theirs)):
        t = np.transpose(t.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(o), t, atol=5e-4, rtol=1e-4,
            err_msg=f"feature level {lvl}",
        )


def test_resnet_convert_shape_guard():
    """Grafting a wrong-variant state dict must fail loudly, not silently."""
    mirror = _TorchResNet("resnet18").eval()
    with pytest.raises(KeyError):
        # resnet34 has more blocks than the resnet18 dict provides
        convert_resnet(mirror.state_dict(), "resnet34")


# ---------------------------------------------------------------------------
# efficientnet-pytorch-layout mirror (TF same padding, silu, SE)
# ---------------------------------------------------------------------------

def _tf_same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])


class _TorchMBConv(tnn.Module):
    def __init__(self, cin, cout, expand, stride, k):
        super().__init__()
        self.stride, self.k = stride, k
        self.has_skip = stride == 1 and cin == cout
        mid = cin * expand
        if expand != 1:
            self._expand_conv = tnn.Conv2d(cin, mid, 1, bias=False)
            self._bn0 = tnn.BatchNorm2d(mid, eps=1e-3)
        self.expand = expand
        self._depthwise_conv = tnn.Conv2d(
            mid, mid, k, stride, groups=mid, bias=False)
        self._bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
        se_c = max(1, int(cin * 0.25))
        self._se_reduce = tnn.Conv2d(mid, se_c, 1)
        self._se_expand = tnn.Conv2d(se_c, mid, 1)
        self._project_conv = tnn.Conv2d(mid, cout, 1, bias=False)
        self._bn2 = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        y = x
        if self.expand != 1:
            y = F.silu(self._bn0(self._expand_conv(y)))
        y = _tf_same_pad(y, self.k, self.stride)
        y = F.silu(self._bn1(self._depthwise_conv(y)))
        s = y.mean((2, 3), keepdim=True)
        s = self._se_expand(F.silu(self._se_reduce(s)))
        y = y * torch.sigmoid(s)
        y = self._bn2(self._project_conv(y))
        if self.has_skip:
            y = y + x
        return y


class _TorchEfficientNet(tnn.Module):
    """efficientnet-pytorch layout (_conv_stem/_bn0/_blocks.i...)."""

    def __init__(self, variant="efficientnet-b0"):
        super().__init__()
        from enhanced_unet_tpu.models.encoders import (
            _EFFNET_BASE,
            _EFFNET_SCALE,
            _round_filters,
            _round_repeats,
        )

        wm, dm = _EFFNET_SCALE[variant]
        stem_c = _round_filters(32, wm)
        self._conv_stem = tnn.Conv2d(3, stem_c, 3, 2, bias=False)
        self._bn0 = tnn.BatchNorm2d(stem_c, eps=1e-3)
        blocks = []
        # smp stage boundaries (EfficientNetEncoder.get_stages): the stride-2
        # feature is the STEM output; deeper taps are just before the blocks
        # starting stages 2, 3 and 5 (= after stages 1, 2, 4).
        self._capture = []
        cin = stem_c
        tap_stages = {2, 3, 5}
        for si, (e, c, r, s, k) in enumerate(_EFFNET_BASE):
            cout = _round_filters(c, wm)
            for b in range(_round_repeats(r, dm)):
                if b == 0 and si in tap_stages:
                    self._capture.append(len(blocks))
                blocks.append(
                    _TorchMBConv(cin, cout, e, s if b == 0 else 1, k))
                cin = cout
        self._blocks = tnn.ModuleList(blocks)

    def forward(self, x):
        feats = [x]
        y = _tf_same_pad(x, 3, 2)
        y = F.silu(self._bn0(self._conv_stem(y)))
        feats.append(y)  # stride-2 tap = stem output (smp stage boundary)
        for i, blk in enumerate(self._blocks):
            if i in self._capture:
                feats.append(y)
            y = blk(y)
        feats.append(y)
        return feats


def test_efficientnet_convert_forward_parity(rng):
    gen = torch.Generator().manual_seed(2)
    mirror = _TorchEfficientNet("efficientnet-b0").eval()
    _randomize_bn(mirror, gen)

    params, stats = convert_efficientnet(
        mirror.state_dict(), "efficientnet-b0")
    enc = EfficientNetEncoder(variant="efficientnet-b0", dtype=jnp.float32)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.5

    ours = enc.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        theirs = mirror(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))

    assert len(ours) == len(theirs) == 6
    for lvl, (o, t) in enumerate(zip(ours, theirs)):
        t = np.transpose(t.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(o), t, atol=1e-3, rtol=1e-3,
            err_msg=f"feature level {lvl}",
        )


# ---------------------------------------------------------------------------
# reference .pth checkpoint import (train_eval.py:1143-1151 layout)
# ---------------------------------------------------------------------------

def test_load_torch_checkpoint_grafts_encoder(tmp_path):
    from enhanced_unet_tpu.config import get_preset
    from enhanced_unet_tpu.models import get_model
    from enhanced_unet_tpu.train.trainer import create_train_state

    mirror = _TorchResNet("resnet18").eval()
    sd = {f"model.encoder.{k}": v for k, v in mirror.state_dict().items()}
    sd["model.decoder.blocks.0.conv1.weight"] = torch.zeros(1)  # unmapped
    ckpt = {
        "epoch": 7,
        "model_state_dict": sd,
        "best_miou": 0.42,
        "best_loss": 1.5,
        "history": {"train_loss": [2.0, 1.5]},
    }
    path = tmp_path / "fcn_best.pth"
    torch.save(ckpt, path)

    cfg = get_preset("fcn", num_epochs=10)
    model = get_model("fcn", dtype=jnp.float32)
    state = create_train_state(
        model, cfg, steps_per_epoch=1, rng=jax.random.key(0),
        input_shape=(1, 64, 64, 3),
    )
    new_state, report = load_torch_checkpoint(str(path), state, "fcn")

    assert report["imported"] == ["model.encoder."]
    assert "model" in report["skipped"]  # the decoder prefix was not mapped
    assert report["meta"]["epoch"] == 7
    assert report["meta"]["best_miou"] == pytest.approx(0.42)
    # a converted leaf actually landed in the tree
    k_ours = np.asarray(
        new_state.params["ResNetEncoder_0"]["ConvBNAct_0"]["Conv_0"]["kernel"])
    k_torch = np.transpose(mirror.conv1.weight.detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(k_ours, k_torch, atol=1e-6)
    # and the model still runs
    logits, _ = new_state.apply_fn(
        {"params": new_state.params, "batch_stats": new_state.batch_stats},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    assert np.isfinite(np.asarray(logits)).all()
