"""torch -> Flax weight conversion and reference-checkpoint import.

The reference's models are segmentation_models_pytorch nets whose encoders
carry ImageNet-pretrained weights (reference models.py:255-275 efficientnet
-b5/b4, 182-192 resnet50, 430-440 resnet34, 353-362/520-529 resnet18), and
its eval path loads `.pth` checkpoints (train_eval.py:1188-1202).  This
module maps those torch state dicts onto this framework's clean-room Flax
encoders so pretrained initialization / reference checkpoints are usable:

- torchvision-layout ResNet state dicts  -> models.encoders.ResNetEncoder
- efficientnet-pytorch-layout state dicts -> models.encoders.EfficientNetEncoder
  (smp's EfficientNet encoders use that package's `_blocks.N._expand_conv`
  naming)
- `load_torch_checkpoint`: import of a reference training checkpoint dict
  {epoch, model_state_dict, ...}.  For enhanced_unet this is a COMPLETE
  import — both smp branches (encoders + UNet++/DeepLabV3+ decoders +
  segmentation heads) and the fusion stage (attention gate, fusion head,
  residual conv) all map onto our smp-exact Flax decoders, so a reference
  .pth reproduces reference logits (tests/test_smp_parity.py).  For the
  basic zoo slots, encoder weights are grafted and decoder weights whose
  architecture differs are reported as skipped.

Padding semantics: our ResNet convs use torchvision's symmetric k//2
padding (ConvBNAct(padding="torch")) and our EfficientNet convs use
TF/XLA "SAME" (what efficientnet-pytorch's static same-padding reproduces),
so converted weights are forward-equivalent, not just shape-compatible —
verified in tests/test_torch_convert.py against torch mirrors.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Sequence, Tuple

import numpy as np

from enhanced_unet_tpu.models.encoders import (
    _EFFNET_BASE,
    _EFFNET_SCALE,
    _RESNET_SPECS,
    _round_repeats,
)


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy (host)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv_kernel(w) -> np.ndarray:
    """torch OIHW -> flax HWIO.  Also correct for depthwise convs:
    torch [C,1,k,k] -> flax [k,k,1,C] (feature_group_count=C)."""
    return np.transpose(_np(w), (2, 3, 1, 0))


def _conv_bn(sd: Mapping[str, Any], conv_key: str, bn_key: str,
             bias: bool = False) -> Tuple[Dict, Dict]:
    """One Conv(+BN) pair -> (ConvBNAct params, ConvBNAct batch_stats)."""
    conv = {"kernel": _conv_kernel(sd[f"{conv_key}.weight"])}
    if bias:
        conv["bias"] = _np(sd[f"{conv_key}.bias"])
    params = {
        "Conv_0": conv,
        "BatchNorm_0": {
            "scale": _np(sd[f"{bn_key}.weight"]),
            "bias": _np(sd[f"{bn_key}.bias"]),
        },
    }
    stats = {
        "BatchNorm_0": {
            "mean": _np(sd[f"{bn_key}.running_mean"]),
            "var": _np(sd[f"{bn_key}.running_var"]),
        }
    }
    return params, stats


# ---------------------------------------------------------------------------
# ResNet (torchvision layout: conv1/bn1, layer{1..4}.{b}.conv{k}/bn{k},
# layer{L}.{b}.downsample.{0,1})
# ---------------------------------------------------------------------------

def convert_resnet(sd: Mapping[str, Any], variant: str,
                   depth: int = 5) -> Tuple[Dict, Dict]:
    """torchvision ResNet state dict -> (params, batch_stats) subtrees for
    models.encoders.ResNetEncoder(variant, depth)."""
    block_cls, layers = _RESNET_SPECS[variant]
    bottleneck = block_cls.__name__ == "BottleneckResBlock"
    block_name = block_cls.__name__

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["ConvBNAct_0"], stats["ConvBNAct_0"] = _conv_bn(sd, "conv1", "bn1")

    idx = 0
    for stage, n_blocks in enumerate(layers):
        if stage + 2 > depth:
            break
        for b in range(n_blocks):
            prefix = f"layer{stage + 1}.{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            n_convs = 3 if bottleneck else 2
            for k in range(n_convs):
                bp[f"ConvBNAct_{k}"], bs[f"ConvBNAct_{k}"] = _conv_bn(
                    sd, f"{prefix}.conv{k + 1}", f"{prefix}.bn{k + 1}"
                )
            if f"{prefix}.downsample.0.weight" in sd:
                key = f"ConvBNAct_{n_convs}"
                bp[key], bs[key] = _conv_bn(
                    sd, f"{prefix}.downsample.0", f"{prefix}.downsample.1"
                )
            params[f"{block_name}_{idx}"] = bp
            stats[f"{block_name}_{idx}"] = bs
            idx += 1
    return params, stats


# ---------------------------------------------------------------------------
# EfficientNet (efficientnet-pytorch layout: _conv_stem/_bn0,
# _blocks.{i}.{_expand_conv,_bn0,_depthwise_conv,_bn1,_se_reduce,
# _se_expand,_project_conv,_bn2})
# ---------------------------------------------------------------------------

def _effnet_expand_ratios(variant: str) -> List[int]:
    """Per-flattened-block expand ratio (determines flax submodule numbering
    inside MBConvBlock: expand_ratio==1 blocks have no expansion conv)."""
    _, depth_mult = _EFFNET_SCALE[variant]
    out: List[int] = []
    for (e, _, r, _, _) in _EFFNET_BASE:
        out.extend([e] * _round_repeats(r, depth_mult))
    return out


def convert_efficientnet(sd: Mapping[str, Any], variant: str) -> Tuple[Dict, Dict]:
    """efficientnet-pytorch state dict -> (params, batch_stats) subtrees for
    models.encoders.EfficientNetEncoder(variant)."""
    params: Dict[str, Any] = {
        "Conv_0": {"kernel": _conv_kernel(sd["_conv_stem.weight"])},
        "BatchNorm_0": {
            "scale": _np(sd["_bn0.weight"]),
            "bias": _np(sd["_bn0.bias"]),
        },
    }
    stats: Dict[str, Any] = {
        "BatchNorm_0": {
            "mean": _np(sd["_bn0.running_mean"]),
            "var": _np(sd["_bn0.running_var"]),
        }
    }

    for i, expand in enumerate(_effnet_expand_ratios(variant)):
        p = f"_blocks.{i}"
        if f"{p}._depthwise_conv.weight" not in sd:
            raise KeyError(
                f"state dict has no block {i}; wrong variant '{variant}'?"
            )
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        conv_i = 0
        bn_i = 0

        def put_bn(tkey):
            nonlocal bn_i
            bp[f"BatchNorm_{bn_i}"] = {
                "scale": _np(sd[f"{tkey}.weight"]),
                "bias": _np(sd[f"{tkey}.bias"]),
            }
            bs[f"BatchNorm_{bn_i}"] = {
                "mean": _np(sd[f"{tkey}.running_mean"]),
                "var": _np(sd[f"{tkey}.running_var"]),
            }
            bn_i += 1

        def put_conv(tkey, bias=False):
            nonlocal conv_i
            c = {"kernel": _conv_kernel(sd[f"{tkey}.weight"])}
            if bias:
                c["bias"] = _np(sd[f"{tkey}.bias"])
            bp[f"Conv_{conv_i}"] = c
            conv_i += 1

        if expand != 1:
            put_conv(f"{p}._expand_conv")
            put_bn(f"{p}._bn0")
        put_conv(f"{p}._depthwise_conv")
        put_bn(f"{p}._bn1")
        put_conv(f"{p}._se_reduce", bias=True)
        put_conv(f"{p}._se_expand", bias=True)
        put_conv(f"{p}._project_conv")
        put_bn(f"{p}._bn2")

        params[f"MBConvBlock_{i}"] = bp
        stats[f"MBConvBlock_{i}"] = bs
    return params, stats


# ---------------------------------------------------------------------------
# smp decoder / fusion conversion (full reference-checkpoint import)
# ---------------------------------------------------------------------------

def _conv(sd: Mapping[str, Any], key: str, bias: bool = True) -> Dict:
    c = {"kernel": _conv_kernel(sd[f"{key}.weight"])}
    if bias and f"{key}.bias" in sd:
        c["bias"] = _np(sd[f"{key}.bias"])
    return c


def _bn(sd: Mapping[str, Any], key: str) -> Tuple[Dict, Dict]:
    return (
        {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])},
        {"mean": _np(sd[f"{key}.running_mean"]),
         "var": _np(sd[f"{key}.running_var"])},
    )


def _scse(sd: Mapping[str, Any], prefix: str) -> Dict:
    """smp SCSEModule (attention{1,2}.attention.{cSE,sSE}) ->
    models.blocks.SCSEBlock params {Conv_0, Conv_1, Conv_2}."""
    return {
        "Conv_0": _conv(sd, f"{prefix}.cSE.1"),
        "Conv_1": _conv(sd, f"{prefix}.cSE.3"),
        "Conv_2": _conv(sd, f"{prefix}.sSE.0"),
    }


def _conv2drelu(sd: Mapping[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    """smp md.Conv2dReLU (Sequential conv(0), bn(1), relu) -> ConvBNAct."""
    bn_p, bn_s = _bn(sd, f"{prefix}.1")
    return (
        {"Conv_0": _conv(sd, f"{prefix}.0", bias=False),
         "BatchNorm_0": bn_p},
        {"BatchNorm_0": bn_s},
    )


def _sepconv_bn(sd: Mapping[str, Any], dw_key: str, pw_key: str,
                bn_key: str) -> Tuple[Dict, Dict]:
    """smp SeparableConv2d(+BN+ReLU) -> models.blocks.SeparableConvBNAct
    {Conv_0 depthwise, Conv_1 pointwise, BatchNorm_0}."""
    bn_p, bn_s = _bn(sd, bn_key)
    return (
        {"Conv_0": _conv(sd, dw_key, bias=False),
         "Conv_1": _conv(sd, pw_key, bias=False),
         "BatchNorm_0": bn_p},
        {"BatchNorm_0": bn_s},
    )


def _decoder_block(sd: Mapping[str, Any], prefix: str,
                   scse: bool = True) -> Tuple[Dict, Dict]:
    """smp unet/unet++ DecoderBlock -> NestedBlock subtree
    {SCSEBlock_0 (attention1), DoubleConv_0 (conv1+conv2),
    SCSEBlock_1 (attention2)}."""
    c1p, c1s = _conv2drelu(sd, f"{prefix}.conv1")
    c2p, c2s = _conv2drelu(sd, f"{prefix}.conv2")
    params: Dict[str, Any] = {
        "DoubleConv_0": {"ConvBNAct_0": c1p, "ConvBNAct_1": c2p},
    }
    stats: Dict[str, Any] = {
        "DoubleConv_0": {"ConvBNAct_0": c1s, "ConvBNAct_1": c2s},
    }
    if scse:
        params["SCSEBlock_0"] = _scse(sd, f"{prefix}.attention1.attention")
        params["SCSEBlock_1"] = _scse(sd, f"{prefix}.attention2.attention")
    return params, stats


def convert_unetpp_decoder(sd: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """smp UnetPlusPlusDecoder + SegmentationHead state dict (keys
    `decoder.blocks.x_{d}_{l}.*`, `segmentation_head.0.*`) -> the
    non-encoder part of our UNetPlusPlus param/stat trees.

    Node map (see UNetPlusPlus docstring): our grid (i, j), enumerated
    j-major as NestedBlock_{idx}, equals smp's x_{4-i-j}_{3-i}.  The head
    (smp x_0_4, no skip -> no attention1) maps onto DoubleConv_0 /
    SCSEBlock_0 / Conv_0 at the UNetPlusPlus scope."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    idx = 0
    for j in range(1, 5):
        for i in range(0, 5 - j):
            d, l = 4 - i - j, 3 - i
            bp, bs = _decoder_block(sd, f"decoder.blocks.x_{d}_{l}")
            params[f"NestedBlock_{idx}"] = bp
            stats[f"NestedBlock_{idx}"] = bs
            idx += 1
    # head block x_0_4: conv1/conv2 + attention2 (attention1 has params in
    # the torch dict but is unused — skip is None in forward)
    hp, hs = _decoder_block(sd, "decoder.blocks.x_0_4", scse=False)
    params["DoubleConv_0"] = hp["DoubleConv_0"]
    stats["DoubleConv_0"] = hs["DoubleConv_0"]
    params["SCSEBlock_0"] = _scse(sd, "decoder.blocks.x_0_4.attention2.attention")
    params["Conv_0"] = _conv(sd, "segmentation_head.0")
    return params, stats


def convert_deeplab_decoder(sd: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """smp DeepLabV3PlusDecoder + SegmentationHead state dict (keys
    `decoder.aspp.*`, `decoder.block1/2.*`, `segmentation_head.0.*`) ->
    the non-encoder part of our DeepLabV3Plus param/stat trees."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    aspp_p: Dict[str, Any] = {}
    aspp_s: Dict[str, Any] = {}
    # branch 0: 1x1 conv
    aspp_p["ConvBNAct_0"], aspp_s["ConvBNAct_0"] = _conv2drelu(
        sd, "decoder.aspp.0.convs.0")
    # branches 1-3: separable dilated convs (ASPPSeparableConv =
    # Sequential(SeparableConv2d(0.{0,1}), BN(1), ReLU))
    for b in range(1, 4):
        p = f"decoder.aspp.0.convs.{b}"
        aspp_p[f"SeparableConvBNAct_{b - 1}"], \
            aspp_s[f"SeparableConvBNAct_{b - 1}"] = _sepconv_bn(
                sd, f"{p}.0.0", f"{p}.0.1", f"{p}.1")
    # pooling branch (Sequential(pool(0), conv(1), bn(2), relu))
    pool_bn_p, pool_bn_s = _bn(sd, "decoder.aspp.0.convs.4.2")
    aspp_p["ConvBNAct_1"] = {
        "Conv_0": _conv(sd, "decoder.aspp.0.convs.4.1", bias=False),
        "BatchNorm_0": pool_bn_p,
    }
    aspp_s["ConvBNAct_1"] = {"BatchNorm_0": pool_bn_s}
    # projection
    aspp_p["ConvBNAct_2"], aspp_s["ConvBNAct_2"] = _conv2drelu(
        sd, "decoder.aspp.0.project")
    params["ASPP_0"], stats["ASPP_0"] = aspp_p, aspp_s

    # post-ASPP separable conv (decoder.aspp.{1 sepconv, 2 BN, 3 ReLU})
    params["SeparableConvBNAct_0"], stats["SeparableConvBNAct_0"] = \
        _sepconv_bn(sd, "decoder.aspp.1.0", "decoder.aspp.1.1",
                    "decoder.aspp.2")
    # block1 (1x1 on the stride-4 skip)
    params["ConvBNAct_0"], stats["ConvBNAct_0"] = _conv2drelu(
        sd, "decoder.block1")
    # block2 (separable conv on the concat)
    params["SeparableConvBNAct_1"], stats["SeparableConvBNAct_1"] = \
        _sepconv_bn(sd, "decoder.block2.0.0", "decoder.block2.0.1",
                    "decoder.block2.1")
    params["Conv_0"] = _conv(sd, "segmentation_head.0")
    return params, stats


def convert_smp_unetpp(sd: Mapping[str, Any],
                       variant: str = "efficientnet-b5") -> Tuple[Dict, Dict]:
    """smp.UnetPlusPlus state dict (encoder.*, decoder.*,
    segmentation_head.*) -> full trees for our UNetPlusPlus module."""
    enc_p, enc_s = convert_efficientnet(_strip_prefix(sd, "encoder."), variant)
    dec_p, dec_s = convert_unetpp_decoder(sd)
    return ({"EfficientNetEncoder_0": enc_p, **dec_p},
            {"EfficientNetEncoder_0": enc_s, **dec_s})


def convert_smp_deeplab(sd: Mapping[str, Any],
                        variant: str = "efficientnet-b4") -> Tuple[Dict, Dict]:
    """smp.DeepLabV3Plus state dict -> full trees for our DeepLabV3Plus."""
    enc_p, enc_s = convert_efficientnet(_strip_prefix(sd, "encoder."), variant)
    dec_p, dec_s = convert_deeplab_decoder(sd)
    return ({"EfficientNetEncoder_0": enc_p, **dec_p},
            {"EfficientNetEncoder_0": enc_s, **dec_s})


def convert_enhanced_unet(
    sd: Mapping[str, Any],
    variants: Tuple[str, str] = ("efficientnet-b5", "efficientnet-b4"),
) -> Tuple[Dict, Dict]:
    """Full reference EnhancedUNet state dict (models.py:246-343 smp branch:
    unetpp.*, deeplab.*, attention_gate.*, fusion_head.*, fusion_residual)
    -> complete (params, batch_stats) trees for models.EnhancedUNet.

    variants: the (UNet++, DeepLabV3+) encoder pair — (b5, b4) is the
    reference pairing (models.py:255-275)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["UNetPlusPlus_0"], stats["UNetPlusPlus_0"] = convert_smp_unetpp(
        _strip_prefix(sd, "unetpp."), variants[0])
    params["DeepLabV3Plus_0"], stats["DeepLabV3Plus_0"] = convert_smp_deeplab(
        _strip_prefix(sd, "deeplab."), variants[1])

    # --- attention gate (models.py:278-285; Sequential conv(0), bn(1),
    # gelu, conv(3), bn(4), sigmoid) ---
    params["Conv_0"] = _conv(sd, "attention_gate.0", bias=False)
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "attention_gate.1")
    params["Conv_1"] = _conv(sd, "attention_gate.3", bias=False)
    params["BatchNorm_1"], stats["BatchNorm_1"] = _bn(sd, "attention_gate.4")

    # --- fusion head (models.py:287-300; Sequential conv(0), bn(1), relu,
    # dropout, conv(4), bn(5), relu, dropout, conv(8), bn(9), relu,
    # conv(11)) ---
    for k, off in enumerate((0, 4, 8)):
        bn_p, bn_s = _bn(sd, f"fusion_head.{off + 1}")
        params[f"ConvBNAct_{k}"] = {
            "Conv_0": _conv(sd, f"fusion_head.{off}", bias=False),
            "BatchNorm_0": bn_p,
        }
        stats[f"ConvBNAct_{k}"] = {"BatchNorm_0": bn_s}
    params["Conv_2"] = _conv(sd, "fusion_head.11")
    # --- residual path (models.py:302) ---
    params["Conv_3"] = _conv(sd, "fusion_residual")
    return params, stats


# ---------------------------------------------------------------------------
# grafting converted subtrees into full model variable trees
# ---------------------------------------------------------------------------

def _check_shapes(template, imported, path: str) -> None:
    """Every imported leaf must match the template's shape exactly."""
    import jax

    t_flat = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    i_flat = dict(jax.tree_util.tree_flatten_with_path(imported)[0])
    t_keys = set(map(jax.tree_util.keystr, t_flat))
    i_keys = set(map(jax.tree_util.keystr, i_flat))
    if t_keys != i_keys:
        missing = sorted(t_keys - i_keys)[:5]
        extra = sorted(i_keys - t_keys)[:5]
        raise ValueError(
            f"{path}: param tree mismatch; missing={missing} extra={extra}"
        )
    for kp, leaf in t_flat.items():
        imp = i_flat[kp]
        if tuple(np.shape(leaf)) != tuple(np.shape(imp)):
            raise ValueError(
                f"{path}{jax.tree_util.keystr(kp)}: shape "
                f"{np.shape(imp)} != expected {np.shape(leaf)}"
            )


def graft(tree, subtree, path: Sequence[str]):
    """Return `tree` with tree[path[0]][path[1]]... replaced by `subtree`
    (shape-checked).  Works for FrozenDict or plain dict trees."""
    from flax.core import freeze, unfreeze

    frozen = not isinstance(tree, dict)
    root = unfreeze(tree) if frozen else dict(tree)
    node = root
    for key in path[:-1]:
        node[key] = dict(node[key])
        node = node[key]
    _check_shapes(node[path[-1]], subtree, "/".join(path))
    node[path[-1]] = subtree
    return freeze(root) if frozen else root


# (model_name, torch key prefix) -> (encoder kind, variant, depth,
#                                    path inside our param tree)
# Reference model structure: models.py:255-275 (enhanced_unet branches),
# 182-192 (unet/resnet50), 353-362 (fcn/resnet18), 430-440 (pspnet/resnet34),
# 520-529 (linknet/resnet18).  smp modules live under `self.model` in the
# basic zoo wrappers and under `self.unetpp` / `self.deeplab` in EnhancedUNet.
_ENCODER_MAP: Dict[str, Dict[str, Tuple[str, str, int, Tuple[str, ...]]]] = {
    "enhanced_unet": {
        "unetpp.encoder.": (
            "efficientnet", "efficientnet-b5", 5,
            ("UNetPlusPlus_0", "EfficientNetEncoder_0"),
        ),
        "deeplab.encoder.": (
            "efficientnet", "efficientnet-b4", 5,
            ("DeepLabV3Plus_0", "EfficientNetEncoder_0"),
        ),
    },
    "unet": {"model.encoder.": ("resnet", "resnet50", 5, ("ResNetEncoder_0",))},
    "fcn": {"model.encoder.": ("resnet", "resnet18", 4, ("ResNetEncoder_0",))},
    "pspnet": {"model.encoder.": ("resnet", "resnet34", 4, ("ResNetEncoder_0",))},
    "linknet": {"model.encoder.": ("resnet", "resnet18", 3, ("ResNetEncoder_0",))},
}


def import_encoder(params, batch_stats, sd: Mapping[str, Any], kind: str,
                   variant: str, path: Sequence[str], depth: int = 5):
    """Graft one converted torch encoder into (params, batch_stats) at
    `path`.  Returns the new trees."""
    if kind == "resnet":
        sub_p, sub_s = convert_resnet(sd, variant, depth)
    elif kind == "efficientnet":
        sub_p, sub_s = convert_efficientnet(sd, variant)
    else:
        raise ValueError(f"unknown encoder kind {kind}")
    return graft(params, sub_p, path), graft(batch_stats, sub_s, path)


def _strip_prefix(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def load_torch_checkpoint(path_or_dict, state, model_name: str):
    """Import a reference `.pth` training checkpoint into a TrainState.

    The reference saves {epoch, model_state_dict, optimizer_state_dict,
    scheduler_state_dict, best_miou, best_loss, history}
    (train_eval.py:1143-1151).  Encoder weights transfer exactly (same
    architectures); smp decoder/fusion weights do not map onto our
    TPU-native decoders and are reported under `skipped`.

    Returns (state, report) where report = {"imported": [prefixes],
    "skipped": [key prefixes], "meta": {epoch, best_miou, best_loss,
    history}}.
    """
    if isinstance(path_or_dict, (str, bytes)):
        import torch

        ckpt = torch.load(path_or_dict, map_location="cpu",
                          weights_only=False)
    else:
        ckpt = path_or_dict
    sd = ckpt.get("model_state_dict", ckpt)

    base = model_name[:-6] if model_name.endswith("_basic") else model_name
    enc_map = _ENCODER_MAP.get(base, {})

    meta = {
        "epoch": int(ckpt.get("epoch", 0)),
        "best_miou": float(ckpt.get("best_miou", 0.0)),
        "best_loss": float(ckpt.get("best_loss", 0.0)),
        "history": ckpt.get("history", {}),
    }

    if base == "enhanced_unet" and any(
            k.startswith("unetpp.encoder.") for k in sd):
        # COMPLETE import: both branches' encoders + smp decoders +
        # attention gate / fusion head / residual (train_eval.py:1188-1202
        # loads the full model_state_dict; so do we).  Our decoders are
        # smp-exact, so every functional weight maps; the only leftovers
        # are the head block's attention1 params, which smp creates but
        # never calls (DecoderBlock.forward skips attention1 when skip is
        # None).
        import jax.numpy as jnp
        import jax as _jax

        full_p, full_s = convert_enhanced_unet(sd)
        _check_shapes(state.params, full_p, "params")
        _check_shapes(state.batch_stats, full_s, "batch_stats")
        new_state = state.replace(
            params=_jax.tree.map(jnp.asarray, full_p),
            batch_stats=_jax.tree.map(jnp.asarray, full_s),
        )
        skipped = sorted(k for k in sd if ".x_0_4.attention1." in k)
        return new_state, {
            "imported": ["<full enhanced_unet state dict>"],
            "skipped": skipped,
            "meta": meta,
        }

    params, stats = state.params, state.batch_stats
    imported: List[str] = []
    consumed: set = set()
    for prefix, (kind, variant, depth, tree_path) in enc_map.items():
        sub_sd = _strip_prefix(sd, prefix)
        if not sub_sd:
            continue
        params, stats = import_encoder(
            params, stats, sub_sd, kind, variant, tree_path, depth
        )
        imported.append(prefix)
        consumed.update(k for k in sd if k.startswith(prefix))

    skipped = sorted({k.split(".")[0] for k in sd if k not in consumed})
    new_state = state.replace(params=params, batch_stats=stats)
    report = {"imported": imported, "skipped": skipped, "meta": meta}
    return new_state, report
