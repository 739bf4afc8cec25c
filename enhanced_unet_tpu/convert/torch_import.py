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
- `load_torch_checkpoint`: best-effort import of a reference training
  checkpoint dict {epoch, model_state_dict, ...} — encoder weights are
  grafted into the matching submodules; decoder/head weights whose
  architecture differs from our TPU-native decoders are reported as skipped.

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
    meta = {
        "epoch": int(ckpt.get("epoch", 0)),
        "best_miou": float(ckpt.get("best_miou", 0.0)),
        "best_loss": float(ckpt.get("best_loss", 0.0)),
        "history": ckpt.get("history", {}),
    }
    new_state = state.replace(params=params, batch_stats=stats)
    report = {"imported": imported, "skipped": skipped, "meta": meta}
    return new_state, report
