"""Pretrained ImageNet encoder manifest + import path
(convert/pretrained.py; reference behavior: smp encoder_weights="imagenet",
models.py:182-192, 255-275).

Synthetic upstream-layout state dicts stand in for the real downloads
(no egress here) — the conversion math itself is oracle-tested in
test_torch_convert.py / test_smp_parity.py; these tests pin the manifest
contents, the SHA-prefix verification, and the graft wiring."""

import hashlib
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from enhanced_unet_tpu.config import get_preset
from enhanced_unet_tpu.convert import (
    WEIGHT_MANIFEST,
    initialize_pretrained,
    required_weights,
    verify_weight_file,
)
from enhanced_unet_tpu.models import get_model
from enhanced_unet_tpu.train.trainer import create_train_state

sys.path.insert(0, os.path.dirname(__file__))
from test_torch_convert import _TorchResNet


def test_manifest_covers_reference_models():
    # reference encoder table: models.py:182-192 (unet/resnet50),
    # 255-275 (enhanced_unet b5+b4), 353-362 (fcn/resnet18),
    # 430-440 (pspnet/resnet34), 520-529 (linknet/resnet18)
    assert set(required_weights("unet")) == {"resnet50"}
    assert set(required_weights("fcn")) == {"resnet18"}
    assert set(required_weights("pspnet")) == {"resnet34"}
    assert set(required_weights("linknet")) == {"resnet18"}
    assert set(required_weights("enhanced_unet")) == {
        "efficientnet-b4", "efficientnet-b5"}
    # from-scratch models need nothing
    assert required_weights("segnet") == {}
    assert required_weights("unet_basic") == {}
    # every entry's filename embeds its sha prefix (torch.hub convention)
    for variant, e in WEIGHT_MANIFEST.items():
        assert e["file"].endswith(f"-{e['sha256_prefix']}.pth"), variant
        assert e["file"] in e["url"], variant


def test_verify_weight_file(tmp_path):
    payload = b"synthetic-weights-payload"
    h8 = hashlib.sha256(payload).hexdigest()[:8]
    good = tmp_path / f"resnet18-{h8}.pth"
    good.write_bytes(payload)
    assert verify_weight_file(str(good))
    bad = tmp_path / "resnet18-00000000.pth"
    bad.write_bytes(payload)
    assert not verify_weight_file(str(bad))
    with pytest.raises(ValueError):
        verify_weight_file(str(tmp_path / "not_hub_style.pth"))


def _leaf_equal(tree_a, tree_b):
    la = jax.tree.leaves(tree_a)
    lb = jax.tree.leaves(tree_b)
    return all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(la, lb))


def test_initialize_pretrained_grafts_encoder(tmp_path):
    torch.manual_seed(0)
    mirror = _TorchResNet("resnet18")
    sd = mirror.state_dict()
    # raw torchvision files carry the classifier head; the converter must
    # ignore it
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)

    cfg = get_preset("fcn", num_epochs=1)
    model = get_model("fcn", dtype=jnp.float32)
    state = create_train_state(model, cfg, steps_per_epoch=1,
                               rng=jax.random.key(0),
                               input_shape=(1, 64, 64, 3))

    # in-memory path
    new_state, imported = initialize_pretrained(
        state, "fcn", state_dicts={"resnet18": sd}, log=lambda *a: None)
    assert imported == ["resnet18"]
    enc = new_state.params["ResNetEncoder_0"]
    assert not _leaf_equal(enc, state.params["ResNetEncoder_0"])
    # the imported stem kernel is the torch conv1 transposed to HWIO
    np.testing.assert_allclose(
        np.asarray(enc["ConvBNAct_0"]["Conv_0"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    # non-encoder params untouched
    for k in new_state.params:
        if k != "ResNetEncoder_0":
            assert _leaf_equal(new_state.params[k], state.params[k])

    # on-disk path under the manifest filename
    wdir = tmp_path / "weights"
    wdir.mkdir()
    torch.save(sd, wdir / WEIGHT_MANIFEST["resnet18"]["file"])
    disk_state, imported = initialize_pretrained(
        state, "fcn", weights_dir=str(wdir), verify=False,
        log=lambda *a: None)
    assert _leaf_equal(disk_state.params["ResNetEncoder_0"], enc)
    # verification rejects the synthetic file (its hash is not upstream's)
    with pytest.raises(ValueError, match="SHA256"):
        initialize_pretrained(state, "fcn", weights_dir=str(wdir),
                              verify=True, log=lambda *a: None)


def test_initialize_pretrained_rejects_scratch_models():
    with pytest.raises(ValueError, match="no pretrained encoders"):
        initialize_pretrained(None, "segnet", state_dicts={})
