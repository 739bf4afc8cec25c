"""Loss parity tests: the jnp loss bundle vs an independent torch oracle
implementing the reference's documented math (train_eval.py:28-234).

Oracle layout is NCHW (torch), ours is NHWC (TPU); the tests transpose.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from enhanced_unet_tpu.config import LossConfig, get_preset
from enhanced_unet_tpu.ops.losses import (
    combined_loss,
    combined_loss_with_aux,
    dice_loss,
    focal_loss,
    tversky_loss,
)

CE_W = (1.0, 20.0, 10.0)
ALPHA = (1.0, 8.0, 5.0)
DICE_W = (1.0, 15.0, 8.0)
TVERSKY_W = (1.0, 12.0, 6.0)


def _torch_focal(logits, targets, alpha=ALPHA, gamma=5.0, weights=CE_W):
    w = torch.tensor(weights)
    ce = F.cross_entropy(logits, targets, reduction="none", weight=w)
    pt = torch.exp(-ce)
    a = torch.zeros_like(ce)
    for i, av in enumerate(alpha):
        a[targets == i] = av
    return (a * (1 - pt) ** gamma * ce).mean()


def _torch_dice(logits, targets, weights=DICE_W, eps=1e-6):
    probs = F.softmax(logits, dim=1)
    losses = []
    for c in range(3):
        pc = probs[:, c]
        tc = (targets == c).float()
        inter = (pc * tc).sum(dim=(1, 2))
        union = pc.sum(dim=(1, 2)) + tc.sum(dim=(1, 2))
        dice = (2 * inter + eps) / (union + eps)
        losses.append(((1 - dice) * weights[c]).mean())
    return sum(losses) / len(losses)


def _torch_tversky(logits, targets, weights=TVERSKY_W, alpha=0.7, eps=1e-6):
    probs = F.softmax(logits, dim=1)
    losses = []
    for c in range(3):
        pc = probs[:, c]
        tc = (targets == c).float()
        tp = (pc * tc).sum(dim=(1, 2))
        fp = (pc * (1 - tc)).sum(dim=(1, 2))
        fn = ((1 - pc) * tc).sum(dim=(1, 2))
        tv = (tp + eps) / (tp + alpha * fp + (1 - alpha) * fn + eps)
        losses.append(((1 - tv) * weights[c]).mean())
    return sum(losses) / len(losses)


@pytest.fixture
def batch(rng):
    logits = rng.normal(size=(2, 16, 16, 3)).astype(np.float32) * 3
    targets = rng.integers(0, 3, size=(2, 16, 16)).astype(np.int32)
    return logits, targets


def _to_torch(logits, targets):
    return (
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(targets.astype(np.int64)),
    )


class TestFocal:
    def test_vs_torch(self, batch):
        logits, targets = batch
        tl, tt = _to_torch(logits, targets)
        expected = _torch_focal(tl, tt).item()
        ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets), ALPHA, 5.0, CE_W))
        assert ours == pytest.approx(expected, rel=1e-4)

    def test_valid_mask_all_ones_is_noop(self, batch):
        logits, targets = batch
        a = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets), ALPHA, 5.0, CE_W))
        b = float(
            focal_loss(
                jnp.asarray(logits), jnp.asarray(targets), ALPHA, 5.0, CE_W,
                valid_mask=jnp.ones(targets.shape, bool),
            )
        )
        assert a == pytest.approx(b, rel=1e-6)

    def test_mask_excludes_padding(self, batch):
        logits, targets = batch
        mask = np.ones(targets.shape, bool)
        mask[:, 8:, :] = False
        masked = float(
            focal_loss(jnp.asarray(logits), jnp.asarray(targets), ALPHA, 5.0, CE_W,
                       valid_mask=jnp.asarray(mask))
        )
        cropped = float(
            focal_loss(jnp.asarray(logits[:, :8]), jnp.asarray(targets[:, :8]),
                       ALPHA, 5.0, CE_W)
        )
        assert masked == pytest.approx(cropped, rel=1e-5)


class TestDiceTversky:
    def test_dice_vs_torch(self, batch):
        logits, targets = batch
        tl, tt = _to_torch(logits, targets)
        expected = _torch_dice(tl, tt).item()
        ours = float(dice_loss(jnp.asarray(logits), jnp.asarray(targets), DICE_W))
        assert ours == pytest.approx(expected, rel=1e-5)

    def test_tversky_vs_torch(self, batch):
        logits, targets = batch
        tl, tt = _to_torch(logits, targets)
        expected = _torch_tversky(tl, tt).item()
        ours = float(tversky_loss(jnp.asarray(logits), jnp.asarray(targets), TVERSKY_W))
        assert ours == pytest.approx(expected, rel=1e-5)


class TestCombined:
    def test_vs_torch_per_model_weights(self, batch):
        logits, targets = batch
        tl, tt = _to_torch(logits, targets)
        for model in ("enhanced_unet", "fcn", "linknet", "unet"):
            cfg = get_preset(model).loss
            expected = (
                cfg.focal_weight * _torch_focal(tl, tt)
                + cfg.dice_weight * _torch_dice(tl, tt)
                + cfg.tversky_weight * _torch_tversky(tl, tt)
            ).item()
            ours = float(combined_loss(jnp.asarray(logits), jnp.asarray(targets), cfg))
            assert ours == pytest.approx(expected, rel=1e-4), model

    def test_batched_equals_per_sample_loop(self, batch):
        """The reference loops samples with batch-of-1 losses and averages
        (train_eval.py:262-337); batched evaluation must match."""
        logits, targets = batch
        cfg = get_preset("unet").loss
        batched = float(combined_loss(jnp.asarray(logits), jnp.asarray(targets), cfg))
        per_sample = np.mean(
            [
                float(
                    combined_loss(
                        jnp.asarray(logits[i : i + 1]),
                        jnp.asarray(targets[i : i + 1]),
                        cfg,
                    )
                )
                for i in range(logits.shape[0])
            ]
        )
        assert batched == pytest.approx(per_sample, rel=1e-5)


class TestAux:
    def test_aux_supervision_math(self, batch):
        logits, targets = batch
        rng = np.random.default_rng(1)
        aux1 = rng.normal(size=logits.shape).astype(np.float32)
        aux2 = rng.normal(size=logits.shape).astype(np.float32)
        cfg = get_preset("enhanced_unet").loss

        total = float(
            combined_loss_with_aux(
                jnp.asarray(logits),
                {"unetpp": jnp.asarray(aux1), "deeplab": jnp.asarray(aux2)},
                jnp.asarray(targets),
                cfg,
            )
        )

        # independent recomposition
        tl, tt = _to_torch(logits, targets)
        def comb(l):
            return (
                cfg.focal_weight * _torch_focal(l, tt)
                + cfg.dice_weight * _torch_dice(l, tt)
                + cfg.tversky_weight * _torch_tversky(l, tt)
            )
        fused_probs = F.softmax(tl, dim=1)
        expected = comb(tl)
        for name, w, aux in (("unetpp", 0.6, aux1), ("deeplab", 0.5, aux2)):
            ta = torch.from_numpy(np.transpose(aux, (0, 3, 1, 2)))
            expected = expected + w * comb(ta)
            expected = expected + w * cfg.consistency_weight * F.mse_loss(
                F.softmax(ta, dim=1), fused_probs
            )
        assert total == pytest.approx(expected.item(), rel=1e-4)

    def test_no_aux_weights_is_plain_combined(self, batch):
        logits, targets = batch
        cfg = get_preset("unet").loss
        a = float(combined_loss(jnp.asarray(logits), jnp.asarray(targets), cfg))
        b = float(
            combined_loss_with_aux(
                jnp.asarray(logits), {}, jnp.asarray(targets), cfg
            )
        )
        assert a == b
