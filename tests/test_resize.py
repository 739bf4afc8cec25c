"""Bilinear resize parity vs torch F.interpolate(align_corners=False) —
the interpolation used throughout the reference (train_eval.py:307 etc.)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from enhanced_unet_tpu.ops.resize import pad_to_multiple, resize_bilinear, upsample2x


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((16, 16), (32, 32)), ((32, 48), (17, 29)), ((20, 20), (15, 15)),
     ((8, 8), (64, 64))],
)
def test_matches_torch_bilinear(rng, in_hw, out_hw):
    x = rng.random((1, *in_hw, 3)).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), out_hw)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    theirs = F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=False)
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_upsample2x_matches_torch(rng):
    x = rng.random((2, 9, 13, 4)).astype(np.float32)
    ours = upsample2x(jnp.asarray(x))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    theirs = F.interpolate(xt, scale_factor=2, mode="bilinear",
                           align_corners=False)
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_pad_to_multiple_matches_torch_reflect(rng):
    x = rng.random((1, 30, 45, 3)).astype(np.float32)
    padded, (hp, wp) = pad_to_multiple(jnp.asarray(x), 32)
    assert padded.shape == (1, 32, 64, 3)
    assert (hp, wp) == (2, 19)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    theirs = F.pad(xt, (0, wp, 0, hp), mode="reflect")
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(padded), theirs, atol=1e-7)


def test_pad_noop_when_aligned(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    padded, (hp, wp) = pad_to_multiple(x, 32)
    assert padded.shape == x.shape and hp == 0 and wp == 0


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 16), (64, 64)),   # x4 (smp DeepLabV3+ decoder/head upsampling)
    ((7, 11), (28, 44)),
    ((13, 9), (5, 17)),     # down + up mix
])
def test_align_corners_matches_torch(rng, in_hw, out_hw):
    from enhanced_unet_tpu.ops.resize import resize_bilinear_align_corners

    x = rng.random((2, *in_hw, 5)).astype(np.float32)
    ours = resize_bilinear_align_corners(jnp.asarray(x), out_hw)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    theirs = F.interpolate(xt, size=out_hw, mode="bilinear",
                           align_corners=True)
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_align_corners_hwc(rng):
    from enhanced_unet_tpu.ops.resize import resize_bilinear_align_corners

    x = rng.random((9, 9, 3)).astype(np.float32)
    out = resize_bilinear_align_corners(jnp.asarray(x), (18, 18))
    assert out.shape == (18, 18, 3)
