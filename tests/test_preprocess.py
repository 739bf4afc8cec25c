"""On-device preprocessing parity vs OpenCV (cv2 is the oracle).

The oracle functions below re-state the reference pipeline
(dataset.py:58-131, train_eval.py:380-392) in cv2/numpy; our jnp ops must
match within +/-2 grey levels (accumulated 8-bit rounding differences).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from enhanced_unet_tpu.ops.preprocess import (  # noqa: E402
    cell_specific_preprocess,
    clahe_u8,
    edge_channel,
    eval_preprocess,
    gaussian_blur_3x3,
    hsv_to_rgb_u8,
    lab_to_rgb_u8,
    rgb_to_gray_u8,
    rgb_to_hsv_u8,
    rgb_to_lab_u8,
    sharpen_filter,
    unsharp_mask,
)


@pytest.fixture
def img_u8(rng):
    # smooth-ish synthetic micrograph: blobs on noisy background
    h, w = 64, 96
    yy, xx = np.mgrid[:h, :w]
    base = 120 + 40 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
    noise = rng.normal(0, 12, size=(h, w, 3))
    img = np.clip(base[..., None] + noise, 0, 255).astype(np.uint8)
    return img


def _maxdiff(a, b):
    return np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max()


class TestColor:
    def test_rgb2lab(self, img_u8):
        expected = cv2.cvtColor(img_u8, cv2.COLOR_RGB2LAB)
        ours = rgb_to_lab_u8(jnp.asarray(img_u8, jnp.float32))
        assert _maxdiff(ours, expected) <= 1.0

    def test_lab2rgb(self, img_u8):
        lab = cv2.cvtColor(img_u8, cv2.COLOR_RGB2LAB)
        expected = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
        ours = lab_to_rgb_u8(jnp.asarray(lab, jnp.float32))
        # fp32 cbrt/pow rounding flips a handful of half-way pixels by 2
        d = np.abs(np.asarray(ours, np.float64) - expected.astype(np.float64))
        assert d.max() <= 2.0
        assert d.mean() < 0.5

    def test_rgb2gray(self, img_u8):
        expected = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)
        ours = rgb_to_gray_u8(jnp.asarray(img_u8, jnp.float32))
        assert _maxdiff(ours, expected) <= 1.0

    def test_hsv_roundtrip(self, img_u8):
        expected = cv2.cvtColor(img_u8, cv2.COLOR_RGB2HSV)
        ours = rgb_to_hsv_u8(jnp.asarray(img_u8, jnp.float32))
        # hue is cyclic mod 180
        dh = np.abs(np.asarray(ours)[..., 0] - expected[..., 0].astype(float))
        dh = np.minimum(dh, 180 - dh)
        assert dh.max() <= 1.0
        assert _maxdiff(np.asarray(ours)[..., 1:], expected[..., 1:]) <= 1.0
        back = hsv_to_rgb_u8(jnp.asarray(expected, jnp.float32))
        expected_back = cv2.cvtColor(expected, cv2.COLOR_HSV2RGB)
        assert _maxdiff(back, expected_back) <= 2.0


class TestCLAHE:
    @pytest.mark.parametrize("clip", [2.0, 2.5, 3.0])
    def test_vs_cv2(self, img_u8, clip):
        gray = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)
        expected = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8)).apply(gray)
        ours = clahe_u8(jnp.asarray(gray, jnp.float32), clip_limit=clip)
        assert _maxdiff(ours, expected) <= 1.0

    def test_flat_image_stays_flat(self):
        flat = np.full((64, 64), 128, np.uint8)
        expected = cv2.createCLAHE(2.5, (8, 8)).apply(flat)
        ours = clahe_u8(jnp.asarray(flat, jnp.float32), clip_limit=2.5)
        assert _maxdiff(ours, expected) <= 1.0


class TestFilters:
    def test_edge_channel(self, img_u8):
        gray = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)
        sx = cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3)
        sy = cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3)
        mag = np.sqrt(sx ** 2 + sy ** 2)
        en = np.clip(mag / (mag.max() + 1e-6) * 255, 0, 255).astype(np.uint8)
        lap = cv2.Laplacian(gray, cv2.CV_64F)
        ln = np.clip(np.abs(lap) / (np.abs(lap).max() + 1e-6) * 255, 0, 255).astype(
            np.uint8
        )
        expected = (en.astype(np.float32) * 0.7 + ln.astype(np.float32) * 0.3).astype(
            np.uint8
        )
        ours = edge_channel(jnp.asarray(gray, jnp.float32))
        assert _maxdiff(ours, expected) <= 1.0

    def test_gaussian_blur(self, img_u8):
        expected = cv2.GaussianBlur(img_u8, (3, 3), 1.0)
        ours = gaussian_blur_3x3(jnp.asarray(img_u8, jnp.float32))
        assert _maxdiff(ours, expected) <= 1.0

    def test_unsharp(self, img_u8):
        gaussian = cv2.GaussianBlur(img_u8, (3, 3), 1.0)
        expected = cv2.addWeighted(img_u8, 1.3, gaussian, -0.3, 0)
        ours = unsharp_mask(jnp.asarray(img_u8, jnp.float32))
        assert _maxdiff(ours, expected) <= 2.0

    def test_sharpen_filter(self, img_u8):
        kernel = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]]) * 0.15
        expected = cv2.filter2D(img_u8, -1, kernel)
        ours = sharpen_filter(jnp.asarray(img_u8, jnp.float32))
        assert _maxdiff(ours, expected) <= 2.0


def _oracle_cell_preprocess(image, live_mask, dead_mask):
    """cv2 restatement of dataset.py:58-131."""
    lab = cv2.cvtColor(image, cv2.COLOR_RGB2LAB)
    l, a, b = cv2.split(lab)
    l = cv2.createCLAHE(clipLimit=2.5, tileGridSize=(8, 8)).apply(l)
    image_clahe = cv2.cvtColor(cv2.merge([l, a, b]), cv2.COLOR_LAB2RGB)

    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
    sx = cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3)
    sy = cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3)
    mag = np.sqrt(sx ** 2 + sy ** 2)
    en = np.clip(mag / (mag.max() + 1e-6) * 255, 0, 255).astype(np.uint8)
    lap = cv2.Laplacian(gray, cv2.CV_64F)
    ln = np.clip(np.abs(lap) / (np.abs(lap).max() + 1e-6) * 255, 0, 255).astype(
        np.uint8
    )
    edges = (en.astype(np.float32) * 0.7 + ln.astype(np.float32) * 0.3).astype(
        np.uint8
    )
    edges_rgb = cv2.cvtColor(edges, cv2.COLOR_GRAY2RGB)

    if live_mask.sum() > 0:
        m3 = np.stack([live_mask] * 3, axis=2)
        enh = np.clip(image_clahe.astype(np.float32) * 1.1, 0, 255).astype(np.uint8)
        image_clahe = np.where(m3 > 0, enh, image_clahe)
    if dead_mask.sum() > 0:
        m3 = np.stack([dead_mask] * 3, axis=2)
        dg = cv2.cvtColor(image_clahe, cv2.COLOR_RGB2GRAY)
        dc = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(dg)
        dc3 = cv2.cvtColor(dc, cv2.COLOR_GRAY2RGB)
        image_clahe = np.where(m3 > 0, dc3, image_clahe)

    iwe = np.clip(
        image_clahe.astype(np.float32) * 0.9 + edges_rgb.astype(np.float32) * 0.1,
        0,
        255,
    ).astype(np.uint8)
    final = (iwe.astype(np.float32) * 0.85 + image.astype(np.float32) * 0.15).astype(
        np.uint8
    )
    gaussian = cv2.GaussianBlur(final, (3, 3), 1.0)
    unsharp = cv2.addWeighted(final, 1.3, gaussian, -0.3, 0)
    return np.clip(unsharp, 0, 255).astype(np.uint8)


class TestPipelines:
    def test_cell_specific_preprocess(self, img_u8, rng):
        h, w = img_u8.shape[:2]
        live = np.zeros((h, w), np.uint8)
        dead = np.zeros((h, w), np.uint8)
        live[10:24, 10:30] = 1
        dead[40:56, 50:80] = 1
        expected = _oracle_cell_preprocess(img_u8, live, dead)
        ours = cell_specific_preprocess(
            jnp.asarray(img_u8, jnp.float32),
            jnp.asarray(live),
            jnp.asarray(dead),
        )
        d = np.abs(np.asarray(ours, np.float64) - expected.astype(np.float64))
        # Stage-level parity is +/-1 grey level (classes above), but CLAHE's
        # discrete LUT amplifies +/-1 seeds from fp32-vs-fixed-point LAB:
        # composed pipelines agree in bulk with isolated amplified pixels.
        assert d.mean() < 3.0
        assert np.quantile(d, 0.99) <= 12.0
        assert d.max() <= 32.0

    def test_eval_preprocess(self, img_u8):
        lab = cv2.cvtColor(img_u8, cv2.COLOR_RGB2LAB)
        l, a, b = cv2.split(lab)
        l = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(l)
        enhanced = cv2.cvtColor(cv2.merge([l, a, b]), cv2.COLOR_LAB2RGB)
        kernel = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]]) * 0.15
        expected = np.clip(cv2.filter2D(enhanced, -1, kernel), 0, 255)
        ours = eval_preprocess(jnp.asarray(img_u8, jnp.float32))
        d = np.abs(np.asarray(ours, np.float64) - expected.astype(np.float64))
        # same CLAHE LUT amplification as above (composed tolerance)
        assert d.mean() < 3.0
        assert np.quantile(d, 0.99) <= 12.0
        assert d.max() <= 32.0
