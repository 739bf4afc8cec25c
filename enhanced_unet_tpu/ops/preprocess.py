"""On-device image preprocessing: the reference's CPU/OpenCV feature
engineering re-built as jit-safe jnp ops.

Parity targets:
- `cell_specific_preprocess`: dataset.py:58-131
  (_apply_cell_specific_preprocessing — LAB CLAHE, Sobel+Laplacian edge
  channel, GT-conditioned region enhancement, blends, unsharp mask)
- `eval_preprocess`: train_eval.py:380-392 / 622-633 (CLAHE clip 2.0 +
  0.15-sharpen used at inference)

All functions operate on float32 arrays holding uint8-domain values
(0..255) and reproduce OpenCV's quantization at every stage boundary:
cv2 ops round half-to-even (`jnp.rint`), numpy `.astype(np.uint8)` in the
reference truncates (`jnp.floor` after clip) — both are modeled so outputs
match the reference within +/-1 grey level (validated in
tests/test_preprocess.py against cv2).

TPU notes: everything is static-shape and fuses under jit; CLAHE is the one
gather-heavy op (per-pixel LUT lookup).  A Pallas CLAHE was built and
benchmarked in round 2 and RETIRED — the XLA lowering won in situ (see
docs/ARCHITECTURE.md "Pallas verdict"); this jnp version is the production
path.  Sobel/Laplacian/Gaussian are depthwise convs on the VPU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# rounding helpers (OpenCV vs numpy semantics)
# ---------------------------------------------------------------------------

def _u8_round(x: jnp.ndarray) -> jnp.ndarray:
    """cv2 saturate_cast<uchar>: clip + round-half-to-even."""
    return jnp.clip(jnp.rint(x), 0.0, 255.0)


def _u8_trunc(x: jnp.ndarray) -> jnp.ndarray:
    """np.clip(x, 0, 255).astype(np.uint8): clip + truncate toward zero."""
    return jnp.floor(jnp.clip(x, 0.0, 255.0))


# ---------------------------------------------------------------------------
# color conversions (OpenCV 8-bit conventions)
# ---------------------------------------------------------------------------

_XYZ_FROM_RGB = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=jnp.float32,
)
_RGB_FROM_XYZ = jnp.array(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ],
    dtype=jnp.float32,
)
_WHITE = jnp.array([0.950456, 1.0, 1.088754], dtype=jnp.float32)


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1 / 2.4) - 0.055)


def rgb_to_lab_u8(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(COLOR_RGB2LAB) for uint8-domain float input [H,W,3].

    OpenCV's 8-bit path applies sRGB gamma before the XYZ matrix (validated
    empirically; see tests).  L is scaled to 0..255, a/b offset by 128.
    """
    c = _srgb_to_linear(img / 255.0)
    xyz = jnp.einsum("...c,kc->...k", c, _XYZ_FROM_RGB) / _WHITE
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    L = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (f(x) - f(y)) + 128.0
    b = 200.0 * (f(y) - f(z)) + 128.0
    lab = jnp.stack([L * 255.0 / 100.0, a, b], axis=-1)
    return _u8_round(lab)


def lab_to_rgb_u8(lab: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(COLOR_LAB2RGB) inverse of rgb_to_lab_u8."""
    L = lab[..., 0] * (100.0 / 255.0)
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(f):
        return jnp.where(f ** 3 > 0.008856, f ** 3, (f - 16.0 / 116.0) / 7.787)

    y = jnp.where(L > 903.3 * 0.008856, fy ** 3, L / 903.3)
    xyz = jnp.stack([finv(fx), y, finv(fz)], axis=-1) * _WHITE
    rgb = jnp.einsum("...c,kc->...k", xyz, _RGB_FROM_XYZ)
    rgb = _linear_to_srgb(jnp.clip(rgb, 0.0, 1.0))
    return _u8_round(rgb * 255.0)


def rgb_to_gray_u8(img: jnp.ndarray) -> jnp.ndarray:
    """cv2 RGB2GRAY fixed-point: (R*4899 + G*9617 + B*1868 + 8192) >> 14."""
    s = img[..., 0] * 4899.0 + img[..., 1] * 9617.0 + img[..., 2] * 1868.0
    return jnp.floor((s + 8192.0) / 16384.0)


def rgb_to_hsv_u8(img: jnp.ndarray) -> jnp.ndarray:
    """cv2 RGB2HSV for uint8: H in 0..180, S/V in 0..255."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    s = jnp.where(v > 0, _u8_round(255.0 * diff / jnp.maximum(v, 1e-12)), 0.0)
    safe = jnp.maximum(diff, 1e-12)
    h = jnp.where(
        v == r,
        60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe, 240.0 + 60.0 * (r - g) / safe),
    )
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h)
    return jnp.stack([_u8_round(h / 2.0), s, v], axis=-1)


def hsv_to_rgb_u8(hsv: jnp.ndarray) -> jnp.ndarray:
    """cv2 HSV2RGB for uint8 (H in 0..180)."""
    h = hsv[..., 0] * 2.0
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    hh = (h / 60.0) % 6.0
    i = jnp.floor(hh)
    f = hh - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return _u8_round(jnp.stack([r, g, b], axis=-1))


# ---------------------------------------------------------------------------
# CLAHE (contrast-limited adaptive histogram equalization)
# ---------------------------------------------------------------------------

def clahe_dynamic(
    channel: jnp.ndarray,
    clip: jnp.ndarray,
    grid: Tuple[int, int] = (8, 8),
) -> jnp.ndarray:
    """CLAHE with a *traced* integer clip threshold (used by the random-CLAHE
    augmentation stage, dataset.py:266-272, where clipLimit is sampled).

    `clip` must already be max(int(clip_limit * tile_area / 256), 1)."""
    h, w = channel.shape
    gy, gx = grid
    if h % gy or w % gx:
        raise ValueError(f"CLAHE input {h}x{w} must divide grid {grid}")
    th, tw = h // gy, w // gx
    tile_area = th * tw
    scale = 255.0 / tile_area

    v = jnp.clip(channel, 0, 255).astype(jnp.int32)
    tiles = v.reshape(gy, th, gx, tw).transpose(0, 2, 1, 3).reshape(
        gy * gx, tile_area
    )

    # Per-tile histograms as a dense compare + reduce instead of
    # scatter-add: TPU serializes scatters (the original
    # `.at[vals].add(1)` measured 200+ ms at 2048^2,
    # benchmarks/clahe_breakdown.py), while the [A, 256] one-hot compare
    # fuses into a single vector-unit reduction pass.  Counts <= tile
    # area are exact in the f32 accumulator.
    bins = jnp.arange(256, dtype=v.dtype)
    hists = jnp.sum(
        (tiles[:, :, None] == bins).astype(jnp.bfloat16),
        axis=1, dtype=jnp.float32,
    ).astype(jnp.int32)                                   # [T, 256]

    def tile_lut(hist):
        excess = jnp.sum(jnp.maximum(hist - clip, 0))
        hist = jnp.minimum(hist, clip) + excess // 256
        residual = excess % 256
        step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
        idx = jnp.arange(256)
        bump = (residual > 0) & (idx % step == 0) & (idx // step < residual)
        hist = hist + bump.astype(jnp.int32)
        return jnp.rint(jnp.cumsum(hist) * scale)

    luts = jax.vmap(tile_lut)(hists).reshape(gy, gx, 256)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    tyf = ys / th - 0.5
    txf = xs / tw - 0.5
    ty1 = jnp.floor(tyf).astype(jnp.int32)
    tx1 = jnp.floor(txf).astype(jnp.int32)
    ya = (tyf - ty1)[:, None]
    xa = (txf - tx1)[None, :]

    if th % 2 == 0 and tw % 2 == 0:
        # The four neighbour-tile LUT reads are piecewise constant per
        # HALF-TILE block (the standard CLAHE quadrant structure:
        # floor(y/th - 0.5) changes at half-tile boundaries), so instead
        # of four full-image gathers from the [gy, gx, 256] table, build
        # one combined [2gy, 2gx, 256, 4] table (tiny) and do ONE
        # per-block gather of [..., 4] — measured 8x faster on TPU
        # (benchmarks/clahe_breakdown.py).
        th2, tw2 = th // 2, tw // 2
        qy = jnp.arange(2 * gy)
        qx = jnp.arange(2 * gx)
        ty1b = jnp.clip((qy - 1) // 2, 0, gy - 1)
        ty2b = jnp.clip((qy - 1) // 2 + 1, 0, gy - 1)
        tx1b = jnp.clip((qx - 1) // 2, 0, gx - 1)
        tx2b = jnp.clip((qx - 1) // 2 + 1, 0, gx - 1)
        luts4 = jnp.stack(
            [
                luts[ty1b[:, None], tx1b[None, :]],
                luts[ty1b[:, None], tx2b[None, :]],
                luts[ty2b[:, None], tx1b[None, :]],
                luts[ty2b[:, None], tx2b[None, :]],
            ],
            axis=-1,
        )                                     # [2gy, 2gx, 256, 4]
        vq = v.reshape(2 * gy, th2, 2 * gx, tw2).transpose(0, 2, 1, 3)
        l4 = jax.vmap(jax.vmap(lambda tbl, vb: tbl[vb]))(
            luts4, vq)                        # [2gy, 2gx, th2, tw2, 4]
        l4 = l4.transpose(0, 2, 1, 3, 4).reshape(h, w, 4)
        wgt = jnp.stack(
            [
                (1 - xa) * (1 - ya),
                xa * (1 - ya),
                (1 - xa) * ya,
                xa * ya,
            ],
            axis=-1,
        )                                     # [h, w, 4]
        out = jnp.sum(l4 * wgt, axis=-1)
        return _u8_round(out)

    ty1c = jnp.clip(ty1, 0, gy - 1)[:, None]
    ty2c = jnp.clip(ty1 + 1, 0, gy - 1)[:, None]
    tx1c = jnp.clip(tx1, 0, gx - 1)[None, :]
    tx2c = jnp.clip(tx1 + 1, 0, gx - 1)[None, :]

    l11 = luts[ty1c, tx1c, v]
    l12 = luts[ty1c, tx2c, v]
    l21 = luts[ty2c, tx1c, v]
    l22 = luts[ty2c, tx2c, v]
    out = (
        l11 * (1 - xa) * (1 - ya)
        + l12 * xa * (1 - ya)
        + l21 * (1 - xa) * ya
        + l22 * xa * ya
    )
    return _u8_round(out)


@partial(jax.jit, static_argnames=("clip_limit", "grid"))
def clahe_u8(
    channel: jnp.ndarray,
    clip_limit: float = 2.5,
    grid: Tuple[int, int] = (8, 8),
) -> jnp.ndarray:
    """cv2.createCLAHE(clipLimit, tileGridSize).apply for one uint8-domain
    channel [H, W] (H, W divisible by the grid; /32-snapped inputs are).

    Matches OpenCV's algorithm: integer clip threshold
    max(int(clip*tileArea/256), 1); even excess redistribution plus the
    stepped residual pass; LUT = rint(cdf * 255/tileArea); output =
    rint of bilinear interpolation between the 4 neighbouring tile LUTs
    with tile coords ty = y/tile_h - 0.5.  Validated +/-1 vs cv2.
    """
    h, w = channel.shape
    gy, gx = grid
    th, tw = h // gy, w // gx
    clip = jnp.asarray(max(int(clip_limit * th * tw / 256), 1), jnp.int32)
    return clahe_dynamic(channel, clip, grid)


def clahe_on_l_channel(img: jnp.ndarray, clip_limit: float,
                       grid: Tuple[int, int] = (8, 8)) -> jnp.ndarray:
    """LAB-space CLAHE on the L channel (the reference's standard enhance:
    dataset.py:63-71, train_eval.py:380-385)."""
    lab = rgb_to_lab_u8(img)
    l_enh = clahe_u8(lab[..., 0], clip_limit=clip_limit, grid=grid)
    lab = lab.at[..., 0].set(l_enh)
    return lab_to_rgb_u8(lab)


# ---------------------------------------------------------------------------
# small convolutions (reflect-101 borders, OpenCV default)
# ---------------------------------------------------------------------------

def _conv2d_same(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """2D convolution of [H,W] (or [H,W,C] depthwise) with reflect-101 pad."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    xp = jnp.pad(x, ((ph, ph), (pw, pw), (0, 0)), mode="reflect")
    # depthwise via dimension_numbers NHWC/HWIO with feature groups
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, c)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xp[None],
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )[0]
    return y[..., 0] if squeeze else y


_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=jnp.float32)
_SOBEL_Y = _SOBEL_X.T
_LAPLACIAN = jnp.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=jnp.float32)
_SHARPEN = jnp.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]], dtype=jnp.float32)


def edge_channel(gray: jnp.ndarray) -> jnp.ndarray:
    """Sobel-magnitude + Laplacian edge feature (dataset.py:74-88):
    each normalized by its max to 0..255 (trunc), blended 0.7/0.3 (trunc)."""
    sx = _conv2d_same(gray, _SOBEL_X)
    sy = _conv2d_same(gray, _SOBEL_Y)
    mag = jnp.sqrt(sx ** 2 + sy ** 2)
    edges = _u8_trunc(mag / (mag.max() + 1e-6) * 255.0)
    lap = jnp.abs(_conv2d_same(gray, _LAPLACIAN))
    lap_n = _u8_trunc(lap / (lap.max() + 1e-6) * 255.0)
    return _u8_trunc(edges * 0.7 + lap_n * 0.3)


def gaussian_blur_3x3(img: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """cv2.GaussianBlur(ksize=(3,3), sigma) on uint8-domain input."""
    x = jnp.exp(-0.5 * (jnp.arange(-1, 2, dtype=jnp.float32) / sigma) ** 2)
    k1 = x / x.sum()
    kernel = jnp.outer(k1, k1)
    return _u8_round(_conv2d_same(img, kernel))


def sharpen_filter(img: jnp.ndarray, strength: float = 0.15) -> jnp.ndarray:
    """cv2.filter2D with the reference's 3x3 sharpen kernel * strength
    (train_eval.py:388-392, dataset.py:288-292).  NOTE: cv2.filter2D
    correlates (no kernel flip); the kernel is symmetric so it's identical.
    """
    return _u8_round(_conv2d_same(img, _SHARPEN * strength))


def unsharp_mask(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.addWeighted(img, 1.3, GaussianBlur(img, 3x3, 1.0), -0.3, 0)
    (dataset.py:127-129)."""
    blurred = gaussian_blur_3x3(img)
    return _u8_round(img * 1.3 + blurred * (-0.3))


# ---------------------------------------------------------------------------
# full pipelines
# ---------------------------------------------------------------------------

@jax.jit
def cell_specific_preprocess(
    image: jnp.ndarray,
    live_mask: jnp.ndarray,
    dead_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Train-time feature engineering (dataset.py:58-131), fully on-device.

    image: [H,W,3] uint8-domain float; live/dead_mask: [H,W] {0,1} unions of
    the GT instance masks per class (the reference's np.maximum reduction,
    dataset.py:93-100).  The GT-conditioned stages are a train-time-only
    transform (they leak labels by design in the reference; see SURVEY §7).
    """
    image = image.astype(jnp.float32)
    # stage 1: LAB CLAHE clip 2.5, 8x8
    image_clahe = clahe_on_l_channel(image, clip_limit=2.5)
    # stage 2: edge feature from the ORIGINAL image's gray
    gray = rgb_to_gray_u8(image)
    edges = edge_channel(gray)
    edges_rgb = jnp.stack([edges, edges, edges], axis=-1)
    # stage 3.1: live regions — brightness x1.1 (trunc, dataset.py:104-106)
    live3 = live_mask[..., None] > 0
    live_enhanced = _u8_trunc(image_clahe * 1.1)
    image_clahe = jnp.where(live3, live_enhanced, image_clahe)
    # stage 3.2: dead regions — re-CLAHE (clip 3.0) of the gray of the
    # current image (dataset.py:109-114)
    dead3 = dead_mask[..., None] > 0
    dead_gray = rgb_to_gray_u8(image_clahe)
    dead_clahe = clahe_u8(dead_gray, clip_limit=3.0)
    dead_rgb = jnp.stack([dead_clahe] * 3, axis=-1)
    image_clahe = jnp.where(dead3, dead_rgb, image_clahe)
    # stage 4: edge fusion 0.9/0.1 then 0.85/0.15 blend with original (trunc)
    image_with_edges = _u8_trunc(image_clahe * 0.9 + edges_rgb * 0.1)
    image_final = _u8_trunc(image_with_edges * 0.85 + image * 0.15)
    # stage 5: unsharp mask (cv2 rounding) then final clip
    return _u8_trunc(unsharp_mask(image_final))


@jax.jit
def eval_preprocess(image: jnp.ndarray) -> jnp.ndarray:
    """Inference-time enhance (train_eval.py:380-392): LAB CLAHE clip 2.0 +
    0.15 sharpen.  Input/output uint8-domain float [H,W,3]."""
    image = image.astype(jnp.float32)
    image = clahe_on_l_channel(image, clip_limit=2.0)
    return sharpen_filter(image, strength=0.15)
