"""Bilinear resize matching torch F.interpolate(align_corners=False).

The reference calls F.interpolate(..., mode='bilinear', align_corners=False)
at every resolution change (train_eval.py:307, 411, 442-450, models.py:215).
jax.image.resize with method='linear' uses the same half-pixel-center
sampling convention, so the two agree to fp tolerance; tests/test_resize.py
pins this against torch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(
    x: jnp.ndarray,
    size: Tuple[int, int],
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC / NHWC-like) images to `size` = (H, W).

    antialias=False matches torch's F.interpolate exactly (torch never
    antialiases unless asked).
    """
    if x.ndim == 4:
        out_shape = (x.shape[0], size[0], size[1], x.shape[3])
    elif x.ndim == 3:
        out_shape = (size[0], size[1], x.shape[2])
    else:
        raise ValueError(f"expected 3D/4D input, got shape {x.shape}")
    return jax.image.resize(x, out_shape, method="linear", antialias=antialias)


def resize_bilinear_align_corners(
    x: jnp.ndarray, size: Tuple[int, int]
) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch nn.UpsamplingBilinear2d,
    which smp's DeepLabV3+ decoder and segmentation head use for their x4
    upsamplings).

    Output pixel i samples input position i * (H_in - 1) / (H_out - 1):
    corner pixels map exactly onto corner pixels.  Implemented as two
    separable 1-D linear gathers (jit-friendly, static shapes).
    """
    def _axis_weights(n_in: int, n_out: int):
        if n_out == 1 or n_in == 1:
            lo = jnp.zeros((n_out,), jnp.int32)
            return lo, lo, jnp.zeros((n_out,), jnp.float32)
        pos = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        frac = pos - lo.astype(jnp.float32)
        return lo, lo + 1, frac

    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    oh, ow = size
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    lo, hi, f = _axis_weights(h, oh)
    f = f[None, :, None, None]
    xf = xf[:, lo] * (1.0 - f) + xf[:, hi] * f
    lo, hi, f = _axis_weights(w, ow)
    f = f[None, None, :, None]
    xf = xf[:, :, lo] * (1.0 - f) + xf[:, :, hi] * f

    out = xf.astype(dtype)
    return out[0] if squeeze else out


def resize_bilinear_align_corners_s2d(
    x: jnp.ndarray, size: Tuple[int, int]
) -> jnp.ndarray:
    """space_to_depth(resize_bilinear_align_corners(x, size)) computed
    WITHOUT materialising the full-resolution tensor: each of the four s2d
    sub-pixel phases (a, b) samples the source at the full-res positions
    (2i+a, 2j+b) directly, so the output is the natural packing
    [N, H/2, W/2, 4C] built from four half-resolution separable gathers.

    Why: the DeepLabV3+ branch's final x4 logits upsample writes a
    3-channel full-res fp32 tensor (3/128 lane utilisation) that then
    feeds the fusion concat — the measured source of XLA layout copies
    around the [N,H,W,6] fusion tensors (benchmarks/op_trace.py).  In
    packed form the same math lands in 12-lane half-res layout and the
    full-res tensor never exists.  H and W must be even.
    """
    oh, ow = size
    if oh % 2 or ow % 2:
        raise ValueError(f"s2d resize needs even output size, got {size}")

    def _phase_weights(n_in: int, n_out_full: int, phase: int):
        idx = jnp.arange(phase, n_out_full, 2, dtype=jnp.float32)
        if n_out_full == 1 or n_in == 1:
            lo = jnp.zeros((idx.shape[0],), jnp.int32)
            return lo, lo, jnp.zeros((idx.shape[0],), jnp.float32)
        pos = idx * ((n_in - 1) / (n_out_full - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        return lo, lo + 1, pos - lo.astype(jnp.float32)

    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32)

    rows = []
    for a in range(2):
        lo, hi, f = _phase_weights(h, oh, a)
        f = f[None, :, None, None]
        rows.append(xf[:, lo] * (1.0 - f) + xf[:, hi] * f)  # [N,oh/2,w,C]
    phases = []
    for a in range(2):
        for b in range(2):
            lo, hi, f = _phase_weights(w, ow, b)
            f = f[None, None, :, None]
            phases.append(rows[a][:, :, lo] * (1.0 - f)
                          + rows[a][:, :, hi] * f)  # [N,oh/2,ow/2,C]
    out = jnp.stack(phases, axis=-2)  # [N,oh/2,ow/2,4,C] in (a*2+b) order
    out = out.reshape(n, oh // 2, ow // 2, 4 * c).astype(x.dtype)
    return out[0] if squeeze else out


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2, mode='bilinear', align_corners=False)."""
    return resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2))


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=2, mode='nearest') — what smp's UNet /
    UNet++ decoder blocks actually use; cheaper than bilinear (pure repeat,
    no interpolation arithmetic)."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


def pad_to_multiple(
    x: jnp.ndarray, multiple: int = 32, mode: str = "reflect"
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Bottom/right pad H, W of NHWC (or HWC) to the next multiple.

    Mirrors the reference's F.pad(..., mode='reflect') /32 snap
    (train_eval.py:249-253, 404-408).  Returns (padded, (h_pad, w_pad)).
    """
    h, w = x.shape[-3], x.shape[-2]
    h_pad = (multiple - h % multiple) % multiple
    w_pad = (multiple - w % multiple) % multiple
    if h_pad == 0 and w_pad == 0:
        return x, (0, 0)
    pad_width = [(0, 0)] * x.ndim
    pad_width[-3] = (0, h_pad)
    pad_width[-2] = (0, w_pad)
    return jnp.pad(x, pad_width, mode=mode), (h_pad, w_pad)
