"""Space-to-depth (s2d) packed compute for small-channel high-resolution
convolutions.

Why: on TPU the minor (lane) dimension of a tensor is padded to 128 and the
MXU produces 128 output lanes per pass.  The UNet++ decoder's row-0 tensors
(24-32 channels at 256x256) therefore waste ~4x HBM bandwidth on every pass
and can use at most 1/4 of the MXU on every conv (measured 7.7% MFU for the
branch, benchmarks/decoder_bench.py).  Packing 2x2 spatial blocks into
channels (32ch @ 256^2 -> 128ch @ 128^2) fills the lanes.

The rewrite is EXACT (not an approximation): a 3x3 SAME conv on the
original grid equals a 3x3 SAME conv on the NATURAL s2d packing with the
9 logical taps scattered into a zero-stuffed [3,3,4Cin,4Cout] kernel
(`s2d_kernel_same`).  The MXU cannot skip the structured zeros, so FLOPs
grow 4x — but lane utilisation grows 4x for Cout<=32 and every
elementwise/BN/concat pass saves 4x HBM bandwidth, a measured net win.

An earlier formulation (rephase the packing by one sub-pixel with a
pad+concat pass, then a 2x2 VALID conv — only 16/9 FLOP growth) was
benchmarked SLOWER despite the lower FLOP count: the rephase pass is pure
data movement (3.3 ms alone at [16,256,256,64]) and the odd-sized 257^2
VALID conv tiles poorly (benchmarks/head_bench.py: 9.0 vs 3.5 ms per
conv).  TPU lesson: zero-stuffed MXU work beats an extra HBM pass.

For inputs that are NEAREST-UPSAMPLED (the decoder's `up(below)` operand
and the full-res head input), the upsample never needs materialising:
conv3x3(nearest_up2x(x)) == s2d-packed conv3x3 of x with per-parity
collapsed taps (`fused_up_kernel`) — one conv at LOW resolution with no
FLOP waste and no 4x channel tile (head: 19.9 -> 6.6 ms,
benchmarks/head_bench.py).

Packing convention ("natural"): [N,H,W,C] -> [N,H/2,W/2,4C] with channel
index (a*2+b)*C + c for sub-pixel (a,b) — `space_to_depth`.  All packed
ops in models/packed_blocks.py keep this layout between ops.

No reference-code equivalent: the reference runs NCHW CUDA where cuDNN
handles small channel counts natively (SURVEY.md §2 #5); this is the
TPU-specific redesign of the same convolutions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# _SEL_SAME[dy, da, a, u] = 1 iff u == 2*(dy-1) + da - a + 1 (see
# `s2d_kernel_same`)
_SEL_SAME = np.zeros((3, 2, 2, 3), np.float32)
for _dy in range(3):
    for _da in range(2):
        for _a in range(2):
            _u = 2 * (_dy - 1) + _da - _a + 1
            if 0 <= _u <= 2:
                _SEL_SAME[_dy, _da, _a, _u] = 1.0

# _SEL_UP[d, a, u] = weight of original tap u on low-res offset d for output
# parity a, for a nearest-2x-upsampled input (see `fused_up_kernel`):
#   a=0: d=-1 <- w[0];        d=0 <- w[1]+w[2]
#   a=1: d=0  <- w[0]+w[1];   d=+1 <- w[2]
_SEL_UP = np.zeros((3, 2, 3), np.float32)
_SEL_UP[0, 0, 0] = 1.0
_SEL_UP[1, 0, 1] = _SEL_UP[1, 0, 2] = 1.0
_SEL_UP[1, 1, 0] = _SEL_UP[1, 1, 1] = 1.0
_SEL_UP[2, 1, 2] = 1.0


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,C] -> [N,H/2,W/2,4C] (natural packing, (a,b,c) channel order).
    H and W must be even."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `space_to_depth`."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * 2, w * 2, c)


def tile_as_packed_upsample(x: jnp.ndarray) -> jnp.ndarray:
    """space_to_depth(upsample2x_nearest(x)) without materialising the
    upsampled tensor: nearest-2x makes all four sub-pixels equal, so the
    packed form is just the channels tiled 4x.  (Prefer `fused_up_kernel`
    when the consumer is a 3x3 conv — then even the tile is unnecessary.)"""
    return jnp.tile(x, (1, 1, 1, 4))


def s2d_kernel_same(w: jnp.ndarray) -> jnp.ndarray:
    """Pack a 3x3 HWIO kernel [3,3,Cin,Cout] into a zero-stuffed
    [3,3,4Cin,4Cout] kernel so that conv3x3-SAME on the NATURAL packing
    equals the packing of conv3x3-SAME on the original.

    Derivation: output sub-pixel (a,b) at packed pixel (i,j) is original
    pixel (2i+a, 2j+b); original tap u reads row 2i+a+u-1, which lives at
    packed row i + dy - 1 (dy in 0..2), sub-row da with
    u = 2*(dy-1) + da - a + 1 (valid when 0 <= u <= 2; zero otherwise).
    SAME zero-padding on the packed grid corresponds exactly to SAME
    zero-padding on the original grid.
    """
    cin, cout = w.shape[2], w.shape[3]
    sel = jnp.asarray(_SEL_SAME, w.dtype)
    # packed[dy,dx,(da,db,cin),(a,b,cout)]
    packed = jnp.einsum("YdAu,XeBv,uvio->YXdeiABo", sel, sel, w)
    return packed.reshape(3, 3, 4 * cin, 4 * cout)


def s2d_kernel_same_multi(parts) -> jnp.ndarray:
    """`s2d_kernel_same` for a kernel whose input side is a CONCAT of packed
    tensors: `parts` is a list of [3,3,Cin_i,Cout] kernel slices (in concat
    order); returns [3,3,4*sum(Cin_i),4*Cout] matching the channel layout
    of jnp.concatenate([packed_i], -1)."""
    return jnp.concatenate([s2d_kernel_same(p) for p in parts], axis=2)


def fused_up_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Fuse nearest-2x upsampling into a 3x3 conv: returns [3,3,Cin,4Cout]
    such that conv3x3-SAME(nearest_up2x(x), w) ==
    depth_to_space(conv3x3-SAME(x, fused_up_kernel(w))).

    Derivation: out[2i+a] = sum_u w[u] * up[2i+a+u-1] and up[p] = x[p//2],
    so tap u reads x[i + (a+u-1)//2]: per output parity the 3 taps collapse
    onto 2 low-res offsets (weights _SEL_UP).  Border: zero-SAME padding at
    high res maps exactly to zero-SAME padding at low res.
    """
    cin, cout = w.shape[2], w.shape[3]
    sel = jnp.asarray(_SEL_UP, w.dtype)
    k = jnp.einsum("YAu,XBv,uvio->YXiABo", sel, sel, w)
    return k.reshape(3, 3, cin, 4 * cout)


# _SEL22[dy, da, a, u] = 1 iff logical tap u (0..2) of output sub-row a
# lands on 2x2-window row dy, sub-row da: the window for output sub-row a
# covers packed rows (i-1+a, i+a); tap u reads original row 2i+a+u-1 =
# packed row i + (a+u-1)//2, sub-row (a+u-1) % 2.
_SEL22 = np.zeros((2, 2, 2, 3), np.float32)
for _a in range(2):
    for _u in range(3):
        _r = _a + _u - 1
        _dy = _r // 2 + 1 - _a
        if 0 <= _dy <= 1:
            _SEL22[_dy, _r % 2, _a, _u] = 1.0


def aligned22_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Pack a 3x3 HWIO kernel [3,3,Ci,Co] into the [2,2,4Ci,4Co] kernel of
    the aligned-2x2 formulation (see `conv3x3_s2d` impl="aligned22"):
    36 of 64 slots non-zero = 16/9 MAC overhead vs the stuffed 3x3's 4x."""
    sel = jnp.asarray(_SEL22, w.dtype)
    k = jnp.einsum("YdAu,XeBv,uvio->YXdeiABo", sel, sel, w)
    cin, cout = w.shape[2], w.shape[3]
    return k.reshape(2, 2, 4 * cin, 4 * cout)


def aligned22_kernel_multi(parts) -> jnp.ndarray:
    """`aligned22_kernel` for a concat-of-packings input (cf.
    `s2d_kernel_same_multi`)."""
    return jnp.concatenate([aligned22_kernel(p) for p in parts], axis=2)


def conv3x3_aligned22(xp: jnp.ndarray, k22: jnp.ndarray,
                      precision=None) -> jnp.ndarray:
    """Logical 3x3 SAME conv on the natural packing via ONE 2x2 VALID conv
    over a one-packed-row-padded input; the four output sub-position groups
    are [h,w] slices of the [h+1,w+1] result, reassembled into the natural
    channel order.  16/9 MAC overhead instead of the stuffed kernel's 4x;
    the slices+concat are one output-sized data pass (fusable downstream).
    """
    n, h, w, _ = xp.shape
    co = k22.shape[3] // 4
    xpad = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xpad, k22, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision)                          # [N,h+1,w+1,4Co]
    parts = []
    for a in range(2):
        for b in range(2):
            s = (a * 2 + b) * co
            parts.append(y[:, a:a + h, b:b + w, s:s + co])
    return jnp.concatenate(parts, axis=-1)


def conv3x3_s2d(
    x_packed,
    stuffed_kernel: jnp.ndarray,
    up_input: jnp.ndarray | None = None,
    up_kernel: jnp.ndarray | None = None,
    precision=None,
) -> jnp.ndarray:
    """3x3 SAME conv computed entirely in packed space.

    x_packed: one natural-packed [N,h,w,4Cin] tensor OR a list of packed
    tensors (the logical concat, in order), or None/[] when the input is
    only `up_input`.  stuffed_kernel: [3,3,4Cin_total,4Cout] from
    `s2d_kernel_same(_multi)`.  up_input/up_kernel: an optional additional
    UNPACKED operand [N,h,w,Cup] whose logical contribution is
    conv3x3(nearest_up2x(up_input)) — computed via `fused_up_kernel` with
    no upsample materialisation (linearity of conv over the channel
    concat).  Kernels must already be cast to the compute dtype.  Returns
    natural-packed [N,h,w,4Cout]."""

    def _conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )

    y = None
    if x_packed is not None:
        if isinstance(x_packed, (list, tuple)):
            if x_packed:
                x = (jnp.concatenate(x_packed, axis=-1)
                     if len(x_packed) > 1 else x_packed[0])
                y = _conv(x, stuffed_kernel)
        else:
            y = _conv(x_packed, stuffed_kernel)
    if up_input is not None:
        yu = _conv(up_input, up_kernel)
        y = yu if y is None else y + yu
    return y


# ---------------------------------------------------------------------------
# CHANNEL-MAJOR packing (encoder high-res segment)
#
# The decoder uses the natural/position-major layout above (channel index
# (a*2+b)*C + c) because its convs are dense 4C->4C.  The ENCODER's hot op
# is the depthwise conv, which in packed space mixes only the four
# sub-position planes of ONE logical channel — a grouped conv whose groups
# must be contiguous channels, so the encoder segment packs CHANNEL-MAJOR
# (index c*4 + (a*2+b)).  benchmarks/enc_packed_bench.py is the receipt.
# ---------------------------------------------------------------------------

def space_to_depth_cm(x: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,C] -> [N,H/2,W/2,4C], channel-major (index c*4 + (a*2+b))."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space_cm(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `space_to_depth_cm`."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * 2, w * 2, c)


def dw_kernel_cm(w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise [3,3,1,C] (flax depthwise layout) -> grouped zero-stuffed
    [3,3,4,4C] kernel: conv(feature_group_count=C) over the channel-major
    packing == packing of the logical depthwise 3x3 SAME conv.  Group c
    covers packed channels [4c, 4c+4)."""
    wdw = w[:, :, 0, :]                      # [3,3,C]
    sel = jnp.asarray(_SEL_SAME, w.dtype)
    k = jnp.einsum("YdAu,XeBv,uvc->YXdecAB", sel, sel, wdw)
    return k.reshape(3, 3, 4, wdw.shape[2] * 4)


def pw_kernel_cm(w: jnp.ndarray) -> jnp.ndarray:
    """1x1 [1,1,Ci,Co] -> channel-major block-diagonal [1,1,4Ci,4Co]
    (kron(w, I4)): the logical per-pixel projection applied to each of the
    four sub-positions."""
    ci, co = w.shape[2], w.shape[3]
    return jnp.kron(w[0, 0], jnp.eye(4, dtype=w.dtype)).reshape(
        1, 1, 4 * ci, 4 * co)


# stride-2 depthwise consuming a channel-major packed tensor: with TF-SAME
# stride-2 k3 at even sizes (pad low 0 / high 1), logical out(Y,X) reads
# logical rows 2Y..2Y+2 = packed row Y (both sub-rows) + packed row Y+1
# (sub-row 0): a 2x2 conv over the packed grid with (0,1) padding.
# _SEL_S2[dy, a, u] = 1 iff u == 2*dy + a.
_SEL_S2 = np.zeros((2, 2, 3), np.float32)
for _dy in range(2):
    for _a in range(2):
        if 2 * _dy + _a <= 2:
            _SEL_S2[_dy, _a, 2 * _dy + _a] = 1.0


def dw_s2_kernel_cm(w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise [3,3,1,C] stride-2 -> [2,2,4,C] grouped kernel over the
    channel-major packed input; the conv output is the UNPACKED
    half-resolution tensor (use padding ((0,1),(0,1)))."""
    wdw = w[:, :, 0, :]
    sel = jnp.asarray(_SEL_S2, w.dtype)
    k = jnp.einsum("dAu,eBv,uvc->decAB", sel, sel, wdw)  # [2,2,C,2,2]
    return k.transpose(0, 1, 3, 4, 2).reshape(2, 2, 4, wdw.shape[2])


def packed_1x1_spatial_kernel(w: jnp.ndarray, bias=None):
    """Pack a 1x1 HWIO kernel [1,1,C,K] into a block-diagonal
    [1,1,4C,4K] kernel computing the same per-pixel projection per
    sub-position (used for the scSE spatial gate, K=1).  Returns
    (packed_kernel, packed_bias|None); packed output channel layout is
    (a,b,k)."""
    c, k = w.shape[2], w.shape[3]
    out = jnp.kron(jnp.eye(4, dtype=w.dtype), w[0, 0]).reshape(1, 1, 4 * c, 4 * k)
    pb = None if bias is None else jnp.tile(bias, 4)
    return out, pb
