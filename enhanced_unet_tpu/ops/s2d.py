"""Space-to-depth (s2d) packed compute for small-channel high-resolution
convolutions.

Why: on TPU the minor (lane) dimension of a tensor is padded to 128 and the
MXU produces 128 output lanes per pass.  The UNet++ decoder's row-0 tensors
(24-32 channels at 256x256) therefore waste ~4x HBM bandwidth on every pass
and can use at most 1/4 of the MXU on every conv (measured 7.7% MFU for the
branch, benchmarks/decoder_bench.py).  Packing 2x2 spatial blocks into
channels (32ch @ 256^2 -> 128ch @ 128^2) fills the lanes.

The rewrite is EXACT (not an approximation): a 3x3 SAME conv on the
original grid equals a 2x2 VALID conv on a half-pixel-shifted packing of
the s2d grid, with the 3x3 kernel zero-stuffed into a [2,2,4Cin,4Cout]
kernel (derivation in `s2d_kernel`).  FLOPs grow 16/9 = 1.78x (the MXU
cannot skip the structured zeros) but output-lane utilisation grows 4x for
Cout=32, a net ~2.25x on the MXU plus the 4x bandwidth saving on every
elementwise/BN/concat pass.

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

# _SEL[dy, da, a, u] = 1 iff u == 2*dy + da - a (see `s2d_kernel`)
_SEL = np.zeros((2, 2, 2, 3), np.float32)
for _dy in range(2):
    for _da in range(2):
        for _a in range(2):
            _u = 2 * _dy + _da - _a
            if 0 <= _u <= 2:
                _SEL[_dy, _da, _a, _u] = 1.0


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
    packed form is just the channels tiled 4x."""
    return jnp.tile(x, (1, 1, 1, 4))


def rephase(x_nat: jnp.ndarray) -> jnp.ndarray:
    """Natural packing [N,h,w,4C] -> shifted packing [N,h+1,w+1,4C] where
    output pixel (R,Q) sub-block (da,db) holds original pixel
    (2R-1+da, 2Q-1+db), zeros outside — i.e. space_to_depth of the
    ((1,1),(1,1))-padded original.  One slice/pad/concat pass."""
    n, h, w, c4 = x_nat.shape
    c = c4 // 4
    blocks = x_nat.reshape(n, h, w, 2, 2, c)
    out = []
    for da in range(2):
        for db in range(2):
            # original row 2R-1+da: da=0 -> natural row R-1 sub-row 1,
            # da=1 -> natural row R sub-row 0 (same for columns).
            a, b = 1 - da, 1 - db
            down, right = 1 - da, 1 - db
            out.append(jnp.pad(
                blocks[:, :, :, a, b, :],
                ((0, 0), (down, 1 - down), (right, 1 - right), (0, 0)),
            ))
    return jnp.concatenate(out, axis=-1)


def s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Pack a 3x3 HWIO kernel [3,3,Cin,Cout] into [2,2,4Cin,4Cout] so that
    conv2x2_VALID(rephase(x_packed), packed_kernel) equals the natural
    packing of conv3x3_SAME(x, w).

    Derivation: with x' = pad(x, ((1,1),(1,1))) and S = rephase(packed x)
    (= space_to_depth(x')), output parity (a,b) of the original conv is
    out[2i+a, 2j+b] = sum_{u,v} w[u,v] * x'[2i+a+u, 2j+b+v], and
    x'[2i+a+u] sits at S row i + (a+u)//2, sub-row (a+u)%2.  So S-kernel
    tap (dy, da) -> original tap u = 2*dy + da - a when 0 <= u <= 2
    (zero otherwise); columns identically.
    """
    cin, cout = w.shape[2], w.shape[3]
    # selection tensor M[dy, da, a, u] = 1 iff u == 2*dy + da - a
    sel = _SEL.astype(w.dtype)
    # packed[dy,dx,(da,db,cin),(a,b,cout)]
    packed = jnp.einsum("YdAu,XeBv,uvio->YXdeiABo", sel, sel, w)
    return packed.reshape(2, 2, 4 * cin, 4 * cout)


def s2d_kernel_multi(parts) -> jnp.ndarray:
    """Pack a 3x3 kernel whose input side is a CONCAT of packed tensors:
    `parts` is a list of [3,3,Cin_i,Cout] kernel slices (in concat order);
    returns [2,2,4*sum(Cin_i),4*Cout] matching the channel layout of
    jnp.concatenate([packed_i], -1)."""
    return jnp.concatenate([s2d_kernel(p) for p in parts], axis=2)


def conv3x3_s2d(
    x_packed,
    packed_kernel: jnp.ndarray,
    precision=None,
) -> jnp.ndarray:
    """3x3 SAME conv computed entirely in packed space.

    x_packed: one natural-packed [N,h,w,4Cin] tensor OR a list of packed
    tensors (the logical concat, in order — each part keeps its own
    (a,b,c) sub-layout, so each is rephased separately; the kernel from
    `s2d_kernel_multi` is built part-blockwise to match).  packed_kernel
    must already be cast to the compute dtype.  Returns natural-packed
    [N,h,w,4Cout]."""
    if isinstance(x_packed, (list, tuple)):
        x = jnp.concatenate([rephase(p) for p in x_packed], axis=-1)
    else:
        x = rephase(x_packed)
    return jax.lax.conv_general_dilated(
        x, packed_kernel,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


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
