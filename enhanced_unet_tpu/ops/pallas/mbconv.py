"""Fused MBConv inference block as Pallas TPU kernels (NCHW).

Why: XLA runs EfficientNet's high-res small-channel stages at 2-3% MFU
(benchmarks/profile_r2.py): its specialised depthwise emitter forces
batch-in-sublanes layouts with ~0.5 ms physical copies around every block,
and 24-40 channel NHWC tensors lane-pad up to 5x.  In NCHW the W dim fills
the 128 lanes densely and the whole block fuses into two passes:

  pass 1: [expand 1x1 ->] depthwise 3x3 -> BN -> silu -> channel sums
          (only the [N, mid] sums leave the kernel)
  (XLA)   SE gate from the pooled sums; the gate is FOLDED INTO the
          projection weights -> per-image W'' [mid, Cout]
  pass 2: recompute expand/dw/BN/silu (cheaper than storing the
          mid-channel tensor), project with W'' on the MXU, add
          bias + residual

Measured nets vs XLA on v5e (benchmarks/pallas_dw_variants.py,
pallas_mbconv_instr.py): in-kernel dw ~0.65 ms vs XLA ~1.2 ms at
[16,24,256,256] once the per-op floor is subtracted; the fused block
additionally removes the layout copies and pool reductions.

Constraints (callers route around them — models/encoders.py):
- inference only (no custom VJP; training keeps the XLA path)
- kernel 3x3, stride 1; H divisible by 8 and W divisible by 128 (Mosaic
  rejects the [mid, bh*w] reshape for narrower maps; the routing gate in
  encoders.py and _pick_bh enforce both); weights pre-folded with BN
- bf16 activations, fp32 depthwise epilogue (a Mosaic bug rejects the
  bf16 bias broadcast; fp32 is also slightly more accurate)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DT = jnp.bfloat16
_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


class MBConvWeights(NamedTuple):
    """Pre-folded weights (see `fold_mbconv_weights`)."""
    wexp: Optional[jnp.ndarray]   # [mid, cin] bf16 (BN0-folded) or None
    bexp: Optional[jnp.ndarray]   # [mid, 1] f32
    wdw: jnp.ndarray              # [3, 3, mid, 1, W] bf16 (BN1-folded,
    #                               lane-replicated: Mosaic cannot
    #                               broadcast sublanes+lanes in one op)
    bdw: jnp.ndarray              # [mid, 1, W] f32
    se_w1: jnp.ndarray            # [mid, se_c] f32
    se_b1: jnp.ndarray            # [se_c] f32
    se_w2: jnp.ndarray            # [se_c, mid] f32
    se_b2: jnp.ndarray            # [mid] f32
    wproj: jnp.ndarray            # [mid, cout] f32 (gate folded at runtime)
    bproj: jnp.ndarray            # [cout, 1] f32 (BN2-folded)


def fold_mbconv_weights(
    w, h_unused, width, eps: float = 1e-3
) -> MBConvWeights:
    """Fold BN scale/bias into conv weights/biases.

    `w` is a dict with raw params: optional expand {kernel [1,1,cin,mid]},
    bn0/bn1/bn2 {scale,bias,mean,var}, dw kernel [3,3,1,mid], SE convs
    {kernel,bias}, project kernel [1,1,mid,cout].
    """

    def fold(scale, bias, mean, var):
        s = scale * jax.lax.rsqrt(var + eps)
        return s, bias - mean * s

    wexp = bexp = None
    if w.get("expand") is not None:
        s0, b0 = fold(**w["bn0"])
        k = w["expand"][0, 0]                       # [cin, mid]
        wexp = (k * s0[None, :]).T.astype(DT)       # [mid, cin]
        bexp = b0[:, None]                          # [mid, 1]
    s1, b1 = fold(**w["bn1"])
    kdw = w["dw"][:, :, 0, :] * s1[None, None, :]   # [3, 3, mid]
    mid = kdw.shape[-1]
    wdw = jnp.broadcast_to(
        kdw.transpose(0, 1, 2)[:, :, :, None, None], (3, 3, mid, 1, width)
    ).astype(DT)
    bdw = jnp.broadcast_to(b1[:, None, None], (mid, 1, width))
    s2, b2 = fold(**w["bn2"])
    kproj = w["project"][0, 0]                      # [mid, cout]
    wproj = kproj * s2[None, :]
    bproj = b2[:, None]                             # [cout, 1]
    return MBConvWeights(
        wexp=wexp, bexp=bexp, wdw=wdw, bdw=bdw,
        se_w1=w["se1"]["kernel"][0, 0], se_b1=w["se1"]["bias"],
        se_w2=w["se2"]["kernel"][0, 0], se_b2=w["se2"]["bias"],
        wproj=wproj, bproj=bproj,
    )


def _fill_slab(x_src, ps, s, bh, h, w, mid):
    """Fill slab ps[mid, bh+2, w] with rows [s*bh-1, s*bh+bh+1) of x_src
    (a function row-range -> [mid, rows, w]); zero edge rows.  W keeps its
    natural width — a w+2 scratch would lane-pad 130 -> 256 at the
    stage-1 shapes, doubling every VPU pass (measured 2x regression)."""
    h0 = s * bh
    lo = max(h0 - 1, 0)
    hi = min(h0 + bh + 1, h)
    if lo != h0 - 1:
        ps[:, 0, :] = jnp.zeros((mid, w), DT)
    if hi != h0 + bh + 1:
        ps[:, bh + 1, :] = jnp.zeros((mid, w), DT)
    dst0 = lo - (h0 - 1)
    ps[:, dst0:dst0 + (hi - lo), :] = x_src(lo, hi)


def _expand_rows(x_ref, wexp_ref, bexp_ref, cin, w, lo, hi):
    xs = x_ref[0, :, lo:hi, :].reshape(cin, (hi - lo) * w)
    ye = jax.lax.dot_general(
        wexp_ref[:], xs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ye = ye + bexp_ref[:]
    ye = (ye * jax.nn.sigmoid(ye)).astype(DT)
    return ye.reshape(-1, hi - lo, w)


def _dw_silu(ps, sl, sr, wdw_ref, bdw_ref, bh, w, mid):
    """9-tap depthwise over ps [mid, bh+2, w] using lane-aligned shift
    buffers: sl/sr hold ps shifted right/left by one column (zero edge),
    so every tap slice stays on the natural W lanes."""
    sl[:, :, 0] = jnp.zeros((mid, bh + 2), DT)
    sl[:, :, 1:] = ps[:, :, :w - 1]
    sr[:, :, w - 1] = jnp.zeros((mid, bh + 2), DT)
    sr[:, :, :w - 1] = ps[:, :, 1:]
    bufs = (sl, ps, sr)             # v = 0, 1, 2
    acc = None
    for u in range(3):
        for v in range(3):
            t = bufs[v][:, u:u + bh, :] * wdw_ref[u, v]
            acc = t if acc is None else acc + t
    acc = acc + bdw_ref[:]          # f32 promote (Mosaic bf16-bias bug)
    return acc * jax.nn.sigmoid(acc)


def _pass1_kernel(x_ref, wexp_ref, bexp_ref, wdw_ref, bdw_ref, sums_ref,
                  ps, sl, sr, *, cin, mid, h, w, bh, expand):
    nslab = h // bh
    total = jnp.zeros((mid, 1), jnp.float32)
    for s in range(nslab):
        if expand:
            src = functools.partial(_expand_rows, x_ref, wexp_ref, bexp_ref,
                                    cin, w)
        else:
            src = lambda lo, hi: x_ref[0, :, lo:hi, :]
        _fill_slab(src, ps, s, bh, h, w, mid)
        y = _dw_silu(ps, sl, sr, wdw_ref, bdw_ref, bh, w, mid)
        total = total + jnp.sum(
            y.astype(jnp.float32).reshape(mid, bh * w), axis=1,
            keepdims=True)
    sums_ref[0, :, :] = total


def _pass2_kernel(x_ref, wexp_ref, bexp_ref, wdw_ref, bdw_ref, wpp_ref,
                  bpp_ref, out_ref, ps, sl, sr, *, cin, cout, mid, h, w, bh,
                  expand, residual):
    nslab = h // bh
    for s in range(nslab):
        if expand:
            src = functools.partial(_expand_rows, x_ref, wexp_ref, bexp_ref,
                                    cin, w)
        else:
            src = lambda lo, hi: x_ref[0, :, lo:hi, :]
        _fill_slab(src, ps, s, bh, h, w, mid)
        y = _dw_silu(ps, sl, sr, wdw_ref, bdw_ref, bh, w, mid).astype(DT)
        o = jax.lax.dot_general(
            wpp_ref[0], y.reshape(mid, bh * w), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = o + bpp_ref[:]
        o = o.reshape(cout, bh, w)
        if residual:
            o = o + x_ref[0, :, s * bh:s * bh + bh, :].astype(jnp.float32)
        out_ref[0, :, s * bh:s * bh + bh, :] = o.astype(DT)


def _pick_bh(h: int) -> int:
    for bh in (64, 32, 16, 8):
        if h % bh == 0:
            return bh
    raise ValueError(f"H={h} not divisible by 8")


def mbconv_infer_nchw(
    x: jnp.ndarray, p: MBConvWeights, *, residual: bool
) -> jnp.ndarray:
    """Fused MBConv inference on NCHW bf16 input [N, Cin, H, W]."""
    n, cin, h, w = x.shape
    mid = p.wdw.shape[2]
    cout = p.wproj.shape[1]
    expand = p.wexp is not None
    bh = _pick_bh(h)
    # placeholder operands keep one kernel signature for both variants
    wexp = p.wexp if expand else jnp.zeros((mid, cin), DT)
    bexp = p.bexp if expand else jnp.zeros((mid, 1), jnp.float32)

    kw = dict(cin=cin, mid=mid, h=h, w=w, bh=bh, expand=expand)
    vm = pltpu.VMEM
    # interpret mode lets the CPU test suite pin kernel numerics
    interp = jax.default_backend() != "tpu"
    sums = pl.pallas_call(
        functools.partial(_pass1_kernel, **kw),
        interpret=interp,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
        ],
        out_specs=pl.BlockSpec((1, mid, 1), lambda i: (i, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((n, mid, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mid, bh + 2, w), DT)] * 3,
        compiler_params=_CP,
    )(x, wexp, bexp, p.wdw, p.bdw)

    # SE gate (tiny, XLA) folded into per-image projection weights
    pool = sums[:, :, 0] / (h * w)
    s = jax.nn.silu(pool @ p.se_w1 + p.se_b1)
    g = jax.nn.sigmoid(s @ p.se_w2 + p.se_b2)                # [N, mid]
    wpp = (g[:, :, None] * p.wproj[None]).astype(DT)         # [N, mid, cout]

    return pl.pallas_call(
        functools.partial(_pass2_kernel, cout=cout, residual=residual, **kw),
        interpret=interp,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec((1, mid, cout), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec(memory_space=vm),
        ],
        out_specs=pl.BlockSpec((1, cout, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((n, cout, h, w), DT),
        scratch_shapes=[pltpu.VMEM((mid, bh + 2, w), DT)] * 3,
        compiler_params=_CP,
    )(x, wexp, bexp, p.wdw, p.bdw, wpp, p.bproj)
