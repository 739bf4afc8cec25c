"""Prototype: fused MBConv inference block as Pallas TPU kernels, NCHW.

Why: XLA runs EfficientNet's high-res small-channel stages at 2-3% MFU
(benchmarks/profile_r2.py): it ping-pongs activations between two layouts
(~0.5 ms copies), pads 24-40 channel NHWC tensors to 128 lanes, and emits
slow depthwise kernels.  In NCHW the W dim fills the 128 lanes densely and
the whole block fuses into two passes:

  pass 1: [expand 1x1 ->] depthwise kxk -> BN -> silu -> channel sums
          (only the sums leave the kernel)
  (XLA)   SE gate from the pooled sums; gate+BN2 folded into the
          projection weights -> per-image W'' [mid, Cout]
  pass 2: recompute expand/dw/BN/silu (cheaper than storing the mid-
          channel tensor), project with W'', add bias + residual

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/pallas_mbconv_proto.py
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/benchmarks")
from microtime import time_op

DT = jnp.bfloat16


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _dw_slab(ps, wdw_ref, bdw_ref, mid, bh, w):
    """9-tap depthwise over padded slab ps [mid, bh+2, w+2] -> bn+silu
    [mid, bh, w].  wdw_ref is [3,3,mid,1,1]; bdw_ref is [mid,1,1] (shapes
    pre-expanded host-side: Mosaic cannot reshape 1D vectors to 3D)."""
    acc = None
    for u in range(3):
        for v in range(3):
            tap = ps[:, u:u + bh, v:v + w]
            # wdw/bdw are pre-replicated along lanes host-side ([...,1,W]):
            # Mosaic cannot broadcast along sublanes AND lanes in one op
            t = tap * wdw_ref[u, v]
            acc = t if acc is None else acc + t
    acc = acc + bdw_ref[:]
    return acc * jax.nn.sigmoid(acc)  # silu


def _pass1_kernel(x_ref, wexp_ref, bexp_ref, wdw_ref, bdw_ref, sums_ref,
                  ps, *, cin, mid, h, w, bh, expand):
    """x [1,cin,H,W] -> sums [1,mid] (pool of silu(bn(dw(expand(x)))))."""
    nslab = h // bh
    total = jnp.zeros((mid, 1), jnp.float32)
    for s in range(nslab):
        h0 = s * bh
        lo = max(h0 - 1, 0)
        hi = min(h0 + bh + 1, h)
        if expand:
            xs = x_ref[0, :, lo:hi, :].reshape(cin, (hi - lo) * w)
            ye = jax.lax.dot_general(
                wexp_ref[:], xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ye = ye + bexp_ref[:]
            ye = (ye * jax.nn.sigmoid(ye)).astype(DT)
            ye = ye.reshape(mid, hi - lo, w)
        else:
            ye = x_ref[0, :, lo:hi, :]
        # assemble zero-padded slab [mid, bh+2, w+2]
        ps[:, :, 0] = jnp.zeros((mid, bh + 2), DT)
        ps[:, :, w + 1] = jnp.zeros((mid, bh + 2), DT)
        if lo != h0 - 1:          # top edge: zero halo row
            ps[:, 0, :] = jnp.zeros((mid, w + 2), DT)
        if hi != h0 + bh + 1:     # bottom edge
            ps[:, bh + 1, :] = jnp.zeros((mid, w + 2), DT)
        dst0 = lo - (h0 - 1)
        ps[:, dst0:dst0 + (hi - lo), 1:w + 1] = ye
        y = _dw_slab(ps, wdw_ref, bdw_ref, mid, bh, w)
        total = total + jnp.sum(
            y.astype(jnp.float32).reshape(mid, bh * w), axis=1,
            keepdims=True)
    sums_ref[0, :, :] = total


def _pass2_kernel(x_ref, wexp_ref, bexp_ref, wdw_ref, bdw_ref, wpp_ref,
                  bpp_ref, out_ref, ps, *, cin, cout, mid, h, w, bh,
                  expand, residual):
    """Recompute y then out = W'' y + b'' (+x)."""
    nslab = h // bh
    for s in range(nslab):
        h0 = s * bh
        lo = max(h0 - 1, 0)
        hi = min(h0 + bh + 1, h)
        if expand:
            xs = x_ref[0, :, lo:hi, :].reshape(cin, (hi - lo) * w)
            ye = jax.lax.dot_general(
                wexp_ref[:], xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ye = ye + bexp_ref[:]
            ye = (ye * jax.nn.sigmoid(ye)).astype(DT)
            ye = ye.reshape(mid, hi - lo, w)
        else:
            ye = x_ref[0, :, lo:hi, :]
        ps[:, :, 0] = jnp.zeros((mid, bh + 2), DT)
        ps[:, :, w + 1] = jnp.zeros((mid, bh + 2), DT)
        if lo != h0 - 1:
            ps[:, 0, :] = jnp.zeros((mid, w + 2), DT)
        if hi != h0 + bh + 1:
            ps[:, bh + 1, :] = jnp.zeros((mid, w + 2), DT)
        dst0 = lo - (h0 - 1)
        ps[:, dst0:dst0 + (hi - lo), 1:w + 1] = ye
        y = _dw_slab(ps, wdw_ref, bdw_ref, mid, bh, w).astype(DT)
        o = jax.lax.dot_general(
            wpp_ref[0], y.reshape(mid, bh * w), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = o + bpp_ref[:]
        o = o.reshape(cout, bh, w)
        if residual:
            o = o + x_ref[0, :, h0:h0 + bh, :].astype(jnp.float32)
        out_ref[0, :, h0:h0 + bh, :] = o.astype(DT)


def mbconv_pallas(x, p, *, bh=32, expand=True, residual=True):
    """x: [N, Cin, H, W] bf16.  p: dict of pre-folded weights."""
    n, cin, h, w = x.shape
    mid = p["wdw"].shape[2]
    cout = p["wproj"].shape[1]

    kw = dict(cin=cin, mid=mid, h=h, w=w, bh=bh, expand=expand)
    sums = pl.pallas_call(
        functools.partial(_pass1_kernel, **kw),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mid, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, mid, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mid, bh + 2, w + 2), DT)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, p["wexp"], p["bexp"], p["wdw"], p["bdw"])

    # SE gate (tiny, XLA) folded into per-image projection weights
    pool = sums[:, :, 0] / (h * w)
    s = jax.nn.silu(pool @ p["se_w1"] + p["se_b1"])
    g = jax.nn.sigmoid(s @ p["se_w2"] + p["se_b2"])          # [N, mid]
    wpp = (g[:, :, None] * p["wproj"][None]).astype(DT)      # [N, mid, cout]

    out = pl.pallas_call(
        functools.partial(_pass2_kernel, cout=cout, residual=residual, **kw),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cout, h, w), DT),
        scratch_shapes=[pltpu.VMEM((mid, bh + 2, w + 2), DT)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, p["wexp"], p["bexp"], p["wdw"], p["bdw"], wpp, p["bproj"])
    return out


# ---------------------------------------------------------------------------
# XLA NHWC reference (current encoder semantics, BN pre-folded identically)
# ---------------------------------------------------------------------------

def mbconv_xla_nhwc(xh, p, *, expand=True, residual=True):
    y = xh
    if expand:
        y = jax.lax.conv_general_dilated(
            y, p["wexp"].T[None, None].astype(DT), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + p["bexp"][:, 0].astype(DT)
        y = jax.nn.silu(y)
    mid = y.shape[-1]
    k = p["wdw"][:, :, :, 0, 0][:, :, None, :].reshape(3, 3, 1, mid)
    y = jax.lax.conv_general_dilated(
        y, k.astype(DT), (1, 1), "SAME", feature_group_count=mid,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["bdw"][:, 0, 0].astype(DT)
    y = jax.nn.silu(y)
    s = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    s = jax.nn.silu(s @ p["se_w1"] + p["se_b1"])
    g = jax.nn.sigmoid(s @ p["se_w2"] + p["se_b2"])
    y = y * g[:, None, None, :].astype(DT)
    y = jax.lax.conv_general_dilated(
        y, p["wproj"][None, None].astype(DT), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["bproj"][:, 0].astype(DT)
    if residual:
        y = y + xh
    return y


def make_params(key, cin, mid, cout, se_c, w):
    ks = jax.random.split(key, 8)
    r = lambda k, s, sc: (jax.random.normal(k, s, jnp.float32) * sc)
    return {
        "wexp": r(ks[0], (mid, cin), 0.2).astype(DT),
        "bexp": r(ks[1], (mid, 1), 0.1),
        "wdw": jnp.broadcast_to(r(ks[2], (3, 3, mid, 1, 1), 0.2),
                                (3, 3, mid, 1, w)).astype(DT),
        "bdw": jnp.broadcast_to(r(ks[3], (mid, 1, 1), 0.1), (mid, 1, w)),
        "se_w1": r(ks[4], (mid, se_c), 0.2),
        "se_b1": r(ks[5], (se_c,), 0.1),
        "se_w2": r(ks[6], (se_c, mid), 0.2),
        "se_b2": r(ks[7], (mid,), 0.1),
        "wproj": r(ks[0], (mid, cout), 0.2),
        "bproj": r(ks[1], (cout, 1), 0.1),
    }


def run_case(name, n, cin, mid, cout, h, w, bh, expand):
    key = jax.random.PRNGKey(0)
    p = make_params(key, cin, mid, cout, max(1, cin // 4), w)
    xh = jax.random.normal(key, (n, h, w, cin), DT) * 0.5
    xc = jnp.transpose(xh, (0, 3, 1, 2))

    f_pal = jax.jit(lambda x: mbconv_pallas(x, p, bh=bh, expand=expand))
    f_xla = jax.jit(lambda x: mbconv_xla_nhwc(x, p, expand=expand))

    ref = np.asarray(f_xla(xh), np.float32)
    got = np.transpose(np.asarray(f_pal(xc), np.float32), (0, 2, 3, 1))
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6)
    print(json.dumps({"check": name, "rel_err": float(err)}), flush=True)

    ms_x = time_op(lambda x: f_xla(x), xh, iters=30)
    ms_p = time_op(lambda x: f_pal(x), xc, iters=30)
    print(json.dumps({"bench": name, "xla_ms": round(ms_x, 3),
                      "pallas_ms": round(ms_p, 3),
                      "speedup": round(ms_x / ms_p, 2)}), flush=True)


def main():
    print("devices:", jax.devices())
    # stage-0 shape (b5): 24ch, ratio 1, 256^2
    run_case("stage0 24ch r1 @256^2", 16, 24, 24, 24, 256, 256, 32, False)
    # stage-1 interior (b5): 40ch, ratio 6 (mid 240), 128^2
    run_case("stage1 40ch r6 @128^2", 16, 40, 240, 40, 128, 128, 32, True)


if __name__ == "__main__":
    main()
