"""In-kernel depthwise tap strategies for the Pallas MBConv.

pallas_mbconv_instr.py showed the 9-tap depthwise inside VMEM nets ~1.3 ms
at [16,24,256,256] (vs ~0.1 ms VPU roofline) — the tap slicing pays
relayouts.  Variants (all: dw 3x3 + bias + silu, grid (N,), x resident):

  v1_slices   : current — padded scratch, 9 unaligned sublane+lane slices,
                fp32 bias/silu
  v2_bf16     : v1 but bf16 end-to-end (bias pre-cast)
  v3_twostep  : 3 lane-shifted copies materialised once, then 9 taps are
                sublane slices only
  v4_dot      : W-dim taps as a banded [W+2, W] matmul on the MXU
                (per u: [C*(bh+2), W+2] @ band -> accumulate over u)

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/pallas_dw_variants.py
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
N, C, H, W = 16, 24, 256, 256
BH = 64
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
VM = pltpu.VMEM


def xspec():
    return pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0),
                        memory_space=VM)


def _fill_slab(x_ref, ps, s, bh):
    """Zero-pad slab [C, bh+2, W+2] from resident x rows [s*bh-1, s*bh+bh+1)."""
    h0 = s * bh
    lo = max(h0 - 1, 0)
    hi = min(h0 + bh + 1, H)
    ps[:, :, 0] = jnp.zeros((C, bh + 2), DT)
    ps[:, :, W + 1] = jnp.zeros((C, bh + 2), DT)
    if lo != h0 - 1:
        ps[:, 0, :] = jnp.zeros((C, W + 2), DT)
    if hi != h0 + bh + 1:
        ps[:, bh + 1, :] = jnp.zeros((C, W + 2), DT)
    dst0 = lo - (h0 - 1)
    ps[:, dst0:dst0 + (hi - lo), 1:W + 1] = x_ref[0, :, lo:hi, :]


def v1_kernel(x_ref, wdw_ref, bdw_ref, out_ref, ps, *, bh, bf16):
    for s in range(H // bh):
        _fill_slab(x_ref, ps, s, bh)
        acc = None
        for u in range(3):
            for v in range(3):
                t = ps[:, u:u + bh, v:v + W] * wdw_ref[u, v]
                acc = t if acc is None else acc + t
        acc = acc + bdw_ref[:]
        y = acc * jax.nn.sigmoid(acc)
        out_ref[0, :, s * bh:s * bh + bh, :] = y.astype(DT)


def v3_kernel(x_ref, wdw_ref, bdw_ref, out_ref, ps, sh, *, bh):
    for s in range(H // bh):
        _fill_slab(x_ref, ps, s, bh)
        # materialise the three lane shifts once: sh[v] = ps[:, :, v:v+W]
        for v in range(3):
            sh[v] = ps[:, :, v:v + W]
        acc = None
        for u in range(3):
            for v in range(3):
                t = sh[v][:, u:u + bh, :] * wdw_ref[u, v]
                acc = t if acc is None else acc + t
        acc = acc + bdw_ref[:]
        y = acc * jax.nn.sigmoid(acc)
        out_ref[0, :, s * bh:s * bh + bh, :] = y.astype(DT)


def v4_kernel(x_ref, wdw_ref, bdw_ref, band_ref, out_ref, ps, *, bh):
    # band_ref: [3, W+2, W] with band[v, j+v, j] = 1 — W taps via MXU
    for s in range(H // bh):
        _fill_slab(x_ref, ps, s, bh)
        acc = None
        for u in range(3):
            rows = ps[:, u:u + bh, :]                 # [C, bh, W+2]
            flat = rows.reshape(C * bh, W + 2)
            for v in range(3):
                t = jax.lax.dot_general(
                    flat, band_ref[v], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                t = t.reshape(C, bh, W).astype(DT) * wdw_ref[u, v]
                acc = t if acc is None else acc + t
        acc = acc + bdw_ref[:]
        y = acc * jax.nn.sigmoid(acc)
        out_ref[0, :, s * bh:s * bh + bh, :] = y.astype(DT)


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, C, H, W), DT) * 0.5
    wdw32 = jax.random.normal(key, (3, 3, C, 1, 1), jnp.float32) * 0.1
    wdw = jnp.broadcast_to(wdw32, (3, 3, C, 1, W)).astype(DT)
    bdw32 = jnp.broadcast_to(
        jax.random.normal(key, (C, 1, 1), jnp.float32) * 0.1, (C, 1, W))
    bdw16 = bdw32.astype(DT)

    common = dict(
        grid=(N,),
        out_specs=xspec(),
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), DT),
        compiler_params=CP,
    )
    wspecs = [xspec(), pl.BlockSpec(memory_space=VM),
              pl.BlockSpec(memory_space=VM)]

    v1 = jax.jit(lambda x: pl.pallas_call(
        functools.partial(v1_kernel, bh=BH, bf16=False), in_specs=wspecs,
        scratch_shapes=[pltpu.VMEM((C, BH + 2, W + 2), DT)],
        **common)(x, wdw, bdw32))
    v2 = jax.jit(lambda x: pl.pallas_call(
        functools.partial(v1_kernel, bh=BH, bf16=True), in_specs=wspecs,
        scratch_shapes=[pltpu.VMEM((C, BH + 2, W + 2), DT)],
        **common)(x, wdw, bdw32))
    v3 = jax.jit(lambda x: pl.pallas_call(
        functools.partial(v3_kernel, bh=BH), in_specs=wspecs,
        scratch_shapes=[pltpu.VMEM((C, BH + 2, W + 2), DT),
                        pltpu.VMEM((3, C, BH + 2, W), DT)],
        **common)(x, wdw, bdw32))
    band = np.zeros((3, W + 2, W), np.float32)
    for v in range(3):
        for j in range(W):
            band[v, j + v, j] = 1.0
    band = jnp.asarray(band, DT)
    v4 = jax.jit(lambda x: pl.pallas_call(
        functools.partial(v4_kernel, bh=BH),
        in_specs=wspecs + [pl.BlockSpec(memory_space=VM)],
        scratch_shapes=[pltpu.VMEM((C, BH + 2, W + 2), DT)],
        **common)(x, wdw, bdw32, band))

    # reference for correctness
    kref = wdw32[:, :, :, 0, 0][:, :, None, :].astype(DT)  # [3,3,1,C] HWIO
    bref = bdw32[:, 0, 0].astype(DT)

    def ref(x):
        xh = jnp.moveaxis(x, 1, -1)
        y = jax.lax.conv_general_dilated(
            xh, kref, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bref
        y = y * jax.nn.sigmoid(y)
        return jnp.moveaxis(y, -1, 1)

    r = np.asarray(ref(x), np.float32)
    for name, fn in [("v1_slices_f32", v1), ("v2_f32bias", v2),
                     ("v3_twostep", v3), ("v4_dot", v4)]:
        try:
            got = np.asarray(fn(x), np.float32)
            err = np.max(np.abs(got - r)) / (np.max(np.abs(r)) + 1e-6)
            ms = time_op(fn, x, iters=30)
            print(json.dumps({"bench": name, "ms": round(ms, 3),
                              "rel_err": round(float(err), 5)}), flush=True)
        except Exception as e:
            print(json.dumps({"bench": name, "error": str(e)[:250]}),
                  flush=True)

    # XLA depthwise for the same shape (NCHW stored): reference cost
    ms = time_op(jax.jit(ref), x, iters=30)
    print(json.dumps({"bench": "xla_nhwc_dw (incl 2 transposes)",
                      "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
