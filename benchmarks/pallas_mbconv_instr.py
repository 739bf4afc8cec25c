"""Instrument the Pallas MBConv prototype: which piece costs 3 ms?

Times, for the stage-0 case (24ch, r1, 256^2, b16):
  copy      : kernel that only copies x block -> out block (DMA floor)
  dw_only   : pass-2-style kernel without slab assembly or project
              (dw taps read straight from x_ref interior; edges wrong)
  slab_dw   : dw with the padded-slab assembly (pass 1, no sums)
  pass1     : full pass 1 (slab dw + sums)
  pass2     : full pass 2
  full      : pass1 + SE + pass2 (the prototype)

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/pallas_mbconv_instr.py
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
from pallas_mbconv_proto import (
    _pass1_kernel,
    _pass2_kernel,
    make_params,
    mbconv_pallas,
)

DT = jnp.bfloat16
N, C, H, W = 16, 24, 256, 256
BH = 32
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
VM = pltpu.VMEM


def xspec():
    return pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0),
                        memory_space=VM)


def _copy_kernel(x_ref, out_ref):
    out_ref[0] = x_ref[0]


def _dw_only_kernel(x_ref, wdw_ref, bdw_ref, out_ref):
    for s in range(H // BH):
        h0 = s * BH
        lo = max(h0 - 1, 0)
        acc = None
        for u in range(3):
            for v in range(3):
                t = (x_ref[0, :, lo + u:lo + u + BH, :]
                     if lo + u + BH <= H else x_ref[0, :, H - BH:H, :])
                t = t * wdw_ref[u, v][:, :, :W]
                acc = t if acc is None else acc + t
        acc = acc + bdw_ref[:][:, :, :W]
        y = acc * jax.nn.sigmoid(acc)
        out_ref[0, :, h0:h0 + BH, :] = y.astype(DT)


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    p = make_params(key, C, C, C, 6, W)
    x = jax.random.normal(key, (N, C, H, W), DT) * 0.5

    kw = dict(cin=C, mid=C, h=H, w=W, bh=BH, expand=False)

    copy = jax.jit(lambda x: pl.pallas_call(
        _copy_kernel, grid=(N,), in_specs=[xspec()], out_specs=xspec(),
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), DT),
        compiler_params=CP)(x))

    dw_only = jax.jit(lambda x: pl.pallas_call(
        _dw_only_kernel, grid=(N,),
        in_specs=[xspec(), pl.BlockSpec(memory_space=VM),
                  pl.BlockSpec(memory_space=VM)],
        out_specs=xspec(),
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), DT),
        compiler_params=CP)(x, p["wdw"], p["bdw"]))

    pass1 = jax.jit(lambda x: pl.pallas_call(
        functools.partial(_pass1_kernel, **kw), grid=(N,),
        in_specs=[xspec()] + [pl.BlockSpec(memory_space=VM)] * 4,
        out_specs=pl.BlockSpec((1, C, 1), lambda i: (i, 0, 0),
                               memory_space=VM),
        out_shape=jax.ShapeDtypeStruct((N, C, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, BH + 2, W + 2), DT)],
        compiler_params=CP)(x, p["wexp"], p["bexp"], p["wdw"], p["bdw"]))

    wpp = jnp.tile(p["wproj"].astype(DT)[None], (N, 1, 1))
    pass2 = jax.jit(lambda x: pl.pallas_call(
        functools.partial(_pass2_kernel, cout=C, residual=True, **kw),
        grid=(N,),
        in_specs=[xspec()] + [pl.BlockSpec(memory_space=VM)] * 4
        + [pl.BlockSpec((1, C, C), lambda i: (i, 0, 0), memory_space=VM),
           pl.BlockSpec(memory_space=VM)],
        out_specs=xspec(),
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), DT),
        scratch_shapes=[pltpu.VMEM((C, BH + 2, W + 2), DT)],
        compiler_params=CP)(
            x, p["wexp"], p["bexp"], p["wdw"], p["bdw"], wpp, p["bproj"]))

    full = jax.jit(lambda x: mbconv_pallas(x, p, bh=BH, expand=False))

    def copy_g(g):
        def _k(x_ref, out_ref):
            out_ref[:] = x_ref[:]
        nb = N // g
        return jax.jit(lambda x: pl.pallas_call(
            _k, grid=(g,),
            in_specs=[pl.BlockSpec((nb, C, H, W), lambda i: (i, 0, 0, 0),
                                   memory_space=VM)],
            out_specs=pl.BlockSpec((nb, C, H, W), lambda i: (i, 0, 0, 0),
                                   memory_space=VM),
            out_shape=jax.ShapeDtypeStruct((N, C, H, W), DT),
            compiler_params=CP)(x))

    for name, fn in [("ident (protocol floor)", lambda x: x),
                     ("xla_elemwise", lambda x: x * 1.0001),
                     ("copy", copy), ("copy_grid4", copy_g(4)),
                     ("copy_grid2", copy_g(2)),
                     ("dw_only", dw_only),
                     ("pass1", pass1), ("pass2", pass2), ("full", full)]:
        try:
            ms = time_op(fn, x, iters=30)
            print(json.dumps({"bench": name, "ms": round(ms, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"bench": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
