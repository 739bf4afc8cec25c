"""Microbenchmark: UNet++ full-resolution head variants on TPU.

The head (reference parity: up2x -> DoubleConv(16) -> conv3x3 -> 3 classes
at full input resolution) measured 19.5 ms packed / 25.0 ms plain at
batch 16 512^2 — ~3% MFU, far off bandwidth or compute limits.  This bench
isolates each candidate implementation:

  plain      : unpacked 512^2 tensors (baseline)
  packed     : current rephase(pad+concat) + 2x2 VALID convs
  stuffed    : natural packing, zero-stuffed [3,3,4Ci,4Co] SAME convs
               (no rephase materialisation; 2.25x the packed FLOPs)
  fusedup    : conv1 fused with the nearest-upsample (kernel collapse:
               conv3x3(nearest2x(x)) == conv3x3 at LOW res with per-parity
               collapsed kernels -> packed output), then stuffed convs

Run: PYTHONPATH=. python benchmarks/head_bench.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from enhanced_unet_tpu.ops.s2d import (
    depth_to_space,
    space_to_depth,
    tile_as_packed_upsample,
)

# --- the retired rephase+2x2 formulation, kept here for the comparison ---

_SEL = np.zeros((2, 2, 2, 3), np.float32)  # [dy, da, a, u]
for _dy in range(2):
    for _da in range(2):
        for _a in range(2):
            _u = 2 * _dy + _da - _a
            if 0 <= _u <= 2:
                _SEL[_dy, _da, _a, _u] = 1.0


def s2d_kernel(w):
    """[3,3,Ci,Co] -> [2,2,4Ci,4Co] for conv2x2-VALID over rephase(x)."""
    ci, co = w.shape[2], w.shape[3]
    sel = jnp.asarray(_SEL, w.dtype)
    packed = jnp.einsum("YdAu,XeBv,uvio->YXdeiABo", sel, sel, w)
    return packed.reshape(2, 2, 4 * ci, 4 * co)


def rephase(x_nat):
    """Natural packing [N,h,w,4C] -> shifted packing [N,h+1,w+1,4C]
    (space_to_depth of the ((1,1),(1,1))-padded original)."""
    n, h, w, c4 = x_nat.shape
    c = c4 // 4
    blocks = x_nat.reshape(n, h, w, 2, 2, c)
    out = []
    for da in range(2):
        for db in range(2):
            a, b = 1 - da, 1 - db
            down, right = 1 - da, 1 - db
            out.append(jnp.pad(
                blocks[:, :, :, a, b, :],
                ((0, 0), (down, 1 - down), (right, 1 - right), (0, 0)),
            ))
    return jnp.concatenate(out, axis=-1)

B, H, W = 16, 512, 512
C_IN, C_MID, C_OUT = 32, 16, 3
DT = jnp.bfloat16


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, k, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stuffed_kernel(w):
    """[3,3,Ci,Co] -> [3,3,4Ci,4Co] zero-stuffed so conv3x3-SAME on the
    NATURAL packing equals the packing of conv3x3-SAME on the original.

    Output sub-pixel (a,b) at packed pixel (i,j) is original pixel
    (2i+a, 2j+b); tap u reads original row 2i+a+u-1 which lives at packed
    row i + (a+u-1)//2 == i + dy - 1 (dy in 0..2), sub-row (a+u-1) % 2.
    So kernel slot [dy, dx, (da,db,ci), (a,b,co)] = w[u, v, ci, co] where
    u = 2*(dy-1) + da - a + 1 when 0 <= u <= 2, else 0.
    """
    ci, co = w.shape[2], w.shape[3]
    sel = np.zeros((3, 2, 2, 3), np.float32)  # [dy, da, a, u]
    for dy in range(3):
        for da in range(2):
            for a in range(2):
                u = 2 * (dy - 1) + da - a + 1
                if 0 <= u <= 2:
                    sel[dy, da, a, u] = 1.0
    sel = jnp.asarray(sel, w.dtype)
    k = jnp.einsum("YdAu,XeBv,uvio->YXdeiABo", sel, sel, w)
    return k.reshape(3, 3, 4 * ci, 4 * co)


def fused_up_kernel(w):
    """[3,3,Ci,Co] -> [3,3,Ci,4Co]: conv3x3-SAME(nearest_up2x(x)) ==
    depth_to_space(conv3x3-SAME(x, K)) with
    K[d, :, ci, (a,b,co)] built from collapsed taps:
      a=0: d=0 <- w[0];        d=1 <- w[1]+w[2]
      a=1: d=1 <- w[0]+w[1];   d=2 <- w[2]
    (same for columns with b/v)."""
    ci, co = w.shape[2], w.shape[3]
    sel = np.zeros((3, 2, 3), np.float32)  # [d, a, u]
    sel[0, 0, 0] = 1.0
    sel[1, 0, 1] = sel[1, 0, 2] = 1.0
    sel[1, 1, 0] = sel[1, 1, 1] = 1.0
    sel[2, 1, 2] = 1.0
    sel = jnp.asarray(sel, w.dtype)
    k = jnp.einsum("YAu,XBv,uvio->YXiABo", sel, sel, w)
    return k.reshape(3, 3, ci, 4 * co)


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    x_low = jax.random.normal(key, (B, H // 2, W // 2, C_IN), DT)  # row-0 out
    w1 = jax.random.normal(key, (3, 3, C_IN, C_MID), jnp.float32) * 0.1
    w2 = jax.random.normal(key, (3, 3, C_MID, C_MID), jnp.float32) * 0.1
    w3 = jax.random.normal(key, (3, 3, C_MID, C_OUT), jnp.float32) * 0.1
    w1b, w2b, w3b = (w.astype(DT) for w in (w1, w2, w3))

    @jax.jit
    def plain(x):
        y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        y = jax.nn.relu(conv(y, w1b))
        y = jax.nn.relu(conv(y, w2b))
        return conv(y, w3b)

    @jax.jit
    def packed(x):
        yup = tile_as_packed_upsample(x)  # [B,256,256,4C]
        k1 = s2d_kernel(w1).astype(DT)
        k2 = s2d_kernel(w2).astype(DT)
        k3 = s2d_kernel(w3).astype(DT)
        y = jax.nn.relu(conv(rephase(yup), k1, "VALID"))
        y = jax.nn.relu(conv(rephase(y), k2, "VALID"))
        return conv(rephase(y), k3, "VALID")

    @jax.jit
    def stuffed(x):
        yup = tile_as_packed_upsample(x)
        y = jax.nn.relu(conv(yup, stuffed_kernel(w1).astype(DT)))
        y = jax.nn.relu(conv(y, stuffed_kernel(w2).astype(DT)))
        return conv(y, stuffed_kernel(w3).astype(DT))

    @jax.jit
    def fusedup(x):
        y = jax.nn.relu(conv(x, fused_up_kernel(w1).astype(DT)))
        y = jax.nn.relu(conv(y, stuffed_kernel(w2).astype(DT)))
        return conv(y, stuffed_kernel(w3).astype(DT))

    # correctness vs plain (loose bf16 tolerance)
    ref = np.asarray(depth_to_space(space_to_depth(plain(x_low))), np.float32)
    for name, fn in [("packed", packed), ("stuffed", stuffed),
                     ("fusedup", fusedup)]:
        got = np.asarray(depth_to_space(fn(x_low)), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6)
        print(json.dumps({"check": name, "rel_err": float(err)}))

    gf_logical = (B * H * W * 9 * (C_IN * C_MID + C_MID * C_MID
                                   + C_MID * C_OUT) * 2) / 1e9
    for name, fn in [("plain", plain), ("packed", packed),
                     ("stuffed", stuffed), ("fusedup", fusedup)]:
        ms = timeit(fn, x_low)
        print(json.dumps({"bench": name, "ms": round(ms, 3),
                          "logical_gflops": round(gf_logical, 1),
                          "tflops_logical": round(gf_logical / ms, 1)}))

    # isolate: single stuffed conv2 (the 512^2-logical 16->16 conv)
    yp = tile_as_packed_upsample(x_low)
    k2s = stuffed_kernel(w2).astype(DT)
    y1 = jax.jit(lambda x: jax.nn.relu(conv(x, stuffed_kernel(w1).astype(DT))))(yp)
    one = jax.jit(lambda x: conv(x, k2s))
    print(json.dumps({"bench": "one stuffed conv 64->64 @256^2",
                      "ms": round(timeit(one, y1), 3)}))
    k2p = s2d_kernel(w2).astype(DT)
    one_p = jax.jit(lambda x: conv(rephase(x), k2p, "VALID"))
    print(json.dumps({"bench": "one rephase+2x2 conv @256^2",
                      "ms": round(timeit(one_p, y1), 3)}))
    one_r = jax.jit(lambda x: rephase(x))
    print(json.dumps({"bench": "rephase alone @256^2x64",
                      "ms": round(timeit(one_r, y1), 3)}))


if __name__ == "__main__":
    main()
