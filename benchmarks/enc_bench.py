"""Microbenchmark: EfficientNet early-stage (high-res, tiny-channel)
variants on TPU.

Profile shows effnet-b5 stem+stage0+stage1 takes 16.75 ms of the 24.5 ms
encoder at 2.3% MFU (benchmarks/profile_r2.py encoder_b5_s2_b16): tensors
with 24-48 channels at 256^2 lane-pad ~3-5x in HBM, so every depthwise /
SE / BN pass pays padded bandwidth.

Variants for one stage-0 MBConv block (24ch, expand 1, k3, stride 1,
@256^2, batch 16):
  plain      : stock NHWC ops (current encoder)
  packed_cm  : channel-MAJOR s2d packing ([N,128,128,96], channel index
               c*4 + (a*2+b)): depthwise -> grouped conv
               (feature_group_count=C, stuffed [3,3,4,4C] kernel),
               1x1 convs -> block-diagonal kron(w, I4) kernels,
               SE pool -> reshape-mean
  shift9     : subblock-major packing, depthwise as 9 shifted FMAs

Also times a bare elementwise chain at [16,256,256,24] vs [16,128,128,96]
to confirm the physical lane padding.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/enc_bench.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 16
H = W = 256
C = 24
DT = jnp.bfloat16

# stuffed selector for 3x3 SAME on 2x2-packed grids (see ops/s2d.py)
_SEL = np.zeros((3, 2, 2, 3), np.float32)  # [dy, da, a, u]
for _dy in range(3):
    for _da in range(2):
        for _a in range(2):
            _u = 2 * (_dy - 1) + _da - _a + 1
            if 0 <= _u <= 2:
                _SEL[_dy, _da, _a, _u] = 1.0


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, k, fg=1, strides=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, k, strides, "SAME", feature_group_count=fg,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d_cm(x):
    """Channel-major packing: [N,H,W,C] -> [N,H/2,W/2,4C], index c*4+(a*2+b)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h2, w2, c, a, b
    return x.reshape(n, h // 2, w // 2, c * 4)


def d2s_cm(x):
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * 2, w * 2, c)


def dw_kernel_cm(wdw):
    """Depthwise [3,3,C] -> grouped stuffed kernel [3,3,4,4C] (channel-major
    groups: group c covers packed channels [4c,4c+4))."""
    c = wdw.shape[2]
    sel = jnp.asarray(_SEL, wdw.dtype)
    # per channel: [dy,dx,(da,db),(a,b)] = sum_uv SEL*SEL * w[u,v,c]
    k = jnp.einsum("YdAu,XeBv,uvc->YXdecAB", sel, sel, wdw)
    # -> [3,3,(da db), C*(a b)]  with output channel index c*4 + ab
    return k.reshape(3, 3, 4, c * 4)


def pw_kernel_cm(w):
    """1x1 [1,1,Ci,Co] -> channel-major block-diagonal [1,1,4Ci,4Co]."""
    ci, co = w.shape[2], w.shape[3]
    return jnp.kron(w[0, 0], jnp.eye(4, dtype=w.dtype)).reshape(1, 1, 4 * ci, 4 * co)


def mbconv_plain(x, wdw, bn_scale, se_w1, se_w2, wproj):
    y = conv(x, wdw[:, :, :, None].reshape(3, 3, 1, C), fg=C)
    y = jax.nn.silu(y * bn_scale)
    s = jnp.mean(y, axis=(1, 2), keepdims=True)
    s = jax.nn.silu(conv(s, se_w1))
    s = conv(s, se_w2)
    y = y * jax.nn.sigmoid(s)
    y = conv(y, wproj) * bn_scale
    return y + x


def mbconv_packed_cm(xp, wdw, bn_scale, se_w1, se_w2, wproj):
    bs4 = jnp.repeat(bn_scale, 4)  # channel-major: params repeat per c
    y = conv(xp, dw_kernel_cm(wdw).astype(DT), fg=C)
    y = jax.nn.silu(y * bs4)
    s = jnp.mean(y, axis=(1, 2), keepdims=True)
    s = s.reshape(s.shape[0], 1, 1, C, 4).mean(-1)  # logical pool
    s = jax.nn.silu(conv(s, se_w1))
    s = conv(s, se_w2)
    y = y * jax.nn.sigmoid(jnp.repeat(s, 4, axis=-1))
    y = conv(y, pw_kernel_cm(wproj).astype(DT)) * bs4
    return y + xp


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), DT)
    xp = s2d_cm(x)
    wdw = jax.random.normal(key, (3, 3, C), jnp.float32) * 0.1
    bn_scale = jnp.ones((C,), DT)
    se_w1 = jax.random.normal(key, (1, 1, C, 6), DT) * 0.1
    se_w2 = jax.random.normal(key, (1, 1, 6, C), DT) * 0.1
    wproj = jax.random.normal(key, (1, 1, C, C), jnp.float32) * 0.1

    # --- lane padding confirmation: 8-op elementwise chain ---
    @jax.jit
    def chain(z):
        for _ in range(8):
            z = jax.nn.silu(z) * 1.000001
        return z

    for name, z in [("elemwise x8 @256^2x24 (padded 128)", x),
                    ("elemwise x8 @128^2x96 (padded 128)", xp),
                    ("elemwise x8 @256^2x128 (dense)",
                     jax.random.normal(key, (B, H, W, 128), DT))]:
        print(json.dumps({"bench": name, "ms": round(timeit(chain, z), 3)}))

    # --- MBConv block variants ---
    plain = jax.jit(lambda x: mbconv_plain(
        x, wdw.astype(DT), bn_scale, se_w1, se_w2, wproj.astype(DT)))
    packed = jax.jit(lambda xp: mbconv_packed_cm(
        xp, wdw, bn_scale, se_w1, se_w2, wproj))

    ref = np.asarray(d2s_cm(s2d_cm(plain(x))), np.float32)
    got = np.asarray(d2s_cm(packed(xp)), np.float32)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6)
    print(json.dumps({"check": "packed_cm vs plain", "rel_err": float(err)}))

    print(json.dumps({"bench": "mbconv24 plain @256^2",
                      "ms": round(timeit(plain, x), 3)}))
    print(json.dumps({"bench": "mbconv24 packed_cm @128^2x96",
                      "ms": round(timeit(packed, xp), 3)}))

    # --- isolate the depthwise conv ---
    dwp = jax.jit(lambda x: conv(x, wdw.astype(DT)[:, :, :, None]
                                 .reshape(3, 3, 1, C), fg=C))
    dwg = jax.jit(lambda xp: conv(xp, dw_kernel_cm(wdw).astype(DT), fg=C))
    print(json.dumps({"bench": "depthwise plain @256^2x24",
                      "ms": round(timeit(dwp, x), 3)}))
    print(json.dumps({"bench": "depthwise grouped @128^2x96",
                      "ms": round(timeit(dwg, xp), 3)}))

    # --- stage-0 x3 chain (the real workload) ---
    @jax.jit
    def stage_plain(x):
        for _ in range(3):
            x = mbconv_plain(x, wdw.astype(DT), bn_scale, se_w1, se_w2,
                             wproj.astype(DT))
        return x

    @jax.jit
    def stage_packed(xp):
        for _ in range(3):
            xp = mbconv_packed_cm(xp, wdw, bn_scale, se_w1, se_w2, wproj)
        return xp

    print(json.dumps({"bench": "stage0 x3 plain",
                      "ms": round(timeit(stage_plain, x), 3)}))
    print(json.dumps({"bench": "stage0 x3 packed_cm",
                      "ms": round(timeit(stage_packed, xp), 3)}))


if __name__ == "__main__":
    main()
