"""Whole-segment s2d-packed EfficientNet high-res stages: the round-4
throughput receipt.

Round-2/3 receipts (dw_bench.py, enc_bench.py) measured PER-OP packed
variants with block_until_ready timing — unreliable over the axon relay
and blind to fusion effects.  This harness measures the COMPLETE high-res
segment (stem -> stage0 -> stage1 of efficientnet-b5 at 512^2 input) in
plain vs whole-segment channel-major packed form, with the chained
fori_loop + scalar-fetch protocol bench.py uses (the only timing that
holds up over the relay).

Packed form: stem runs plain (3-channel-input conv, XLA's special
small-Cin path) and its output packs ONCE ([N,256,256,48] ->
[N,128,128,192], channel-major c*4+(a*2+b)); stage-0 blocks run packed
(depthwise -> fg=C grouped conv with a stuffed [3,3,4,4C] kernel, 1x1s ->
kron(w, I4) block-diagonal kernels, SE pool -> reshape-mean); stage 1's
stride-2 depthwise consumes the packed tensor directly (logical stride-2
k3 == packed 2x2 conv with (1,0) low padding) and emits the UNPACKED
128^2 tensor; the remaining stage-1 blocks pack again at 128^2
([N,64,64,160]).  Two layout passes total; every intermediate avoids the
24/40ch -> 128-lane padding the plain form pays on each of ~50 HBM passes.

Run on TPU: PYTHONPATH=/root/repo python benchmarks/enc_packed_bench.py
"""

from __future__ import annotations

import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("EPB_BATCH", "16"))
SIZE = int(os.environ.get("EPB_SIZE", "512"))
DT = jnp.bfloat16

# efficientnet-b5 high-res spec (encoders.py _EFFNET_BASE x (1.6, 2.2)):
# stem 48; stage0: 3 blocks 48->24 expand1 k3; stage1: 5 blocks 24->40
# expand6 k3 (first stride 2)
STEM_C = 48
S0_BLOCKS, S0_C = 3, 24
S1_BLOCKS, S1_C, S1_E = 5, 40, 6


# ---------------------------------------------------------------------------
# packing helpers (channel-major: packed channel = c*4 + (a*2+b))
# ---------------------------------------------------------------------------

def s2d_cm(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h // 2, w // 2, c * 4)


def d2s_cm(x):
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * 2, w * 2, c)


# selector: packed tap (dy, da->a) hits logical tap u (see ops/s2d.py)
_SEL = np.zeros((3, 2, 2, 3), np.float32)
for _dy in range(3):
    for _da in range(2):
        for _a in range(2):
            _u = 2 * (_dy - 1) + _da - _a + 1
            if 0 <= _u <= 2:
                _SEL[_dy, _da, _a, _u] = 1.0


def dw_kernel_cm(wdw):
    """[3,3,C] depthwise -> grouped stuffed [3,3,4,4C] (channel-major)."""
    sel = jnp.asarray(_SEL, wdw.dtype)
    k = jnp.einsum("YdAu,XeBv,uvc->YXdecAB", sel, sel, wdw)
    return k.reshape(3, 3, 4, wdw.shape[2] * 4)


def pw_kernel_cm(w):
    """1x1 [Ci,Co] -> channel-major block-diagonal [1,1,4Ci,4Co]."""
    ci, co = w.shape
    return jnp.kron(w, jnp.eye(4, dtype=w.dtype)).reshape(1, 1, 4 * ci, 4 * co)


# stride-2 depthwise consuming a packed tensor: with TF-SAME stride-2 k3
# at even sizes (pad low 0 / high 1), logical out(Y,X) reads logical rows
# 2Y..2Y+2 = packed rows Y (both sub-rows) and Y+1 (sub-row 0): a 2x2 conv
# over the packed grid with (0,1) padding.  kernel [2,2,4,C]: packed tap
# (dy, sub-row a) covers logical tap u = 2*dy + a.
_SEL_S2 = np.zeros((2, 2, 3), np.float32)  # [dy, a, u]
for _dy in range(2):
    for _a in range(2):
        _u = 2 * _dy + _a
        if 0 <= _u <= 2:
            _SEL_S2[_dy, _a, _u] = 1.0


def dw_s2_kernel_from_packed(wdw):
    """[3,3,C] depthwise stride-2 -> [2,2,4,C] grouped kernel over the
    channel-major packed input (output unpacked at half resolution)."""
    sel = jnp.asarray(_SEL_S2, wdw.dtype)
    k = jnp.einsum("dAu,eBv,uvc->decAB", sel, sel, wdw)  # [2,2,c,2,2]
    return k.transpose(0, 1, 3, 4, 2).reshape(2, 2, 4, wdw.shape[2])


def conv(x, k, fg=1, strides=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, strides, padding, feature_group_count=fg,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# MBConv in both forms (inference math: BN folded to scale+shift)
# ---------------------------------------------------------------------------

def mbconv_plain(x, p):
    cin = x.shape[-1]
    y = x
    if p["expand"] is not None:
        y = jax.nn.silu(conv(y, p["expand"][None, None]) * p["bn0"])
    mid = y.shape[-1]
    y = jax.nn.silu(conv(y, p["dw"][:, :, None, :].reshape(3, 3, 1, mid),
                         fg=mid, strides=p["strides"]) * p["bn1"])
    s = jnp.mean(y, axis=(1, 2), keepdims=True)
    s = conv(jax.nn.silu(conv(s, p["se1"][None, None])), p["se2"][None, None])
    y = y * jax.nn.sigmoid(s)
    y = conv(y, p["proj"][None, None]) * p["bn2"]
    if p["strides"] == (1, 1) and cin == y.shape[-1]:
        y = y + x
    return y


def mbconv_packed(xp, p):
    """Stride-1 block on the channel-major packing; same math."""
    cin4 = xp.shape[-1]
    y = xp
    if p["expand"] is not None:
        y = jax.nn.silu(conv(y, pw_kernel_cm(p["expand"]))
                        * jnp.repeat(p["bn0"], 4))
    mid = y.shape[-1] // 4
    y = jax.nn.silu(conv(y, dw_kernel_cm(p["dw"]), fg=mid)
                    * jnp.repeat(p["bn1"], 4))
    s = jnp.mean(y, axis=(1, 2), keepdims=True)
    s = s.reshape(s.shape[0], 1, 1, mid, 4).mean(-1)  # logical global pool
    s = conv(jax.nn.silu(conv(s, p["se1"][None, None])), p["se2"][None, None])
    y = y * jnp.repeat(jax.nn.sigmoid(s), 4, axis=-1)
    y = conv(y, pw_kernel_cm(p["proj"])) * jnp.repeat(p["bn2"], 4)
    if cin4 == y.shape[-1]:
        y = y + xp
    return y


def mbconv_s2_from_packed(xp, p):
    """Stride-2 block consuming packed input, emitting UNPACKED output."""
    y = xp
    if p["expand"] is not None:
        y = jax.nn.silu(conv(y, pw_kernel_cm(p["expand"]))
                        * jnp.repeat(p["bn0"], 4))
    mid = y.shape[-1] // 4
    # logical TF-SAME stride-2 k3 at even sizes pads (0,1): the dy=1/a=0
    # tap of the last output row reads packed row H/2 -> pad high by 1
    y = conv(y, dw_s2_kernel_from_packed(p["dw"]), fg=mid,
             padding=((0, 1), (0, 1)))
    y = jax.nn.silu(y * p["bn1"])
    s = jnp.mean(y, axis=(1, 2), keepdims=True)
    s = conv(jax.nn.silu(conv(s, p["se1"][None, None])), p["se2"][None, None])
    y = y * jax.nn.sigmoid(s)
    y = conv(y, p["proj"][None, None]) * p["bn2"]
    return y


def make_block_params(rng, cin, cout, expand, strides):
    mid = cin * expand
    g = lambda *shape: jnp.asarray(  # noqa: E731
        rng.normal(0, 0.1, shape), DT)
    return {
        "expand": None if expand == 1 else g(cin, mid),
        "bn0": g(mid) * 0 + 1,
        "dw": g(3, 3, mid),
        "bn1": g(mid) * 0 + 1,
        "se1": g(mid, max(1, cin // 4)),
        "se2": g(max(1, cin // 4), mid),
        "proj": g(mid, cout),
        "bn2": g(cout) * 0 + 1,
        "strides": strides,
    }


def build_segment_params(seed=0):
    rng = np.random.default_rng(seed)
    g = lambda *shape: jnp.asarray(rng.normal(0, 0.1, shape), DT)  # noqa: E731
    stem = {"k": g(3, 3, 3, STEM_C), "bn": g(STEM_C) * 0 + 1}
    blocks = []
    cin = STEM_C
    for _ in range(S0_BLOCKS):
        blocks.append(make_block_params(rng, cin, S0_C, 1, (1, 1)))
        cin = S0_C
    blocks.append(make_block_params(rng, cin, S1_C, S1_E, (2, 2)))
    cin = S1_C
    for _ in range(S1_BLOCKS - 1):
        blocks.append(make_block_params(rng, cin, S1_C, S1_E, (1, 1)))
    return stem, blocks


def segment_plain(x, stem, blocks):
    y = jax.nn.silu(conv(x, stem["k"], strides=(2, 2)) * stem["bn"])
    for p in blocks:
        y = mbconv_plain(y, p)
    return y


def segment_packed(x, stem, blocks):
    y = jax.nn.silu(conv(x, stem["k"], strides=(2, 2)) * stem["bn"])
    yp = s2d_cm(y)                      # pack once after the stem
    i = 0
    for _ in range(S0_BLOCKS):          # stage 0 packed @256^2-logical
        yp = mbconv_packed(yp, blocks[i]); i += 1
    y = mbconv_s2_from_packed(yp, blocks[i]); i += 1   # -> unpacked @128^2
    yp = s2d_cm(y)                      # re-pack for the 40ch 128^2 blocks
    while i < len(blocks):
        yp = mbconv_packed(yp, blocks[i]); i += 1
    return d2s_cm(yp)


def chained_time(fn, x, steps=10, reps=3):
    @jax.jit
    def run_n(x, n):
        def body(i, carry):
            y = fn(x + carry * 0.0)
            return jnp.mean(y).astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))

    _ = float(run_n(x, 1))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run_n(x, steps))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / steps * 1e3


def main():
    print("devices:", jax.devices())
    stem, blocks = build_segment_params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, SIZE, SIZE, 3)), DT)

    plain = functools.partial(segment_plain, stem=stem, blocks=blocks)
    packed = functools.partial(segment_packed, stem=stem, blocks=blocks)

    # numerics: identical math modulo bf16 reassociation
    a = np.asarray(jax.jit(plain)(x), np.float32)
    b = np.asarray(jax.jit(packed)(x), np.float32)
    rel = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-6))
    print(json.dumps({"check": "packed vs plain segment", "rel_err": rel}))
    assert rel < 0.02, rel

    for name, fn in [("plain", plain), ("packed", packed)]:
        ms = chained_time(fn, x)
        print(json.dumps({
            "bench": f"b5 highres segment {name} @{SIZE}^2 b{B}",
            "ms_per_iter": round(ms, 3),
        }))


if __name__ == "__main__":
    main()
