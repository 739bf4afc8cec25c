"""Micro-benchmarks for the UNet++ decoder bottleneck (round-2 perf work).

The round-1 profile shows the UNet++ branch at ~8% MFU while the fusion
stage hits 52%.  Decoder row-0/row-1 tensors have 24-64 channels at
256x256 — on TPU the lane (minor) dimension pads to 128, so a 32-channel
NHWC tensor wastes 4x HBM bandwidth and a conv with Cout=32 can use at
most 1/4 of the MXU's output lanes.  These benches isolate each decoder
ingredient and test a space-to-depth (s2d) rewrite that packs 2x2 spatial
blocks into channels (32ch@256^2 -> 128ch@128^2), which is mathematically
exact for the 3x3 convs (kernel zero-stuffing) and free for the nearest
upsample (channel replication).

Usage:  PYTHONPATH=/root/.axon_site:. python benchmarks/decoder_bench.py [name ...]
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from enhanced_unet_tpu.models.blocks import DoubleConv, SCSEBlock

B = 16


def bench(name, fn, *args, steps=30):
    """fori_loop-chained timing (same protocol as bench.py)."""

    @jax.jit
    def run_n(n, *a):
        def body(i, carry):
            y = fn(*a)
            first = jax.tree.leaves(y)[0]
            return (carry * 0.0 + jnp.mean(first)).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    _ = float(run_n(1, *args))
    t0 = time.perf_counter()
    _ = float(run_n(steps, *args))
    dt = time.perf_counter() - t0
    print(json.dumps({"bench": name, "ms": round(dt / steps * 1e3, 3)}),
          flush=True)


def init_apply(model, *shapes, dtypes=None):
    dtypes = dtypes or [jnp.float32] * len(shapes)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.random(s), d) for s, d in zip(shapes, dtypes)]
    variables = model.init(jax.random.key(0), *xs)

    def apply(*a):
        return model.apply(variables, *a)

    return apply, xs


# ---------------------------------------------------------------------------
# space-to-depth helpers (exact rewrites)
# ---------------------------------------------------------------------------

def s2d(x):
    """[N,H,W,C] -> [N,H/2,W/2,4C]; channel block (a,b) = sub-pixel."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def d2s(x):
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * 2, w * 2, c)


def s2d_kernel(w):
    """Map a 3x3 HWIO kernel [3,3,Cin,Cout] onto the s2d grid:
    returns [2,2,4Cin,4Cout] such that
    conv2x2_VALID(rephase(s2d(x)), w_s2d) == s2d(conv3x3_SAME(x, w)).

    Derivation: with x' = pad(x, ((1,1),(1,1))) and S = s2d(x') (what
    `rephase` builds directly from the natural packing), output parity
    (a,b): out[2i+a,2j+b] = sum_{u,v} w[u,v] x'[2i+a+u, 2j+b+v], and
    x'[2i+a+u] lives at S row i + (a+u)//2, sub-row (a+u)%2, so the
    S-kernel tap (dy, da) receives w[u] with u = 2*dy + da - a when
    0 <= u < 3 (zero otherwise).
    """
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 4 * cin, 4 * cout), w.dtype)
    for a in range(2):
        for b in range(2):
            for dy in range(2):
                for da in range(2):
                    u = 2 * dy + da - a
                    if not 0 <= u <= 2:
                        continue
                    for dx in range(2):
                        for db in range(2):
                            v = 2 * dx + db - b
                            if not 0 <= v <= 2:
                                continue
                            out = out.at[
                                dy, dx,
                                (da * 2 + db) * cin:(da * 2 + db + 1) * cin,
                                (a * 2 + b) * cout:(a * 2 + b + 1) * cout,
                            ].set(w[u, v])
    return out


def rephase(x_nat):
    """Natural packing [N,h,w,4C] -> S-phase [N,h+1,w+1,4C] where
    S = s2d(pad(x, ((1,1),(1,1)))): S pixel (R,Q), sub (da,db) holds
    original pixel (2R-1+da, 2Q-1+db) (zeros outside).  Pure
    slice/pad/concat of channel blocks — one cheap pass."""
    n, h, w, c4 = x_nat.shape
    c = c4 // 4
    blocks = x_nat.reshape(n, h, w, 2, 2, c)

    def shift(blk, down, right):
        # place blk so S[R,Q] = blk[R-down, Q-right] (zeros out of range)
        return jnp.pad(blk, ((0, 0), (down, 1 - down), (right, 1 - right),
                             (0, 0)))

    out = []
    for da in range(2):
        for db in range(2):
            # S sub (da,db) = original row 2R-1+da = nat row R-1+da? No:
            # orig (2R-1+da): da=0 -> nat[R-1] sub 1; da=1 -> nat[R] sub 0.
            a = 1 - da
            b = 1 - db
            out.append(shift(blocks[:, :, :, a, b, :], down=1 - da,
                             right=1 - db))
    return jnp.concatenate(out, axis=-1)


def conv3x3_s2d(x_s2d, w, cin):
    """3x3 SAME conv computed in s2d space.  x_s2d: [N,h,w,4Cin] natural
    packing; w: [3,3,Cin,Cout] logical kernel.  Returns natural-packed
    [N,h,w,4Cout]."""
    ws = s2d_kernel(w).astype(x_s2d.dtype)
    xp = rephase(x_s2d)
    # VALID 2x2 conv over (h+1, w+1) -> (h, w)
    return jax.lax.conv_general_dilated(
        xp, ws, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

CONFIGS = {}


def cfg(name):
    def reg(fn):
        CONFIGS[name] = fn
        return fn
    return reg


class _Node(nn.Module):
    """Row-0 UNet++ node at column 4: concat(24 + 3x32 same-level, up 64)
    -> DoubleConv(32) -> scSE.  The heaviest decoder node."""
    use_scse: bool = True

    @nn.compact
    def __call__(self, f0, s1, s2_, s3, below):
        up = jnp.repeat(jnp.repeat(below, 2, 1), 2, 2)
        y = jnp.concatenate([f0, s1, s2_, s3, up], axis=-1)
        y = DoubleConv(32)(y, False)
        if self.use_scse:
            y = SCSEBlock()(y)
        return y


_NODE_SHAPES = [(B, 256, 256, 24)] + [(B, 256, 256, 32)] * 3 + [(B, 128, 128, 64)]
_BF = [jnp.bfloat16] * 5


@cfg("node_row0")
def _():
    apply, xs = init_apply(_Node(), *_NODE_SHAPES, dtypes=_BF)
    bench("row0 node j=4 (concat+DoubleConv+scSE) 256^2", apply, *xs)


@cfg("node_row0_noscse")
def _():
    apply, xs = init_apply(_Node(use_scse=False), *_NODE_SHAPES, dtypes=_BF)
    bench("row0 node j=4 NO scSE", apply, *xs)


@cfg("scse_256_32")
def _():
    apply, xs = init_apply(SCSEBlock(), (B, 256, 256, 32), dtypes=[jnp.bfloat16])
    bench("scSE alone 256^2 x32", apply, *xs)


@cfg("doubleconv_256")
def _():
    apply, xs = init_apply(DoubleConv(32), (B, 256, 256, 184), dtypes=[jnp.bfloat16])
    bench("DoubleConv 184->32->32 @256^2", apply, *xs)


@cfg("doubleconv_256_s2d")
def _():
    """Same math in s2d space: 736->128->128ch @128^2."""
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 184, 32)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 32, 32)), jnp.bfloat16)
    x = jnp.asarray(rng.random((B, 128, 128, 4 * 184)), jnp.bfloat16)
    ws1 = s2d_kernel(w1).astype(jnp.bfloat16)
    ws2 = s2d_kernel(w2).astype(jnp.bfloat16)

    def f(x, ws1, ws2):
        y = jax.lax.conv_general_dilated(
            rephase(x), ws1, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn.relu(y)
        y = jax.lax.conv_general_dilated(
            rephase(y), ws2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.relu(y)

    bench("DoubleConv s2d-packed (736->128->128 @128^2)", f, x, ws1, ws2)


@cfg("upconcat_256")
def _():
    rng = np.random.default_rng(0)
    parts = [jnp.asarray(rng.random(s), jnp.bfloat16) for s in _NODE_SHAPES]

    def f(*xs):
        up = jnp.repeat(jnp.repeat(xs[-1], 2, 1), 2, 2)
        return jnp.concatenate(list(xs[:-1]) + [up], axis=-1)

    bench("upsample+concat alone 256^2", f, *parts)


@cfg("conv_lane_sweep")
def _():
    """3x3 conv at 256^2, Cin=64 fixed, Cout in {16,32,64,128}: how much
    does lane padding cost?"""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 256, 256, 64)), jnp.bfloat16)
    for cout in (16, 32, 64, 128):
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, cout)), jnp.bfloat16)

        def f(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        bench(f"conv3x3 64->{cout} @256^2", f, x, w)


@cfg("s2d_equiv")
def _():
    """Correctness: s2d conv == direct conv (fp32, small)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 16, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 5, 7)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = d2s(conv3x3_s2d(s2d(x), w, 5))
    err = float(jnp.max(jnp.abs(ref - got)))
    print(json.dumps({"bench": "s2d equivalence max err", "err": err}),
          flush=True)


def main():
    names = sys.argv[1:] or list(CONFIGS)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        try:
            CONFIGS[n]()
        except Exception as e:
            print(json.dumps({"bench": n, "error": str(e)[:300]}), flush=True)




def _effnet_stage_cfgs():
    """Register effnet-b5 encoder truncations at b16/512^2 so per-stage
    cost = successive differences."""
    from enhanced_unet_tpu.models.encoders import EfficientNetEncoder

    class _Enc(nn.Module):
        stages: int = 7

        @nn.compact
        def __call__(self, x):
            feats = EfficientNetEncoder(variant="efficientnet-b5",
                                        max_stages=self.stages)(
                x.astype(jnp.bfloat16), False)
            return sum(f.mean() for f in feats[1:])

    for s in (1, 2, 3, 4, 5, 6, 7):
        def make(s=s):
            def run():
                apply, xs = init_apply(_Enc(stages=s), (B, 512, 512, 3))
                bench(f"effnet-b5 stages<= {s} @b16", apply, *xs, steps=20)
            return run
        CONFIGS[f"effnet_stage_{s}"] = make()


_effnet_stage_cfgs()


if __name__ == "__main__":
    main()
