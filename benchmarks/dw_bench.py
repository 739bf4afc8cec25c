"""Depthwise-conv lowering shootout on TPU.

XLA lowers the stock NHWC depthwise 3x3 at [16,256,256,24] to a 3.3 ms
kernel (benchmarks/enc_bench.py) for 0.45 GF of work and ~200 MB of
traffic — ~25x off the bandwidth roofline.  Candidates:

  nhwc      : stock lax conv, feature_group_count=C
  shift9    : sum of 9 shifted FMAs on the SAME-padded tensor (one XLA
              loop fusion; rereads the input 9x but each read is fused)
  nchw_dn   : conv with NCHW dimension numbers (spatial in lanes)
  vmap2d    : vmap the single-channel 2D conv over (N, C)

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/dw_bench.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 16, 256, 256, 24
DT = jnp.bfloat16


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), DT)
    wdw = (jax.random.normal(key, (3, 3, C), jnp.float32) * 0.1).astype(DT)

    @jax.jit
    def nhwc(x):
        k = wdw[:, :, None, :].reshape(3, 3, 1, C)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def shift9(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jnp.zeros_like(x)
        for u in range(3):
            for v in range(3):
                y = y + wdw[u, v] * jax.lax.dynamic_slice(
                    xp, (0, u, v, 0), x.shape)
        return y

    @jax.jit
    def nchw_dn(x):
        xt = x.transpose(0, 3, 1, 2)
        k = wdw.transpose(2, 0, 1)[:, None, :, :]  # OIHW [C,1,3,3]
        y = jax.lax.conv_general_dilated(
            xt, k, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y.transpose(0, 2, 3, 1)

    @jax.jit
    def nchw_noT(xt):
        # steady-state cost if activations LIVED in NCHW
        k = wdw.transpose(2, 0, 1)[:, None, :, :]
        return jax.lax.conv_general_dilated(
            xt, k, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    ref = np.asarray(nhwc(x), np.float32)
    for name, fn, arg in [("shift9", shift9, x), ("nchw_dn", nchw_dn, x)]:
        got = np.asarray(fn(arg), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6)
        print(json.dumps({"check": name, "rel_err": float(err)}))

    xt = x.transpose(0, 3, 1, 2)
    for name, fn, arg in [("nhwc", nhwc, x), ("shift9", shift9, x),
                          ("nchw_dn (incl transposes)", nchw_dn, x),
                          ("nchw steady-state", nchw_noT, xt)]:
        print(json.dumps({"bench": name, "ms": round(timeit(fn, arg), 3)}))

    # the 5x5 case from stages 2/4/5 (64ch @128^2)
    x5 = jax.random.normal(key, (B, 128, 128, 64), DT)
    w5 = (jax.random.normal(key, (5, 5, 64), jnp.float32) * 0.1).astype(DT)

    @jax.jit
    def nhwc5(x):
        k = w5[:, :, None, :].reshape(5, 5, 1, 64)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", feature_group_count=64,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def shift25(x):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        y = jnp.zeros_like(x)
        for u in range(5):
            for v in range(5):
                y = y + w5[u, v] * jax.lax.dynamic_slice(
                    xp, (0, u, v, 0), x.shape)
        return y

    print(json.dumps({"bench": "nhwc 5x5 @128^2x64",
                      "ms": round(timeit(nhwc5, x5), 3)}))
    print(json.dumps({"bench": "shift25 5x5 @128^2x64",
                      "ms": round(timeit(shift25, x5), 3)}))


if __name__ == "__main__":
    main()
