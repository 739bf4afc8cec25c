"""Probe: is the lane (minor) dim of small-channel NHWC activations
physically padded in HBM?  Times ONE elementwise pass (x*1.0001+silu) over
tensors with equal logical bytes but different channel counts, using the
chained fori_loop protocol.  If 24-channel tensors cost ~128/24x more than
dense-128 tensors of equal logical size, padding is physical.

Also re-times the depthwise variants with the reliable protocol.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/pad_probe.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from microtime import time_op

DT = jnp.bfloat16


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    elem = lambda z: jax.nn.silu(z) * 1.0001

    # equal logical elements (16*256*256*24 = 25.2M) in three shapes
    shapes = [
        ("NHWC 24ch @256^2", (16, 256, 256, 24)),
        ("NHWC 96ch @128^2", (16, 128, 128, 96)),
        ("NHWC 128ch (24.6M)", (16, 240, 256, 128 // 2)),  # 64ch half-pad
        ("NHWC 128ch dense @192", (16, 192, 256, 32 * 4)),  # 128 lanes
    ]
    for name, s in shapes:
        x = jax.random.normal(key, s, DT)
        ms = time_op(elem, x)
        gb = 2 * 2 * 1e-9  # bytes/elem r+w
        n = 1
        for d in s:
            n *= d
        print(json.dumps({"bench": f"elemwise {name}", "ms": round(ms, 4),
                          "eff_GBps": round(n * gb / (ms / 1e3), 0)}))

    # depthwise variants, reliable protocol
    B, H, W, C = 16, 256, 256, 24
    x = jax.random.normal(key, (B, H, W, C), DT)
    wdw = (jax.random.normal(key, (3, 3, C), jnp.float32) * 0.1).astype(DT)

    def nhwc(x):
        k = wdw[:, :, None, :].reshape(3, 3, 1, C)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def shift9(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jnp.zeros_like(x)
        for u in range(3):
            for v in range(3):
                y = y + wdw[u, v] * jax.lax.dynamic_slice(
                    xp, (0, u, v, 0), x.shape)
        return y

    for name, fn in [("dw nhwc", nhwc), ("dw shift9", shift9)]:
        print(json.dumps({"bench": name, "ms": round(time_op(fn, x), 4)}))


if __name__ == "__main__":
    main()
