"""Pallas-vs-XLA kernel microbenchmarks on the TPU.

Uses the same chained-fori_loop timing protocol as bench.py (per-dispatch
timing is unreliable over the axon relay).  Results decide which kernels the
models route through (ops/pallas/__init__.py policy); keep only wins.

Run: python benchmarks/kernel_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from enhanced_unet_tpu.ops.pallas.conv_fused import (
    fused_conv3x3_bn_relu,
    fused_conv3x3_bn_relu_reference,
)


def time_fn(fn, *args, steps=30):
    """Chained execution: each iteration consumes a scalar from the last."""

    @jax.jit
    def run_n(*args):
        def body(i, carry):
            out = fn(*args)
            return (out.astype(jnp.float32).mean() * 0.0 + carry).astype(
                jnp.float32
            )
        return jax.lax.fori_loop(0, steps, body, jnp.zeros((), jnp.float32))

    _ = float(run_n(*args))  # compile+sync
    t0 = time.perf_counter()
    _ = float(run_n(*args))
    return (time.perf_counter() - t0) / steps


def bench_fused_conv():
    rng = np.random.default_rng(0)
    print(f"{'shape':<28} {'cin->cout':<12} {'xla(ms)':>8} {'pallas(ms)':>10} {'speedup':>8}")
    for (n, h, w), cin, cout in [
        ((8, 128, 128), 64, 64),
        ((8, 64, 128), 128, 128),
        ((8, 32, 128), 256, 256),
        ((4, 256, 256), 32, 32),
    ]:
        x = jnp.asarray(rng.normal(size=(n, h, w, cin)), jnp.bfloat16)
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        scale = jnp.ones((cout,), jnp.float32)
        shift = jnp.zeros((cout,), jnp.float32)

        t_xla = time_fn(
            lambda x, w, s, b: fused_conv3x3_bn_relu_reference(x, w, s, b),
            x, wgt, scale, shift,
        )
        try:
            t_pl = time_fn(
                lambda x, w, s, b: fused_conv3x3_bn_relu(x, w, s, b),
                x, wgt, scale, shift,
            )
        except Exception as e:
            print(f"({n},{h},{w})x{cin:<18} pallas failed: {type(e).__name__}: {e}")
            continue
        print(
            f"({n},{h},{w}){'':<12} {cin}->{cout:<8} "
            f"{t_xla*1e3:8.3f} {t_pl*1e3:10.3f} {t_xla/t_pl:8.2f}x"
        )


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_fused_conv()
