"""Packed 3x3 conv variants: attack the 4x zero-stuffing MAC overhead.

The production packed conv (ops/s2d.py conv3x3_s2d) computes a logical 3x3
SAME conv on the natural s2d packing with a zero-stuffed [3,3,4Ci,4Co]
kernel: 9*(4Ci)*(4Co) MAC slots for 4*9*Ci*Co logical MACs = 4x overhead.
Round-3 attribution (op_trace.py) puts the four row-0 NestedBlock convs at
~48 ms/iter (b16, 512^2) with that overhead.

Variant "aligned22": pad the packed tensor by one packed row/col on each
side, run ONE VALID conv with a [2,2,4Ci,4Co] kernel holding each output
sub-position's taps (36 of 64 slots non-zero = 16/9 logical overhead), then
assemble the natural packing from four [h,w] slices of the [h+1,w+1]
output:

    out[..., (a,b,o)] = y[a:a+h, b:b+w, (a,b,o)]

Correctness is asserted against the logical conv before timing.  An earlier
round-2 formulation lost to zero-stuffing because it REPHASED the packing
(a pure-data-movement pass) before the 2x2 conv; this one slices after the
conv instead, where XLA can fuse the slices into the consumers.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/packed_conv_variants.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from enhanced_unet_tpu.ops.s2d import (  # noqa: E402
    aligned22_kernel,
    conv3x3_aligned22,
    depth_to_space,
    s2d_kernel_same,
    space_to_depth,
)


def _check_correct():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 11)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 11, 7)) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = depth_to_space(
        conv3x3_aligned22(space_to_depth(x), aligned22_kernel(w)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    print("aligned22 correctness OK", flush=True)


def _time(fn, *args, steps=10):
    @jax.jit
    def run_n(n, *a):
        def body(i, carry):
            return jnp.mean(fn(*a) + carry * 0.0).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    _ = float(run_n(1, *args))
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(run_n(steps, *args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / steps * 1000


def main():
    _check_correct()
    # row-0 NestedBlock_7 shape class: Ctot=184 logical, out 48, 256^2
    # logical = [16,128,128,736] packed
    rng = np.random.default_rng(0)
    n, h, cin, cout = 16, 128, 184, 48
    xp = jnp.asarray(rng.normal(size=(n, h, h, 4 * cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)

    k9 = s2d_kernel_same(w).astype(jnp.bfloat16)
    k22 = aligned22_kernel(w).astype(jnp.bfloat16)

    def stuffed(xp):
        return jax.lax.conv_general_dilated(
            xp, k9, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def aligned(xp):
        return conv3x3_aligned22(xp, k22)

    t_s = _time(stuffed, xp)
    t_a = _time(aligned, xp)
    print(f"stuffed 3x3 (4x MACs):    {t_s:7.2f} ms", flush=True)
    print(f"aligned 2x2 (16/9 MACs):  {t_a:7.2f} ms", flush=True)

    # unpacked reference: logical conv at 256^2 with 184ch (lane-padded)
    xl = jnp.asarray(rng.normal(size=(n, 2 * h, 2 * h, cin)), jnp.bfloat16)
    wl = w.astype(jnp.bfloat16)

    def plain(xl):
        return jax.lax.conv_general_dilated(
            xl, wl, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    print(f"plain unpacked 3x3:       {_time(plain, xl):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
