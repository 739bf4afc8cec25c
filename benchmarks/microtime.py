"""Reliable micro-timing on the axon relay: chain N applications of a
function through a lax.fori_loop inside ONE jit and fetch a scalar.
Per-dispatch timing with block_until_ready under-reports wildly here
(pipelined dispatch); this protocol is immune (see bench.py).

time_op(fn, x, iters) returns ms per application.  `fn` must map a tensor
to a tensor of the same shape+dtype (a dummy carry-dependency add chains
the iterations so XLA cannot elide them).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def time_op(fn, x, iters: int = 50, warmup: bool = True) -> float:
    @jax.jit
    def run_n(x, n):
        def body(i, carry):
            y = fn(x + carry)
            # tiny but NONZERO coupling so XLA cannot fold the carry (and
            # with it the whole body) away
            return (jnp.mean(y) * 1e-12).astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))

    _ = float(run_n(x, 1))
    t0 = time.perf_counter()
    _ = float(run_n(x, iters))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3
