"""Receipt: component breakdown of eval_preprocess (CLAHE + sharpen) at
full resolution on TPU — what the 237.7 ms/img at 2048^2 is made of.

Run from the repo root: `python benchmarks/clahe_breakdown.py [size]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, arg, iters=10):
    @jax.jit
    def run_n(x, n):
        def body(i, carry):
            y = fn(x + carry * 0.0)
            return jnp.mean(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    _ = float(run_n(arg, 1))
    t0 = time.perf_counter()
    _ = float(run_n(arg, iters))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:28s} {dt:8.1f} ms", flush=True)


def main():
    from enhanced_unet_tpu.ops.preprocess import (
        clahe_u8,
        eval_preprocess,
        lab_to_rgb_u8,
        rgb_to_lab_u8,
        sharpen_filter,
    )

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.default_rng(0)
    img = jax.device_put(
        jnp.asarray(rng.random((size, size, 3)) * 255.0, jnp.float32))
    chan = jax.device_put(
        jnp.asarray(rng.random((size, size)) * 255.0, jnp.float32))

    timed("eval_preprocess", eval_preprocess, img)
    timed("rgb_to_lab_u8", rgb_to_lab_u8, img)
    timed("lab_to_rgb_u8", lab_to_rgb_u8, img)
    timed("clahe_u8 (clip 2.5, 8x8)", lambda x: clahe_u8(x, 2.5, (8, 8)), chan)
    timed("sharpen_filter", sharpen_filter, img)


if __name__ == "__main__":
    main()
