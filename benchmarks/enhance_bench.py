"""Receipt: cost of the eval-time enhance (CLAHE + sharpen) at full
resolution on TPU — the per-image device-side overhead of the tiled
serving pipeline beyond the raw tile forwards.

Run from the repo root: `python benchmarks/enhance_bench.py [size]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from enhanced_unet_tpu.ops.preprocess import eval_preprocess

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.random((size, size, 3)), jnp.float32))

    @jax.jit
    def run_n(img, n):
        def body(i, carry):
            y = eval_preprocess((img + carry * 0.0) * 255.0) / 255.0
            return jnp.mean(y)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    _ = float(run_n(img, 1))
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(run_n(img, 10))
        dt = time.perf_counter() - t0
        print(f"eval_preprocess {size}^2: {dt / 10 * 1000:.1f} ms/img",
              flush=True)


if __name__ == "__main__":
    main()
