"""Round-3 bisect: time individual EnhancedUNet branches on TPU.

Usage: python benchmarks/bisect_r3.py {unetpp|unetpp_plain|deeplab|deeplab32|full}

Uses the same reliable timing protocol as bench.py (jitted init, N forwards
chained through lax.fori_loop inside one jit, scalar checksum fetch) — the
axon relay does not honor per-dispatch block_until_ready.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

which = sys.argv[1]
b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
s = int(sys.argv[3]) if len(sys.argv) > 3 else 512
steps = 10

from enhanced_unet_tpu.models.enhanced_unet import (
    DeepLabV3Plus, EnhancedUNet, UNetPlusPlus,
)

if which == "unetpp":
    m = UNetPlusPlus()
elif which == "unetpp_plain":
    m = UNetPlusPlus(packed_decoder=False)
elif which == "unetpp_noscse":
    m = UNetPlusPlus(use_scse=False)
elif which == "deeplab":
    m = DeepLabV3Plus()
elif which == "deeplab32":
    m = DeepLabV3Plus(output_stride=32)
elif which == "full":
    m = EnhancedUNet()
else:
    raise SystemExit(f"unknown: {which}")

x = jnp.asarray(np.random.default_rng(0).random((b, s, s, 3)), jnp.float32)
t0 = time.perf_counter()
v = jax.jit(lambda r, z: m.init(r, z, train=False))(
    {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x[:1]
)
jax.block_until_ready(v)
print("init", round(time.perf_counter() - t0, 1), flush=True)

params, bs = v["params"], v.get("batch_stats", {})


def fwd(params, bs, x):
    out = m.apply({"params": params, "batch_stats": bs}, x, train=False)
    return out[0] if isinstance(out, tuple) else out


@jax.jit
def run_n(params, bs, x, n):
    def body(i, carry):
        return jnp.mean(fwd(params, bs, x + carry * 0.0)).astype(x.dtype)
    return jax.lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))


t0 = time.perf_counter()
_ = float(run_n(params, bs, x, 1))
print("compile+first", round(time.perf_counter() - t0, 1), flush=True)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    _ = float(run_n(params, bs, x, steps))
    times.append(time.perf_counter() - t0)
dt = float(np.median(times)) / steps
print(which, f"b{b}", "ms/step", round(dt * 1000, 1),
      "img/s", round(b / dt, 1), flush=True)
