"""Per-op TPU time attribution via jax.profiler + perfetto trace parsing.

Runs a chosen component forward N times under jax.profiler.trace, then
aggregates device-side op durations from the dumped trace.json.gz and
prints the top ops.  Cross-reference op names against the dumped HLO
(/tmp/op_trace_hlo.txt) to find the producing source line (op metadata).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/op_trace.py <target>
  targets: encoder_s2 | encoder | unetpp | full | deeplab
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/jaxtrace_ops"


def build(target):
    from enhanced_unet_tpu.models.enhanced_unet import (
        DeepLabV3Plus,
        EnhancedUNet,
        UNetPlusPlus,
    )
    sys.path.insert(0, os.path.dirname(__file__))
    from profile_r2 import _EncoderOnly

    shape = (16, 512, 512, 3)
    if target == "encoder_s2":
        model = _EncoderOnly("efficientnet-b5", 2)
    elif target == "encoder":
        model = _EncoderOnly("efficientnet-b5")
    elif target == "unetpp":
        model = UNetPlusPlus(packed_decoder=True)
    elif target == "deeplab":
        model = DeepLabV3Plus()
    else:
        model = EnhancedUNet()
    return model, shape


def trace_train():
    """Per-op trace of one jitted train step (batch 8, 512^2)."""
    from enhanced_unet_tpu.config import get_preset
    from enhanced_unet_tpu.models import get_model
    from enhanced_unet_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    cfg = get_preset("enhanced_unet", num_epochs=50)
    model = get_model("enhanced_unet", dtype=jnp.bfloat16)
    state = create_train_state(
        model, cfg, steps_per_epoch=100, rng=jax.random.key(0),
        input_shape=(8, 512, 512, 3))
    x = jnp.asarray(rng.random((8, 512, 512, 3)), jnp.float32)
    masks = jnp.asarray(rng.integers(0, 3, (8, 512, 512)), jnp.int32)
    valid = jnp.ones((8, 512, 512), bool)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    d_rng = jax.random.key(1)

    state, _ = step(state, x, masks, valid, d_rng)  # warm (donates!)
    jax.block_until_ready(state.params)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            state, m = step(state, x, masks, valid, d_rng)
        jax.block_until_ready(state.params)
    return "train"


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "full"
    if target == "train":
        trace_train()
        report("train")
        return
    model, shape = build(target)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape), jnp.float32)
    from enhanced_unet_tpu.utils.init import init_variables
    variables = init_variables(
        model, {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1,) + shape[1:], jnp.float32))
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    @jax.jit
    def fwd(params, stats, x):
        out = model.apply({"params": params, "batch_stats": stats}, x,
                          train=False)
        return jax.tree.leaves(out)[0]

    # lower+compile ONCE and execute that same executable, so the fusion
    # numbering in the dumped HLO matches the trace op names exactly
    compiled = fwd.lower(params, stats, x).compile()
    with open("/tmp/op_trace_hlo.txt", "w") as f:
        f.write(compiled.as_text())

    y = compiled(params, stats, x); jax.block_until_ready(y)  # warm
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            y = compiled(params, stats, x)
        jax.block_until_ready(y)
    report(target)


def report(target):
    files = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"),
                   key=os.path.getmtime)
    if not files:
        print("no trace produced"); return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # device-side events: pick PIDs whose process name mentions TPU/device
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            tot[ev["name"]] += ev.get("dur", 0.0)
            cnt[ev["name"]] += 1
    if not tot:
        print("process names seen:", pid_names)
        return
    total_ms = sum(tot.values()) / 1e3
    print(f"device total (3 iters): {total_ms:.1f} ms   target={target}")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:70]:
        print(f"{us/3e3:9.3f} ms  x{cnt[name]//3:<3} {name[:110]}")


if __name__ == "__main__":
    main()
