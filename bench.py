"""Benchmark harness: flagship EnhancedUNet 512x512 throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec", "vs_baseline": N}

Baseline: the reference (whh1747012859/Enhanced-UNet) publishes no numbers
and cannot run here (no GPU, no segmentation_models_pytorch), so the
A100 PyTorch baseline below is an engineering estimate for the reference's
dual-branch model (UNet++/efficientnet-b5 + DeepLabV3+/efficientnet-b4,
~66M params) at 512x512 inference in fp32 on one A100, documented in
BASELINE.md.  vs_baseline = our images/sec / that estimate.

Env knobs: BENCH_BATCH (default 64), BENCH_SIZE (512), BENCH_STEPS (20),
BENCH_REPS (3 timed repetitions; the median is reported), BENCH_MODE
(infer|train|eval), BENCH_MODEL (enhanced_unet), BENCH_FUSION_STRIDE (1 =
exact reference fusion-head placement; 2 = the documented fast-fusion
variant).
"""

import json
import os
import time

# persistent compilation cache: repeat bench runs skip the XLA compile on
# standard TPU runtimes (ineffective under the axon remote-compile relay,
# which bypasses the local executable cache — measured; kept for real pods)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Estimated A100 PyTorch fp32 throughput of the reference EnhancedUNet at
# 512x512 (batch 8, no TTA).  See BASELINE.md for the rationale.
A100_REFERENCE_IPS = 55.0
# Training estimate: the reference trains at batch 2 with a per-sample
# Python loss loop of batch-1 kernels (train_eval.py:262-335) plus aux deep
# supervision; 12 img/s is a generous A100 fp32 estimate.
A100_REFERENCE_TRAIN_IPS = 12.0
# Serving-path estimate: the reference evaluates one image at a time with 5
# sequential batch-1 TTA forwards plus host-side CLAHE (train_eval.py:
# 380-453, 570-652); ~55/5.4 view-cost with no batching headroom ≈ 8 img/s
# on A100 fp32.  See BASELINE.md.
A100_REFERENCE_EVAL_IPS = 8.0


def main():
    # batch 64 is the measured throughput-optimal serving batch on v5e
    # (188.6 img/s vs 160.6 at 32 and 152.1 at 16; 96 OOMs at 18.9G of
    # 15.75G HBM) — reference fusion placement, round-2 packed decoder
    mode_default_batch = {"infer": "64", "train": "64", "eval": "16"}
    batch = int(os.environ.get(
        "BENCH_BATCH",
        mode_default_batch.get(os.environ.get("BENCH_MODE", "infer"), "64"),
    ))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    mode = os.environ.get("BENCH_MODE", "infer")
    model_name = os.environ.get("BENCH_MODEL", "enhanced_unet")

    from enhanced_unet_tpu.config import get_preset
    from enhanced_unet_tpu.models import get_model

    kwargs = {}
    fusion_stride = int(os.environ.get("BENCH_FUSION_STRIDE", "1"))
    if model_name == "enhanced_unet" and fusion_stride != 1:
        kwargs["fusion_stride"] = fusion_stride
    if model_name == "enhanced_unet" and os.environ.get("BENCH_REMAT") == "1":
        kwargs["remat"] = True
    model = get_model(model_name, dtype=jnp.bfloat16, **kwargs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, size, size, 3)), jnp.float32)
    from enhanced_unet_tpu.utils.init import init_variables

    variables = init_variables(
        model,
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, size, size, 3), jnp.float32),
    )

    # Timing protocol: N forwards chained through a lax.fori_loop inside ONE
    # jit, returning a scalar checksum fetched to the host.  On the
    # experimental axon relay, per-dispatch timing with block_until_ready
    # under-reports wildly (dispatch is pipelined and the block is not
    # honored); a single chained program with a scalar device->host fetch is
    # immune to both effects and costs one RTT total.
    if mode == "train":
        from enhanced_unet_tpu.train.trainer import create_train_state, make_train_step

        cfg = get_preset(model_name, num_epochs=50)
        state = create_train_state(
            model, cfg, steps_per_epoch=100, rng=jax.random.key(0),
            input_shape=(batch, size, size, 3),
        )
        masks = jnp.asarray(rng.integers(0, 3, (batch, size, size)), jnp.int32)
        valid = jnp.ones((batch, size, size), bool)
        train_step = make_train_step(cfg)
        d_rng = jax.random.key(1)

        @jax.jit
        def run_n(state, n):
            def body(i, st):
                st, m = train_step(st, x, masks, valid, d_rng)
                return st
            return jax.lax.fori_loop(0, n, body, state)

        state = run_n(state, 1)  # compile
        _ = float(jnp.sum(state.step))  # sync
        times = []
        for _rep in range(int(os.environ.get("BENCH_REPS", "3"))):
            t0 = time.perf_counter()
            state = run_n(state, steps)
            _ = float(jnp.sum(state.step))  # sync via scalar fetch
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        metric = f"{model_name}_{size}_train"
    elif mode == "eval":
        # the real serving path: enhance (CLAHE+sharpen) -> TTA (5 views,
        # enhanced_unet only, train_eval.py:570-652 semantics) -> threshold
        # cascade, batched end to end (Evaluator.predict_semantic_masks)
        from types import SimpleNamespace

        from enhanced_unet_tpu.train.evaluator import Evaluator

        state = SimpleNamespace(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
        )
        ev = Evaluator(state, model_name, verbose=False)

        @jax.jit
        def run_n(params, batch_stats, x, n):
            def body(i, carry):
                masks = ev._batch_pipeline(params, batch_stats, x + carry * 0.0)
                return jnp.mean(masks.astype(x.dtype))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))

        _ = float(run_n(state.params, state.batch_stats, x, 1))  # compile
        times = []
        for _rep in range(int(os.environ.get("BENCH_REPS", "3"))):
            t0 = time.perf_counter()
            checksum = float(run_n(state.params, state.batch_stats, x, steps))
            times.append(time.perf_counter() - t0)
            assert checksum == checksum, "NaN checksum"
        dt = float(np.median(times))
        metric = f"{model_name}_{size}_eval"
    else:
        params, batch_stats = variables["params"], variables.get("batch_stats", {})

        def fwd(params, batch_stats, x):
            logits, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            return logits

        @jax.jit
        def run_n(params, batch_stats, x, n):
            def body(i, carry):
                # data dependency chains iterations so nothing is elided
                logits = fwd(params, batch_stats, x + carry * 0.0)
                return jnp.mean(logits).astype(x.dtype)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))

        _ = float(run_n(params, batch_stats, x, 1))  # compile + sync
        times = []
        for _rep in range(int(os.environ.get("BENCH_REPS", "3"))):
            t0 = time.perf_counter()
            checksum = float(run_n(params, batch_stats, x, steps))
            times.append(time.perf_counter() - t0)
            assert checksum == checksum, "NaN checksum"
        dt = float(np.median(times))
        metric = f"{model_name}_{size}_infer"

    ips = batch * steps / dt
    baseline = {
        "train": A100_REFERENCE_TRAIN_IPS,
        "eval": A100_REFERENCE_EVAL_IPS,
    }.get(mode, A100_REFERENCE_IPS)
    print(json.dumps({
        "metric": f"{metric}_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / baseline, 3),
    }))


if __name__ == "__main__":
    main()
