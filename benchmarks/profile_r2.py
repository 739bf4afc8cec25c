"""Round-2 performance breakdown on real TPU hardware.

Times each component/variant with the fori_loop-chained protocol (the only
reliable timing over the axon relay — see bench.py) and reports ms/step,
img/s and MFU from XLA cost analysis.  Run configs serially in ONE process
so TPU jobs never contend.

Usage:  python benchmarks/profile_r2.py [config ...]
  (no args = all configs; each config is one compile, ~20-40s first time)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from enhanced_unet_tpu.models.enhanced_unet import (
    DeepLabV3Plus,
    EnhancedUNet,
    UNetPlusPlus,
)
from enhanced_unet_tpu.models.encoders import EfficientNetEncoder

# v5e peak; used only for the MFU column
PEAK_BF16_TFLOPS = 197.0


class _EncoderOnly(nn.Module):
    variant: str = "efficientnet-b5"
    max_stages: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = EfficientNetEncoder(variant=self.variant,
                                    max_stages=self.max_stages)(x, train)
        # touch every level so nothing is DCE'd
        return sum(f.mean(axis=(1, 2, 3)) for f in feats[1:])


class _DeepLabDecOnly(nn.Module):
    """DeepLab decoder alone: ASPP on a synthetic stride-32 feature +
    low-level fusion convs at stride 4 (input [N,16,16,512] for 512^2)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        from enhanced_unet_tpu.models.blocks import ASPP, ConvBNAct
        from enhanced_unet_tpu.ops.resize import resize_bilinear

        low = jnp.ones((x.shape[0], 128, 128, 40), jnp.bfloat16)
        y = ASPP(256, dtype=jnp.bfloat16)(x, train)
        low = ConvBNAct(48, (1, 1), dtype=jnp.bfloat16)(low, train)
        y = resize_bilinear(y, (128, 128)).astype(low.dtype)
        y = jnp.concatenate([y, low], axis=-1)
        y = ConvBNAct(256, dtype=jnp.bfloat16)(y, train)
        y = ConvBNAct(256, dtype=jnp.bfloat16)(y, train)
        logits = nn.Conv(3, (1, 1), dtype=jnp.bfloat16,
                         param_dtype=jnp.float32)(y)
        return resize_bilinear(logits.astype(jnp.float32), (512, 512))


class _FusionOnly(nn.Module):
    """The reference fusion stage alone (gate + head + residual) on a
    precomputed 6-channel logit map — isolates the full-res fusion cost."""

    @nn.compact
    def __call__(self, fused, train: bool = False):
        from enhanced_unet_tpu.models.blocks import ConvBNAct

        fc = fused.shape[-1]
        a = nn.Conv(fc // 2, (3, 3), padding="SAME", use_bias=False,
                    dtype=jnp.bfloat16, param_dtype=jnp.float32)(
            fused.astype(jnp.bfloat16))
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.bfloat16,
                         param_dtype=jnp.float32)(a)
        a = nn.gelu(a)
        a = nn.Conv(fc, (1, 1), use_bias=False, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)(a)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.bfloat16,
                         param_dtype=jnp.float32)(a)
        attention = nn.sigmoid(a.astype(jnp.float32))
        gated = fused * attention
        y = gated.astype(jnp.bfloat16)
        y = ConvBNAct(256, use_bias=False, dtype=jnp.bfloat16)(y, train)
        y = ConvBNAct(128, use_bias=False, dtype=jnp.bfloat16)(y, train)
        y = ConvBNAct(64, use_bias=False, dtype=jnp.bfloat16)(y, train)
        head = nn.Conv(3, (1, 1), dtype=jnp.bfloat16,
                       param_dtype=jnp.float32)(y).astype(jnp.float32)
        residual = nn.Conv(3, (1, 1), dtype=jnp.float32,
                           param_dtype=jnp.float32)(gated)
        return head + residual


def _first_leaf(out):
    return jax.tree.leaves(out)[0]


def time_forward(name, model, shape, steps=20, in_dtype=jnp.float32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape), in_dtype)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros(shape, in_dtype), train=False,
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fwd(params, stats, x):
        out = model.apply({"params": params, "batch_stats": stats}, x,
                          train=False)
        return _first_leaf(out)

    @jax.jit
    def run_n(params, stats, x, n):
        def body(i, carry):
            y = fwd(params, stats, x + carry * 0.0)
            return jnp.mean(y).astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))

    lowered = jax.jit(fwd).lower(params, stats, x)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    gflops = ca.get("flops", 0.0) / 1e9  # per forward (whole batch)

    _ = float(run_n(params, stats, x, 1))  # compile + sync
    t0 = time.perf_counter()
    _ = float(run_n(params, stats, x, steps))
    dt = time.perf_counter() - t0

    batch = shape[0]
    ms = dt / steps * 1e3
    ips = batch * steps / dt
    tf = gflops * steps / dt / 1e3
    mfu = tf / PEAK_BF16_TFLOPS * 100
    print(json.dumps({
        "config": name, "ms_per_step": round(ms, 2),
        "images_per_sec": round(ips, 1),
        "gflops_per_img": round(gflops / batch, 1),
        "tflops_per_sec": round(tf, 1), "mfu_pct": round(mfu, 1),
    }), flush=True)


def time_train(name, model_name, batch, size, steps=10, **model_kw):
    from enhanced_unet_tpu.config import get_preset
    from enhanced_unet_tpu.models import get_model
    from enhanced_unet_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    cfg = get_preset(model_name, num_epochs=50)
    model = get_model(model_name, dtype=jnp.bfloat16, **model_kw)
    state = create_train_state(
        model, cfg, steps_per_epoch=100, rng=jax.random.key(0),
        input_shape=(batch, size, size, 3),
    )
    x = jnp.asarray(rng.random((batch, size, size, 3)), jnp.float32)
    masks = jnp.asarray(rng.integers(0, 3, (batch, size, size)), jnp.int32)
    valid = jnp.ones((batch, size, size), bool)
    step = make_train_step(cfg)
    d_rng = jax.random.key(1)

    @jax.jit
    def run_n(state, n):
        def body(i, st):
            st, _ = step(st, x, masks, valid, d_rng)
            return st
        return jax.lax.fori_loop(0, n, body, state)

    state = run_n(state, 1)
    _ = float(jnp.sum(state.step))
    t0 = time.perf_counter()
    state = run_n(state, steps)
    _ = float(jnp.sum(state.step))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "config": name, "ms_per_step": round(dt / steps * 1e3, 2),
        "images_per_sec": round(batch * steps / dt, 1),
    }), flush=True)


CONFIGS = {}


def cfg(name):
    def reg(fn):
        CONFIGS[name] = fn
        return fn
    return reg


@cfg("full_b16")
def _(): time_forward("enhanced_unet b16 fusion1", EnhancedUNet(), (16, 512, 512, 3))

@cfg("full_b32")
def _(): time_forward("enhanced_unet b32 fusion1", EnhancedUNet(), (32, 512, 512, 3))

@cfg("full_b16_bf16in")
def _(): time_forward("enhanced_unet b16 bf16 input", EnhancedUNet(), (16, 512, 512, 3), in_dtype=jnp.bfloat16)

@cfg("unetpp_b16")
def _(): time_forward("unetpp branch b16", UNetPlusPlus(), (16, 512, 512, 3))

@cfg("unetpp_noscse_b16")
def _(): time_forward("unetpp branch b16 NO scSE", UNetPlusPlus(use_scse=False), (16, 512, 512, 3))

@cfg("deeplab_b16")
def _(): time_forward("deeplab branch b16", DeepLabV3Plus(), (16, 512, 512, 3))

@cfg("encoder_b5_b16")
def _(): time_forward("effnet-b5 encoder b16", _EncoderOnly("efficientnet-b5"), (16, 512, 512, 3))

@cfg("encoder_b5_s2_b16")
def _(): time_forward("effnet-b5 stages 0-1 (stride<=4)", _EncoderOnly("efficientnet-b5", 2), (16, 512, 512, 3))

@cfg("encoder_b5_s3_b16")
def _(): time_forward("effnet-b5 stages 0-2 (stride<=8)", _EncoderOnly("efficientnet-b5", 3), (16, 512, 512, 3))

@cfg("encoder_b4_b16")
def _(): time_forward("effnet-b4 encoder b16", _EncoderOnly("efficientnet-b4"), (16, 512, 512, 3))

@cfg("deeplab_dec_b16")
def _(): time_forward("deeplab decoder alone (ASPP@16^2 + convs@128^2)", _DeepLabDecOnly(), (16, 16, 16, 512))

@cfg("fusion_b16")
def _(): time_forward("fusion stage b16 (6ch full-res)", _FusionOnly(), (16, 512, 512, 6))

@cfg("train_b8")
def _(): time_train("enhanced_unet train b8", "enhanced_unet", 8, 512)

@cfg("train_b16_remat")
def _(): time_train("enhanced_unet train b16 remat", "enhanced_unet", 16, 512, remat=True)


def main():
    names = sys.argv[1:] or list(CONFIGS)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        try:
            CONFIGS[n]()
        except Exception as e:
            print(json.dumps({"config": n, "error": str(e)[:300]}), flush=True)




class _HeadOnly(nn.Module):
    """UNet++ final full-res block alone: up 256^2->512^2 + DoubleConv(16)
    + 3x3 logits conv (the un-benched tail of the branch)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        from enhanced_unet_tpu.models.blocks import DoubleConv
        from enhanced_unet_tpu.ops.resize import upsample2x_nearest

        y = upsample2x_nearest(x)
        y = DoubleConv(16, dtype=jnp.bfloat16)(y, train)
        logits = nn.Conv(3, (3, 3), padding="SAME", dtype=jnp.bfloat16,
                         param_dtype=jnp.float32)(y)
        return logits.astype(jnp.float32)


class _HeadOnlyS2D(nn.Module):
    """Same math in packed space: fused-up first conv (no upsample
    materialisation), zero-stuffed SAME convs, depth-to-space at the end."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        from enhanced_unet_tpu.ops import s2d as s2dops

        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (3, 3, 32, 16), jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (3, 3, 16, 16), jnp.float32)
        w3 = self.param("w3", nn.initializers.lecun_normal(),
                        (3, 3, 16, 3), jnp.float32)
        y = s2dops.conv3x3_s2d(
            None, None, up_input=x.astype(jnp.bfloat16),
            up_kernel=s2dops.fused_up_kernel(w1).astype(jnp.bfloat16))
        y = nn.relu(y)
        y = s2dops.conv3x3_s2d(
            y, s2dops.s2d_kernel_same(w2).astype(jnp.bfloat16))
        y = nn.relu(y)
        y = s2dops.conv3x3_s2d(
            y, s2dops.s2d_kernel_same(w3).astype(jnp.bfloat16))
        return s2dops.depth_to_space(y).astype(jnp.float32)


@cfg("headblock_b16")
def _(): time_forward("unetpp head block @512^2", _HeadOnly(), (16, 256, 256, 32))

@cfg("headblock_s2d_b16")
def _(): time_forward("unetpp head block s2d-packed", _HeadOnlyS2D(), (16, 256, 256, 32))

@cfg("unetpp_packed_b16")
def _(): time_forward("unetpp branch b16 PACKED row0+head", UNetPlusPlus(packed_decoder=True), (16, 512, 512, 3))

@cfg("unetpp_plain_b16")
def _(): time_forward("unetpp branch b16 plain decoder", UNetPlusPlus(packed_decoder=False), (16, 512, 512, 3))

@cfg("full_b16_packed")
def _(): time_forward("enhanced_unet b16 PACKED decoder", EnhancedUNet(), (16, 512, 512, 3))

@cfg("unetpp_nohead_b16")
def _():
    # ablation knob on the model: logits at stride 2 + bilinear x2 instead
    # of the full-res DoubleConv tail
    time_forward("unetpp NO full-res head", UNetPlusPlus(full_res_head=False),
                 (16, 512, 512, 3))

if __name__ == "__main__":
    main()
