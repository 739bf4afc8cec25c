"""The "optimized" serving preset (config.SERVING_OPTIMIZED_KWARGS):
non-logit-exact throughput options behind one named config.

Receipts: fusion_stride=2 measured 126.4 vs 110.5 img/s (b64, 512^2,
v5e, round 4); quality delta measured by
benchmarks/serving_preset_delta.py (numbers in BASELINE.md).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhanced_unet_tpu.config import SERVING_OPTIMIZED_KWARGS, get_preset

pytestmark = pytest.mark.slow  # flagship compiles (CPU lane)


def test_optimized_preset_shares_param_tree():
    """One checkpoint serves both placements: the optimized model's param
    tree is identical to the exact model's, and the exact-init variables
    apply cleanly through the optimized placement."""
    from enhanced_unet_tpu.models import get_model

    kw = dict(encoder_names=("efficientnet-tiny", "efficientnet-tiny"),
              dtype=jnp.float32)
    exact = get_model("enhanced_unet", **kw)
    opt = get_model("enhanced_unet",
                    **{**kw, **SERVING_OPTIMIZED_KWARGS["enhanced_unet"]})
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3))
    v_exact = exact.init({"params": jax.random.key(1)}, x, False)
    v_opt = opt.init({"params": jax.random.key(1)}, x, False)
    pa = [jax.tree_util.keystr(p)
          for p, _ in jax.tree_util.tree_leaves_with_path(v_exact)]
    pb = [jax.tree_util.keystr(p)
          for p, _ in jax.tree_util.tree_leaves_with_path(v_opt)]
    assert pa == pb

    ref, _ = exact.apply(v_exact, x, False)
    got, _ = opt.apply(v_exact, x, False)
    assert got.shape == ref.shape
    # same signal, coarser head grid: outputs correlate but are NOT equal
    assert not np.allclose(np.asarray(got), np.asarray(ref))


def test_build_state_applies_serving_preset(monkeypatch):
    """api._build_state threads cfg.model.serving_preset into the model
    (tiny encoders substituted so the CPU init stays cheap)."""
    import enhanced_unet_tpu.train.api as api

    captured = {}
    real_get_model = api.get_model

    def fake_get_model(name, **kw):
        captured.update(kw)
        return real_get_model(
            name,
            **{**kw,
               "encoder_names": ("efficientnet-tiny", "efficientnet-tiny")})

    monkeypatch.setattr(api, "get_model", fake_get_model)
    cfg = get_preset("enhanced_unet")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, serving_preset="optimized"),
        batch_size=1,
    )
    state = api._build_state("enhanced_unet", cfg, 1, (64, 64), jnp.float32)
    assert captured.get("fusion_stride") == 2
    assert state.apply_fn.__self__.fusion_stride == 2
