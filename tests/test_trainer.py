"""Trainer engine unit tests: eval step confusion matrices, optimizer
construction, grad-norm probes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhanced_unet_tpu.config import get_preset
from enhanced_unet_tpu.metrics.semantic import metrics_from_confusion
from enhanced_unet_tpu.models import get_model
from enhanced_unet_tpu.train.trainer import (

    compute_grad_norms,
    create_train_state,
    make_eval_step,
    make_train_step,
    param_grad_norms,
)

pytestmark = pytest.mark.slow  # compile-heavy lane (see pyproject.toml)


@pytest.fixture(scope="module")
def state_and_cfg():
    cfg = get_preset("unet", num_epochs=4)
    model = get_model("unet_basic", dtype=jnp.float32)
    state = create_train_state(
        model, cfg, steps_per_epoch=2, rng=jax.random.key(0),
        input_shape=(2, 32, 32, 3),
    )
    return state, cfg


def test_eval_step_confusion_matches_numpy(state_and_cfg, rng):
    state, cfg = state_and_cfg
    images = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    masks = jnp.asarray(rng.integers(0, 3, (2, 32, 32)), jnp.int32)
    valid = np.ones((2, 32, 32), bool)
    valid[:, 24:, :] = False  # padded strip
    eval_step = jax.jit(make_eval_step(cfg))
    logits, cms = eval_step(state, images, masks, jnp.asarray(valid))

    pred = np.asarray(jnp.argmax(logits, -1))
    m = np.asarray(masks)
    for i in range(2):
        expected = np.zeros((3, 3), np.int64)
        for gt in range(3):
            for pr in range(3):
                expected[gt, pr] = int(
                    ((m[i] == gt) & (pred[i] == pr) & valid[i]).sum()
                )
        # padded pixels land at [0, 0]
        expected[0, 0] += int((~valid[i]).sum())
        np.testing.assert_array_equal(np.asarray(cms[i]), expected)

    # metrics derivable from the on-device matrices
    r = metrics_from_confusion(np.asarray(cms).sum(axis=0))
    assert 0.0 <= r["sem_mean_iou"] <= 1.0


def test_train_step_decreases_loss_over_steps(state_and_cfg, rng):
    state, cfg = state_and_cfg
    images = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    masks = jnp.asarray((np.asarray(images).mean(-1) > 0.5).astype(np.int32))
    valid = jnp.ones((2, 32, 32), bool)
    step = jax.jit(make_train_step(cfg))
    losses = []
    for _ in range(6):
        state, metrics = step(state, images, masks, valid, jax.random.key(1))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_grad_norm_probe(state_and_cfg, rng):
    state, cfg = state_and_cfg
    images = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    masks = jnp.zeros((1, 32, 32), jnp.int32)
    valid = jnp.ones((1, 32, 32), bool)
    norms = compute_grad_norms(state, images, masks, valid, cfg)
    assert len(norms) > 10
    assert all(np.isfinite(v) for v in norms.values())
    assert any(v > 0 for v in norms.values())


def test_param_grad_norms_paths(state_and_cfg):
    state, _ = state_and_cfg
    norms = param_grad_norms(state.params)
    assert any("DoubleConv_0" in k for k in norms)


def test_mu_dtype_bfloat16_halves_first_moment():
    """OptimizerConfig.mu_dtype=bfloat16 stores AdamW's mu in bf16 (HBM
    lever for larger train batches); params and nu stay fp32."""
    from enhanced_unet_tpu.train.trainer import make_optimizer

    cfg = get_preset("unet", num_epochs=4)
    cfg = dataclasses.replace(
        cfg, optimizer=dataclasses.replace(cfg.optimizer, mu_dtype="bfloat16"))
    tx = make_optimizer(cfg, steps_per_epoch=2)
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    opt_state = tx.init(params)
    adam_state = opt_state[1][0]  # chain(clip, adamw) -> adamw ScaleByAdam
    assert adam_state.mu["w"].dtype == jnp.bfloat16
    assert adam_state.nu["w"].dtype == jnp.float32
    # one update still produces fp32 updates
    grads = {"w": jnp.full((4, 4), 0.1, jnp.float32)}
    updates, _ = tx.update(grads, opt_state, params)
    assert updates["w"].dtype == jnp.float32
