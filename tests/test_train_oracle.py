"""Training-convergence oracle: the jitted JAX training stack vs a torch
mirror running the reference's protocol (train_eval.py:66-353) from
IDENTICAL init on identical data.

This is the test that connects "every piece is unit-parity" to "training
converges the same" (VERDICT r2 #3, BASELINE.json north star: Dice within
0.5% of the PyTorch reference).  Both stacks run:
  AdamW(lr table, wd 1e-4, betas (0.9,0.999)) + grad-clip 1.0
  + warmup/cosine-restarts epoch-granular LR (train_eval.py:109-132)
  + combined Focal+Dice+Tversky loss (train_eval.py:28-197)
  + train-mode BatchNorm with running-stat updates
for several epochs over fixed batches (no augmentation — its RNG cannot be
matched across frameworks), then compare per-step losses and the final
eval-mode Dice against ground truth.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from enhanced_unet_tpu.config import get_preset
from enhanced_unet_tpu.metrics.semantic import calculate_semantic_metrics
from enhanced_unet_tpu.models import get_model
from enhanced_unet_tpu.train.schedule import reference_lr_schedule
from enhanced_unet_tpu.train.trainer import create_train_state, make_train_step

sys.path.insert(0, os.path.dirname(__file__))
from torch_mirror import (
    build_basic_unet_mirror,
    build_enhanced_unet_basic_mirror,
    torch_combined_loss,
)

pytestmark = pytest.mark.slow  # compile-heavy lane (see pyproject.toml)


def _make_data(n=4, size=32, seed=0):
    """Blob images with live/dead disks — structured enough to learn."""
    rng = np.random.default_rng(seed)
    images = np.zeros((n, size, size, 3), np.float32)
    masks = np.zeros((n, size, size), np.int64)
    yy, xx = np.mgrid[:size, :size]
    for i in range(n):
        img = 0.65 + 0.05 * np.sin(yy / 7.0) + rng.normal(0, 0.02, (size, size))
        img = np.stack([img] * 3, -1)
        for _ in range(3):
            cy, cx, r = rng.integers(6, size - 6), rng.integers(6, size - 6), rng.integers(3, 6)
            cls = int(rng.integers(1, 3))
            disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            img[disk] = 0.5 if cls == 1 else 0.35
            masks[i][disk] = cls
        images[i] = np.clip(img, 0, 1)
    return images, masks


@pytest.mark.parametrize("model_name,mirror_builder", [
    ("unet_basic", build_basic_unet_mirror),
    # the reference's non-smp flagship fallback: BasicUNet + residual
    # enhance head (models.py:304-314, 334-339) — a different gradient
    # structure through the head than plain BasicUNet
    ("enhanced_unet_basic", build_enhanced_unet_basic_mirror),
])
def test_training_matches_torch_reference_protocol(model_name, mirror_builder):
    num_epochs = 50  # enough steps for both stacks to CONVERGE on the tiny
    batch = 2        # set — the north-star comparison is at convergence
    images, masks = _make_data(n=4, size=32)
    n_batches = len(images) // batch
    steps_per_epoch = n_batches

    cfg = get_preset("unet", num_epochs=num_epochs,
                     overrides={"batch_size": batch})

    # ---- JAX stack -------------------------------------------------------
    model = get_model(model_name, dtype=jnp.float32)
    state = create_train_state(model, cfg, steps_per_epoch,
                               rng=jax.random.key(0),
                               input_shape=(batch, 32, 32, 3))
    init_params = jax.tree.map(np.asarray, state.params)
    init_stats = jax.tree.map(np.asarray, state.batch_stats)

    train_step = jax.jit(make_train_step(cfg))
    valid = jnp.ones((batch, 32, 32), bool)
    jax_losses = []
    d_rng = jax.random.key(1)  # BasicUNet has no dropout; unused entropy
    for _epoch in range(num_epochs):
        for b in range(n_batches):
            xb = jnp.asarray(images[b * batch:(b + 1) * batch])
            mb = jnp.asarray(masks[b * batch:(b + 1) * batch], jnp.int32)
            state, metrics = train_step(state, xb, mb, valid, d_rng)
            jax_losses.append(float(metrics["loss"]))

    # ---- torch stack (reference protocol) --------------------------------
    mirror = mirror_builder(init_params, init_stats)
    mirror.train()
    lr_table = reference_lr_schedule(
        cfg.optimizer.base_lr, cfg.num_epochs, cfg.warmup_epochs,
        cfg.cosine_t0, cfg.optimizer.t_mult, cfg.optimizer.eta_min,
        cfg.optimizer.warmup_start_factor,
    )
    opt = torch.optim.AdamW(mirror.parameters(), lr=lr_table[0],
                            betas=cfg.optimizer.betas,
                            weight_decay=cfg.optimizer.weight_decay)
    torch_losses = []
    for epoch in range(num_epochs):
        for g in opt.param_groups:  # epoch-granular LR (train_eval.py:1100-1111)
            g["lr"] = float(lr_table[epoch])
        for b in range(n_batches):
            xb = torch.from_numpy(
                np.transpose(images[b * batch:(b + 1) * batch], (0, 3, 1, 2))
            )
            mb = torch.from_numpy(masks[b * batch:(b + 1) * batch])
            opt.zero_grad()
            loss = torch_combined_loss(mirror(xb), mb, cfg.loss)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(mirror.parameters(),
                                           cfg.optimizer.grad_clip_norm)
            opt.step()
            torch_losses.append(float(loss))

    # ---- per-step losses track ------------------------------------------
    jl, tl = np.asarray(jax_losses), np.asarray(torch_losses)
    # step 0 computes the loss at identical weights: tight agreement
    np.testing.assert_allclose(jl[0], tl[0], rtol=1e-4)
    # steps 1-3 run through 1-3 optimizer updates: agreement here pins the
    # gradient + clip + AdamW + LR-schedule chain (a systematic mismatch
    # explodes immediately; fp32 non-associativity drifts only slowly)
    np.testing.assert_allclose(jl[:4], tl[:4], rtol=1e-2)
    # the chaotic mid-training tail may drift a few % step-to-step (fp32
    # non-associativity across frameworks) but both stacks must converge
    assert jl[-1] < 0.2 * jl[0] and tl[-1] < 0.2 * tl[0], (jl, tl)

    # ---- final eval-mode predictions + Dice vs GT ------------------------
    mirror.eval()
    with torch.no_grad():
        t_logits = mirror(torch.from_numpy(np.transpose(images, (0, 3, 1, 2))))
    t_pred = t_logits.argmax(1).numpy()
    j_logits, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(images), train=False,
    )
    j_pred = np.argmax(np.asarray(j_logits), axis=-1)

    def mean_dice(preds):
        vals = [calculate_semantic_metrics(p, g)["sem_mean_dice"]
                for p, g in zip(preds, masks)]
        return float(np.mean(vals))

    dj, dt = mean_dice(j_pred), mean_dice(t_pred)
    # north star: Dice within 0.5% (BASELINE.json)
    assert abs(dj - dt) <= 0.005, (dj, dt)
    # and the two stacks agree on the vast majority of pixels
    assert (j_pred == t_pred).mean() > 0.99
