"""Jitted training engine.

Parity target: reference Trainer (train_eval.py:63-353) — AdamW(lr table,
wd 1e-4, betas (0.9, 0.999)) + warmup/cosine-restarts stepping + grad-clip
1.0 + the combined loss with optional deep supervision.

TPU-first differences from the reference's loop:
- ONE jitted `train_step` per batch: forward, fused loss, backward and
  optimizer update compile into a single XLA program (the reference runs a
  Python per-sample loss loop with batch-of-1 kernels, train_eval.py:262-335
  — mathematically identical, see ops/losses.py).
- donated state: params/opt_state buffers are reused in-place, halving HBM
  traffic per step.
- static shapes: batches are padded to one shape by the loader, so the step
  compiles once.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from enhanced_unet_tpu.config import TrainConfig
from enhanced_unet_tpu.metrics.semantic import batched_confusion_matrix
from enhanced_unet_tpu.ops.losses import combined_loss_with_aux
from enhanced_unet_tpu.train.schedule import make_lr_fn, reference_lr_schedule


class TrainState(struct.PyTreeNode):
    """Model + optimizer state carried across steps (a pytree)."""

    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    apply_fn: Any = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """clip-by-global-norm(1.0) -> AdamW with the reference's epoch-granular
    warmup+cosine-restarts LR table."""
    lr_table = reference_lr_schedule(
        base_lr=cfg.optimizer.base_lr,
        total_epochs=cfg.num_epochs,
        warmup_epochs=cfg.warmup_epochs,
        t0=cfg.cosine_t0,
        t_mult=cfg.optimizer.t_mult,
        eta_min=cfg.optimizer.eta_min,
        start_factor=cfg.optimizer.warmup_start_factor,
    )
    lr_fn = make_lr_fn(lr_table, steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(cfg.optimizer.grad_clip_norm),
        optax.adamw(
            learning_rate=lr_fn,
            b1=cfg.optimizer.betas[0],
            b2=cfg.optimizer.betas[1],
            weight_decay=cfg.optimizer.weight_decay,
            mu_dtype=jnp.dtype(cfg.optimizer.mu_dtype),
        ),
    )


def create_train_state(
    model,
    cfg: TrainConfig,
    steps_per_epoch: int,
    rng: jax.Array,
    input_shape: Tuple[int, int, int, int],
) -> TrainState:
    p_rng, d_rng = jax.random.split(rng)
    dummy = jnp.zeros(input_shape, jnp.float32)
    from enhanced_unet_tpu.utils.init import init_variables

    variables = init_variables(model, {"params": p_rng, "dropout": d_rng}, dummy)
    tx = make_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def make_train_step(cfg: TrainConfig, axis_name: Optional[str] = None):
    """Build the jitted train step.

    When `axis_name` is set (shard_map data parallelism) gradients/metrics
    are pmean-reduced across replicas and the updated BatchNorm running
    statistics are averaged so every replica checkpoints identical state.
    Per-step normalization stays per-replica — exactly the reference's
    unsynced-BN-at-batch-2 semantics (train_eval.py:1059).
    """
    loss_cfg = cfg.loss

    def train_step(
        state: TrainState,
        images: jnp.ndarray,        # [B,H,W,3] float32 0..1
        masks: jnp.ndarray,         # [B,H,W] int32
        valid: jnp.ndarray,         # [B,H,W] bool
        dropout_rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        dropout_rng = jax.random.fold_in(dropout_rng, state.step)
        if axis_name is not None:
            # distinct dropout/stochastic-depth patterns per replica
            dropout_rng = jax.random.fold_in(
                dropout_rng, jax.lax.axis_index(axis_name)
            )

        def loss_fn(params):
            (logits, aux), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            loss = combined_loss_with_aux(logits, aux, masks, loss_cfg, valid)
            return loss, (mutated["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {"loss": loss}
        return new_state, metrics

    return train_step


def param_grad_norms(grads) -> Dict[str, float]:
    """{param_path: mean |grad|} for Visualizer.plot_gradient_flow — the
    TPU-native stand-in for the reference's module-hook gradient inspection
    (visualization.py:1567-1600)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    return {
        jax.tree_util.keystr(path): float(jnp.mean(jnp.abs(leaf)))
        for path, leaf in flat
    }


def compute_grad_norms(state: TrainState, images, masks, valid,
                       cfg: TrainConfig) -> Dict[str, float]:
    """One-off gradient magnitude probe on a batch (diagnostics only)."""
    def loss_fn(params):
        (logits, aux), _ = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)},
        )
        return combined_loss_with_aux(logits, aux, masks, cfg.loss, valid)

    grads = jax.grad(loss_fn)(state.params)
    return param_grad_norms(grads)


def make_eval_step(cfg: TrainConfig):
    """Jitted eval forward: logits + per-image confusion matrices on-device.

    Thresholding beyond argmax (the heuristic cascade) runs in the full
    Evaluator; this step powers the cheap every-3-epochs val mIoU gate
    (train_eval.py:1119-1135).
    """

    def eval_step(state: TrainState, images, masks, valid):
        logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # padded pixels: force pred == mask == 0 so they land on the
        # background diagonal — cell-class IoU (the mIoU gate) stays exact
        pred = jnp.where(valid, pred, 0)
        masks = jnp.where(valid, masks, 0)
        cms = batched_confusion_matrix(pred, masks)
        return logits, cms

    return eval_step
