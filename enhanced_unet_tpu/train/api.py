"""Orchestration API: train_model / evaluate_model / train_and_evaluate.

Parity target: reference train_eval.py:1024-1543 — the same public entry
points, policy tables (epochs/batch/patience per model), every-3-epochs
validation gate, best-mIoU checkpointing and early stopping (patience after
epoch 25).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from enhanced_unet_tpu.config import TrainConfig, get_preset
from enhanced_unet_tpu.data.dataset import CellDataset
from enhanced_unet_tpu.data.loader import BatchLoader
from enhanced_unet_tpu.metrics.semantic import metrics_from_confusion
from enhanced_unet_tpu.models import get_model
from enhanced_unet_tpu.train.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)
from enhanced_unet_tpu.train.evaluator import Evaluator
from enhanced_unet_tpu.train.trainer import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _pad_shape(max_size: int) -> tuple:
    s = (max_size // 32) * 32
    return (s, s)


def _build_state(model_name: str, cfg: TrainConfig, steps_per_epoch: int,
                 pad_shape, dtype=jnp.bfloat16):
    kwargs = {}
    if model_name == "enhanced_unet":
        # thread the config switch to the model that implements the packed
        # s2d decoder (EnhancedUNet -> UNetPlusPlus); others have no knob
        kwargs["packed_decoder"] = cfg.model.packed_decoder
        if cfg.model.serving_preset == "optimized":
            # receipts-approved non-logit-exact serving options; the param
            # tree is unchanged, so exact-trained checkpoints load as-is
            from enhanced_unet_tpu.config import SERVING_OPTIMIZED_KWARGS

            kwargs.update(SERVING_OPTIMIZED_KWARGS["enhanced_unet"])
    model = get_model(model_name, dtype=dtype, **kwargs)
    return create_train_state(
        model,
        cfg,
        steps_per_epoch=max(steps_per_epoch, 1),
        rng=jax.random.key(cfg.seed),
        input_shape=(cfg.batch_size, *pad_shape, 3),
    )


def quick_val_miou(state, cfg: TrainConfig, loader, eval_step=None) -> Dict[str, float]:
    """Cheap on-device validation (argmax mIoU) — the fast alternative to the
    reference's full-Evaluator gate (train_eval.py:1119).  Pass a pre-jitted
    `eval_step` when calling repeatedly (train_model does) so the program
    compiles once per run instead of once per call."""
    if eval_step is None:
        eval_step = jax.jit(make_eval_step(cfg))
    cms = []
    for batch in loader:
        _, cm = eval_step(
            state, batch["images"], batch["semantic_masks"], batch["valid_mask"]
        )
        cms.append(np.asarray(cm[: batch["n_real"]]))
    if not cms:
        return {"sem_mean_iou": 0.0}
    total = np.concatenate(cms).sum(axis=0)
    return metrics_from_confusion(total)


def train_model(
    model_name: str,
    data_dir: str = "data",
    num_epochs: int = 50,
    skip_training: bool = False,
    resume: bool = False,
    checkpoint_dir: str = "checkpoints",
    max_size: int = 640,
    cfg: Optional[TrainConfig] = None,
    use_full_evaluator_gate: bool = True,
    dtype=jnp.bfloat16,
    num_devices: Optional[int] = None,
    pretrained_dir: Optional[str] = None,
    log=print,
) -> str:
    """Train one model with the reference's protocol; returns checkpoint path.

    Reference: train_eval.py:1036-1162.  `resume=True` continues an
    interrupted run from the last best checkpoint (epoch counter, optimizer
    state, history and best-mIoU gate all restored) — the framework's
    failure-recovery mechanism (the reference has none beyond
    skip_training, SURVEY §5).

    The every-3-epochs validation gate defaults to the reference's exact
    semantics: the FULL Evaluator (native-size CLAHE+sharpen, TTA,
    threshold cascade, host morphology — train_eval.py:1119-1135) selects
    the best checkpoint.  `use_full_evaluator_gate=False` swaps in a much
    faster on-device argmax-mIoU gate (quick_val_miou) for iteration speed.

    Multi-chip: `num_devices` (or cfg.num_devices) > 1 trains data-parallel
    over a 1-D Mesh('data') — global batches of batch_size*num_devices,
    shard_map pmean gradient reduction over ICI, replicated state,
    checkpoints written by process 0 only (parallel/data_parallel.py).
    """
    cfg = cfg or get_preset(model_name, num_epochs=num_epochs, data_dir=data_dir)
    n_dev = int(num_devices if num_devices is not None else cfg.num_devices)
    ckpt_path = os.path.join(checkpoint_dir, model_name, "best_model")
    last_path = os.path.join(checkpoint_dir, model_name, "last_model")
    os.makedirs(os.path.dirname(ckpt_path), exist_ok=True)

    if skip_training and checkpoint_exists(ckpt_path):
        log(f"Found trained checkpoint: {ckpt_path}; skipping training")
        return ckpt_path

    train_ds = CellDataset(data_dir, split="train", max_size=max_size)
    val_ds = CellDataset(data_dir, split="val", max_size=max_size)
    pad_shape = _pad_shape(max_size)
    # global batch = per-replica batch x mesh size (cfg.batch_size is
    # per-replica, matching the reference's single-device batch semantics).
    # Multi-host: each process loads global/process_count samples for its
    # own devices; make_global_batch assembles the global sharded arrays.
    pc = jax.process_count()
    global_batch = cfg.batch_size * n_dev
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} (batch_size {cfg.batch_size} x "
            f"num_devices {n_dev}) must be divisible by process_count {pc}"
        )
    train_loader = BatchLoader(
        train_ds, global_batch // pc, pad_shape, train=True, seed=cfg.seed,
        process_shard=(jax.process_index(), pc) if pc > 1 else None,
    )
    # the full Evaluator preprocesses each image itself at native size
    # (evaluator.py predict_semantic_mask), so its loader skips the padded
    # device preprocess; the quick gate uses the on-device enhance instead.
    # Gate batches ride cfg.batch_size: the full gate groups same-shape
    # images onto one device round-trip (Evaluator.evaluate; identical
    # metrics to the reference's bs-1 loop, pinned by test), the quick
    # gate's confusion-matrix sums are batch-size-invariant by definition.
    val_loader = BatchLoader(
        val_ds, cfg.batch_size, pad_shape, train=False,
        preprocess=not use_full_evaluator_gate,
    )

    steps_per_epoch = len(train_loader)
    state = _build_state(model_name, cfg, steps_per_epoch, pad_shape, dtype)
    if pretrained_dir and not resume:
        # ImageNet-pretrained encoder init, the reference's smp
        # encoder_weights="imagenet" default (models.py:255-275); see
        # convert/pretrained.py for the weight-file manifest
        from enhanced_unet_tpu.convert import (
            initialize_pretrained,
            required_weights,
        )

        if required_weights(model_name):
            state, imported = initialize_pretrained(
                state, model_name, weights_dir=pretrained_dir, log=log)
        else:
            log(f"{model_name} has no pretrained encoders "
                "(reference trains it from scratch); ignoring "
                f"--pretrained-dir")
    mesh = None
    shard_train_batch = None
    if n_dev > 1:
        from enhanced_unet_tpu.parallel import (
            make_dp_train_step,
            make_global_batch,
            make_mesh,
            replicate_state,
        )

        mesh = make_mesh(n_dev)
        train_step = make_dp_train_step(cfg, mesh)  # jitted + donated inside
        # single-process: device_put the global batch; multi-host: assemble
        # per-process local batches into global arrays
        shard_train_batch = lambda leaves: make_global_batch(leaves, mesh)  # noqa: E731
    else:
        train_step = jax.jit(make_train_step(cfg), donate_argnums=0)
    eval_step = None if use_full_evaluator_gate else jax.jit(make_eval_step(cfg))
    dropout_rng = jax.random.key(cfg.seed + 1)

    history = {
        "train_loss": [], "val_loss": [], "val_miou": [],
        "val_live_iou": [], "val_dead_iou": [], "val_dice": [],
        "learning_rate": [], "epoch_axis": [], "epoch_time_sec": [],
        "images_per_sec": [],
    }
    from enhanced_unet_tpu.train.schedule import reference_lr_schedule

    lr_table = reference_lr_schedule(
        cfg.optimizer.base_lr, cfg.num_epochs, cfg.warmup_epochs, cfg.cosine_t0,
        cfg.optimizer.t_mult, cfg.optimizer.eta_min,
        cfg.optimizer.warmup_start_factor,
    )

    best_miou, best_loss = 0.0, float("inf")
    patience_counter = 0
    start_epoch = 0

    if resume:
        # prefer the always-current last_model; fall back to best_model
        resume_from = (
            last_path if checkpoint_exists(last_path)
            else ckpt_path if checkpoint_exists(ckpt_path)
            else None
        )
        if resume_from:
            state, meta = load_checkpoint(resume_from, state)
            start_epoch = int(meta.get("epoch", 0))
            best_miou = float(meta.get("best_miou", 0.0))
            best_loss = float(meta.get("best_loss", float("inf")))
            saved_history = meta.get("history", {})
            for k in history:
                if k in saved_history:
                    history[k] = list(saved_history[k])
            log(f"Resuming from {resume_from} at epoch {start_epoch} "
                f"(best mIoU {best_miou:.4f})")

    if mesh is not None:
        state = replicate_state(state, mesh)  # after any resume restore

    def persist(path, *args):
        # multi-host: only the coordinator writes (state is replicated)
        if jax.process_index() == 0:
            save_checkpoint(path, *args)

    grad_probe = None  # lazily-jitted gradient-magnitude probe (grad flow)
    gate_evaluator = None  # one Evaluator reused across gate epochs

    epoch = start_epoch - 1  # stays if the budget is already exhausted
    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.perf_counter()
        # loss accumulates ON DEVICE: each step's scalar is added lazily so
        # the host never blocks mid-epoch (a per-step float() would serialize
        # dispatch against the accelerator); one fetch per epoch below
        epoch_loss, n_batches = jnp.zeros(()), 0
        last_batch = None
        for batch in train_loader:
            imgs, msks, vld = (
                batch["images"], batch["semantic_masks"], batch["valid_mask"]
            )
            if shard_train_batch is not None:
                imgs, msks, vld = shard_train_batch((imgs, msks, vld))
            state, m = train_step(state, imgs, msks, vld, dropout_rng)
            epoch_loss = epoch_loss + m["loss"]
            n_batches += 1
            last_batch = batch
        loss = float(epoch_loss) / max(n_batches, 1)  # the one host sync
        dt = time.perf_counter() - t0
        history["train_loss"].append(loss)
        history["learning_rate"].append(float(lr_table[epoch]))
        history["epoch_time_sec"].append(dt)
        history["images_per_sec"].append(
            n_batches * cfg.batch_size / dt if dt > 0 else 0.0
        )
        log(f"Epoch {epoch+1}/{cfg.num_epochs} loss={loss:.4f} "
            f"lr={lr_table[epoch]:.6f} ({dt:.1f}s)")

        # every-3-epochs validation gate (train_eval.py:1119-1135)
        if (epoch + 1) % cfg.eval_every_epochs == 0:
            if use_full_evaluator_gate:
                if gate_evaluator is None:
                    gate_evaluator = Evaluator(
                        state, model_name, enable_tta=cfg.enable_tta,
                        verbose=False,
                    )
                gate_evaluator.update_state(state)
                val = gate_evaluator.evaluate(val_loader)
            else:
                val = quick_val_miou(state, cfg, val_loader, eval_step)

            # gradient-flow probe on the last train batch (feeds
            # Visualizer.plot_gradient_flow — reference visualization.py:1567)
            if last_batch is not None:
                if grad_probe is None:
                    from enhanced_unet_tpu.ops.losses import combined_loss_with_aux

                    def _grad_fn(st, images, masks, valid):
                        def loss_fn(params):
                            (logits, aux), _ = st.apply_fn(
                                {"params": params,
                                 "batch_stats": st.batch_stats},
                                images, train=True, mutable=["batch_stats"],
                                rngs={"dropout": jax.random.key(0)},
                            )
                            return combined_loss_with_aux(
                                logits, aux, masks, cfg.loss, valid)

                        grads = jax.grad(loss_fn)(st.params)
                        return jax.tree.map(
                            lambda g: jnp.mean(jnp.abs(g)), grads)

                    grad_probe = jax.jit(_grad_fn)
                norms = grad_probe(
                    state, last_batch["images"],
                    last_batch["semantic_masks"], last_batch["valid_mask"],
                )
                flat, _ = jax.tree_util.tree_flatten_with_path(
                    jax.device_get(norms))
                history["grad_norms"] = {
                    jax.tree_util.keystr(p): float(v) for p, v in flat
                }
            val_iou = val.get("sem_mean_iou", 0.0)
            history["val_miou"].append(val_iou)
            history["val_live_iou"].append(val.get("sem_live_iou", 0.0))
            history["val_dead_iou"].append(val.get("sem_dead_iou", 0.0))
            history["val_dice"].append(
                [val.get("sem_live_dice", 0.0), val.get("sem_dead_dice", 0.0)]
            )
            history["val_loss"].append(loss)
            history["epoch_axis"].append(epoch + 1)
            log(f"  val mIoU={val_iou:.4f} live={val.get('sem_live_iou', 0):.4f} "
                f"dead={val.get('sem_dead_iou', 0):.4f}")

            if val_iou > best_miou:
                best_miou, best_loss = val_iou, loss
                patience_counter = 0
                persist(ckpt_path, state, epoch + 1, best_miou,
                                best_loss, history)
                log(f"  ✓ saved best (mIoU {best_miou:.4f})")
            else:
                patience_counter += 1

        # early stopping (train_eval.py:1157-1159)
        if patience_counter >= cfg.patience and epoch > cfg.early_stop_min_epoch:
            log(f"Early stopping at epoch {epoch+1}")
            break

    # always persist the final state for resume (best_model keeps the
    # reference's best-mIoU-gated semantics, train_eval.py:1138-1151)
    final_epoch = min(epoch + 1, cfg.num_epochs) if cfg.num_epochs else 0
    persist(last_path, state, final_epoch, best_miou, best_loss,
                    history)
    if not checkpoint_exists(ckpt_path):
        # never validated better than 0.0 — still persist the final state
        persist(ckpt_path, state, final_epoch, best_miou,
                        best_loss, history)
    return ckpt_path


def _collect_predictions(evaluator, loader, max_samples: int = 20):
    """Gather <=20 images + predictions + probs for the chart suite
    (reference train_eval.py:1245-1319)."""
    images, gts, preds, names, probs_all, comparison = [], [], [], [], [], []
    from enhanced_unet_tpu.postprocess import semantic_to_instances

    for batch in loader:
        for item in batch["batch_items"][: batch["n_real"]]:
            img = np.asarray(item["image"], np.float32)
            pred = evaluator.predict_semantic_mask(img)
            pm, pl, _ = semantic_to_instances(pred)
            p_live = sum(1 for l in pl if l == 0)
            p_dead = sum(1 for l in pl if l == 1)
            g_live = sum(1 for l in item["instance_labels"] if l == 0)
            g_dead = sum(1 for l in item["instance_labels"] if l == 1)
            p_tot, g_tot = p_live + p_dead, g_live + g_dead
            p_via = p_live / p_tot * 100 if p_tot else 0.0
            g_via = g_live / g_tot * 100 if g_tot else 0.0
            comparison.append(
                {
                    "filename": item["image_id"],
                    "gt_live_count": g_live, "gt_dead_count": g_dead,
                    "gt_total_count": g_tot, "gt_viability": g_via,
                    "pred_live_count": p_live, "pred_dead_count": p_dead,
                    "pred_total_count": p_tot, "pred_viability": p_via,
                    "live_error": p_live - g_live,
                    "dead_error": p_dead - g_dead,
                    "viability_error": p_via - g_via,
                }
            )
            images.append(img)
            gts.append(np.asarray(item["semantic_mask"]))
            preds.append(pred)
            probs_all.append(evaluator.predict_probs(img))
            names.append(item["image_id"])
            if len(images) >= max_samples:
                return images, gts, preds, names, probs_all, comparison
    return images, gts, preds, names, probs_all, comparison


def _emit_prediction_charts(visualizer, model_name, images, gts, preds, names,
                            probs_all, comparison, log=print,
                            data_dir="data"):
    """The ~19-figure suite evaluate emits (reference train_eval.py:1327-1525),
    each isolated so one figure's crash doesn't kill the rest."""
    charts = [
        lambda: visualizer.plot_sample_grid(images, gts, preds, model_name,
                                            names, data_dir=data_dir),
        lambda: visualizer.plot_confusion_matrix(gts, preds, model_name),
        lambda: visualizer.visualize_predictions(images, gts, preds, names, model_name),
        lambda: visualizer.plot_cell_statistics(gts, preds, model_name),
        lambda: visualizer.plot_per_image_metrics(gts, preds, model_name),
        lambda: visualizer.plot_sample_predictions_grid(images, gts, preds, names, model_name),
        lambda: visualizer.plot_error_analysis(gts, preds, model_name),
        lambda: visualizer.plot_class_distribution(gts, preds, model_name),
        lambda: visualizer.plot_feature_importance(gts, preds, images, model_name),
        lambda: visualizer.plot_roc_curves(probs_all, gts, model_name),
        lambda: visualizer.plot_pr_curves(probs_all, gts, model_name),
        lambda: visualizer.plot_boundary_accuracy(gts, preds, model_name),
        lambda: visualizer.plot_size_based_performance(gts, preds, model_name),
        lambda: visualizer.plot_calibration_curve(probs_all, gts, model_name),
        lambda: visualizer.create_paper_figures(images, gts, preds, model_name,
                                                names, data_dir=data_dir),
        lambda: visualizer.plot_cell_count_comparison(comparison, model_name),
    ]
    for fn in charts:
        try:
            fn()
        except Exception as e:  # reference isolates every figure
            log(f"  warning: figure generation failed: {e}")


def evaluate_model(
    model_name: str,
    data_dir: str = "data",
    checkpoint_path: Optional[str] = None,
    results_dir: str = "results",
    max_size: int = 640,
    cfg: Optional[TrainConfig] = None,
    dtype=jnp.bfloat16,
    generate_visualizations: bool = True,
    tiled: bool = False,
    tile: int = 512,
    overlap: int = 64,
    eval_batch_size: int = 1,
    log=print,
) -> Dict:
    """Evaluate one model on the val split (reference train_eval.py:1165-1543),
    writing results/<model>/<model>_results.json + the figure suite.

    tiled=True evaluates with full-resolution sliding-window inference
    (tile/overlap knobs) instead of whole-image forwards — the TPU-native
    alternative to the reference's downscale-to-640 (dataset.py:143-158).

    eval_batch_size>1 batches the device half of the eval pipeline
    (enhance->TTA->cascade) over same-shape image groups — identical
    results to the reference's per-image loop (train_eval.py:1180 bs=1),
    one device round-trip per group instead of per image."""
    cfg = cfg or get_preset(model_name, data_dir=data_dir)
    save_dir = os.path.join(results_dir, model_name)
    os.makedirs(save_dir, exist_ok=True)

    val_ds = CellDataset(data_dir, split="val", max_size=max_size)
    pad_shape = _pad_shape(max_size)
    val_loader = BatchLoader(val_ds, eval_batch_size, pad_shape, train=False,
                             preprocess=False)

    state = _build_state(model_name, cfg, 1, pad_shape, dtype)
    ckpt = checkpoint_path or os.path.join("checkpoints", model_name, "best_model")
    meta = {}
    if checkpoint_exists(ckpt):
        state, meta = load_checkpoint(ckpt, state)
        log(f"Loaded checkpoint {ckpt} (best mIoU {meta.get('best_miou', 0.0):.4f})")
    elif os.path.isfile(ckpt) and ckpt.endswith((".pth", ".pt")):
        # a reference torch checkpoint (train_eval.py:1188-1202): import the
        # encoder weights + training meta (convert/torch_import.py)
        from enhanced_unet_tpu.convert import load_torch_checkpoint

        state, report = load_torch_checkpoint(ckpt, state, model_name)
        meta = report["meta"]
        log(f"Imported torch checkpoint {ckpt}: encoders {report['imported']}"
            f" (skipped non-transferable: {report['skipped']})")
    else:
        log("WARNING: no checkpoint found; evaluating random init")

    evaluator = Evaluator(state, model_name, enable_tta=cfg.enable_tta,
                          tiled=tiled, tile=tile, overlap=overlap)
    results = evaluator.evaluate(val_loader)

    if generate_visualizations:
        from enhanced_unet_tpu.viz import Visualizer

        visualizer = Visualizer(save_dir=save_dir)
        history = meta.get("history", {})
        if history.get("train_loss"):
            n = len(history["train_loss"])
            live = history.get("val_live_iou", [])
            dead = history.get("val_dead_iou", [])
            dice = history.get("val_dice", [])
            plot_history = {
                "train_loss": history["train_loss"],
                "val_loss": history.get("val_loss", history["train_loss"]),
                "val_iou": [
                    [0.0, live[i] if i < len(live) else 0.0,
                     dead[i] if i < len(dead) else 0.0]
                    for i in range(n)
                ],
                "val_dice": [
                    ([0.0] + list(dice[i])) if i < len(dice) else [0.0, 0.0, 0.0]
                    for i in range(n)
                ],
            }
            try:
                visualizer.plot_training_curves(plot_history, model_name)
                visualizer.plot_class_wise_metrics(plot_history, model_name)
                if history.get("learning_rate"):
                    visualizer.plot_learning_rate_schedule(history, model_name)
                if history.get("grad_norms"):
                    visualizer.plot_gradient_flow(
                        history["grad_norms"], model_name)
            except Exception as e:
                log(f"  warning: history charts failed: {e}")

        log("Collecting predictions for visualization...")
        collected = _collect_predictions(evaluator, val_loader)
        if collected[0]:
            _emit_prediction_charts(visualizer, model_name, *collected,
                                    log=log, data_dir=data_dir)

    results_file = os.path.join(save_dir, f"{model_name}_results.json")
    with open(results_file, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=2, ensure_ascii=False)
    log(f"Results saved to {results_file}")
    return results


def visualize_model(
    model_name: str,
    data_dir: str = "data",
    checkpoint_dir: str = "checkpoints",
    checkpoint_path: Optional[str] = None,
    results_dir: str = "results",
    regenerate_predictions: bool = False,
    max_size: int = 640,
    max_samples: int = 20,
    cfg: Optional[TrainConfig] = None,
    dtype=jnp.bfloat16,
    log=print,
) -> Dict:
    """Standalone visualization mode (reference train_eval.py:1546-1801):
    replay training history from the checkpoint, reload saved results, and
    optionally regenerate prediction-based figures."""
    from enhanced_unet_tpu.viz import Visualizer

    cfg = cfg or get_preset(model_name, data_dir=data_dir)
    save_dir = os.path.join(results_dir, model_name)
    os.makedirs(save_dir, exist_ok=True)
    visualizer = Visualizer(save_dir=save_dir)

    # 1. training history from the checkpoint (train_eval.py:1566-1617)
    ckpt = checkpoint_path or os.path.join(checkpoint_dir, model_name, "best_model")
    history: Dict = {}
    if checkpoint_exists(ckpt):
        import json as _json

        with open(os.path.join(ckpt, "meta.json"), encoding="utf-8") as f:
            history = _json.load(f).get("history", {})
        if history.get("train_loss"):
            n = len(history["train_loss"])
            live = history.get("val_live_iou", [])
            dead = history.get("val_dead_iou", [])
            dice = history.get("val_dice", [])
            plot_history = {
                "train_loss": history["train_loss"],
                "val_loss": history.get("val_loss", history["train_loss"]),
                "val_iou": [
                    [0.0,
                     live[i] if i < len(live) else 0.0,
                     dead[i] if i < len(dead) else 0.0]
                    for i in range(n)
                ],
                "val_dice": [
                    ([0.0] + list(dice[i])) if i < len(dice) else [0.0, 0.0, 0.0]
                    for i in range(n)
                ],
            }
            visualizer.plot_training_curves(plot_history, model_name)
            visualizer.plot_class_wise_metrics(plot_history, model_name)
            visualizer.save_training_history_csv(history, model_name)
        if history.get("learning_rate"):
            visualizer.plot_learning_rate_schedule(history, model_name)
        if history.get("grad_norms"):
            visualizer.plot_gradient_flow(history["grad_norms"], model_name)
    else:
        log(f"No checkpoint found at {ckpt}")

    # 2. reload saved evaluation results (train_eval.py:1621-1630; the
    # reference parses the JSON and confirms the load — and so returns the
    # parsed dict to callers, which the log-only version here didn't)
    results_file = os.path.join(save_dir, f"{model_name}_results.json")
    results: Dict = {}
    if os.path.exists(results_file):
        log(f"Loading evaluation results: {results_file}")
        with open(results_file, encoding="utf-8") as f:
            results = json.load(f)
        log("Evaluation results loaded")
    else:
        log(f"No evaluation results file: {results_file}")

    # 3. regenerate prediction figures (train_eval.py:1632-1787)
    if regenerate_predictions and checkpoint_exists(ckpt):
        val_ds = CellDataset(data_dir, split="val", max_size=max_size)
        pad_shape = _pad_shape(max_size)
        loader = BatchLoader(val_ds, 1, pad_shape, train=False, preprocess=False)
        state = _build_state(model_name, cfg, 1, pad_shape, dtype)
        state, _ = load_checkpoint(ckpt, state)
        evaluator = Evaluator(state, model_name, enable_tta=cfg.enable_tta)

        collected = _collect_predictions(evaluator, loader, max_samples)
        if collected[0]:
            _emit_prediction_charts(visualizer, model_name, *collected,
                                    log=log, data_dir=data_dir)

    # 4. cross-model comparison from aggregated results (train_eval.py:1794-1799)
    Visualizer(save_dir=results_dir).plot_comprehensive_comparison_from_csv()
    return results


def predict_model(
    model_name: str,
    images_dir: str,
    checkpoint_path: Optional[str] = None,
    results_dir: str = "results",
    max_size: int = 640,
    cfg: Optional[TrainConfig] = None,
    dtype=jnp.bfloat16,
    tiled: bool = False,
    tile: int = 512,
    overlap: int = 64,
    batch_size: int = 8,
    log=print,
) -> Dict:
    """Label-free batch inference over a directory of images.

    The reference has no unlabeled serving path (its eval requires labelme
    JSON per image, dataset.py:173-195); this runs the full serving
    pipeline — enhance -> TTA -> threshold cascade -> instance extraction
    -> viability counting — on bare *.jpg/*.png files, batched per
    same-shape group, writing per-image mask PNGs + overlays and a
    predictions CSV (filename, live/dead counts, viability %).
    """
    import csv as _csv

    from PIL import Image

    from enhanced_unet_tpu.data.dataset import _resize_image, snap_to_multiple
    from enhanced_unet_tpu.postprocess import semantic_to_instances
    from enhanced_unet_tpu.viz.visualizer import CLASS_COLORS

    cfg = cfg or get_preset(model_name)
    save_dir = os.path.join(results_dir, model_name, "predictions")
    os.makedirs(save_dir, exist_ok=True)

    names = sorted(
        f for f in os.listdir(images_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if not names:
        raise ValueError(f"no images found in {images_dir}")

    pad_shape = _pad_shape(max_size)
    state = _build_state(model_name, cfg, 1, pad_shape, dtype)
    ckpt = checkpoint_path or os.path.join("checkpoints", model_name,
                                           "best_model")
    if checkpoint_exists(ckpt):
        state, _ = load_checkpoint(ckpt, state)
        log(f"loaded checkpoint {ckpt}")
    else:
        log(f"WARNING: no checkpoint at {ckpt}; predicting with random init")
    evaluator = Evaluator(state, model_name, enable_tta=cfg.enable_tta,
                          tiled=tiled, tile=tile, overlap=overlap,
                          verbose=False)

    # group by FINAL shape from the image headers alone (PIL reads sizes
    # lazily) so arbitrarily large directories stream: pixels are decoded
    # one chunk at a time and released after the chunk's artifacts write
    groups: Dict[tuple, list] = {}
    for name in names:
        with Image.open(os.path.join(images_dir, name)) as im:
            w0, h0 = im.size
        h, w = snap_to_multiple(h0, w0, max_size)
        groups.setdefault((h, w), []).append(name)

    def _decode(name: str, shape: tuple) -> np.ndarray:
        """Decode + reference resize policy (max side <= max_size, /32 snap)."""
        arr = np.asarray(
            Image.open(os.path.join(images_dir, name)).convert("RGB"))
        if shape != arr.shape[:2]:
            arr = _resize_image(arr, (shape[1], shape[0]))
        return arr.astype(np.float32) / 255.0

    results: Dict[str, dict] = {}
    for shape, group in groups.items():
        for i in range(0, len(group), batch_size):
            chunk = group[i:i + batch_size]
            imgs = [_decode(n, shape) for n in chunk]
            if tiled or len(chunk) == 1:
                masks = [np.asarray(evaluator.predict_semantic_mask(a))
                         for a in imgs]
            else:
                masks = [np.asarray(m) for m in
                         evaluator.predict_semantic_masks(np.stack(imgs))]
            # host half: instances, viability, artifacts — per chunk, so
            # pixel buffers die with this iteration
            for name, img, mask in zip(chunk, imgs, masks):
                inst_masks, inst_labels, _ = semantic_to_instances(mask)
                live = sum(1 for l in inst_labels if l == 0)
                dead = sum(1 for l in inst_labels if l == 1)
                viability = 100.0 * live / max(live + dead, 1)
                stem = os.path.splitext(name)[0]
                colored = CLASS_COLORS[np.clip(mask, 0, 2)]
                Image.fromarray((colored * 255).astype(np.uint8)).save(
                    os.path.join(save_dir, f"{stem}_mask.png"))
                overlay = np.clip(img * 0.5 + colored * 0.5, 0, 1)
                Image.fromarray((overlay * 255).astype(np.uint8)).save(
                    os.path.join(save_dir, f"{stem}_overlay.png"))
                results[name] = {
                    "filename": name,
                    "live_count": live,
                    "dead_count": dead,
                    "total_count": live + dead,
                    "viability_percent": round(viability, 2),
                    "live_pixels": int((mask == 1).sum()),
                    "dead_pixels": int((mask == 2).sum()),
                }
                log(f"{name}: live={live} dead={dead} "
                    f"viability={viability:.1f}%")

    rows = [results[name] for name in names]
    csv_path = os.path.join(save_dir, "predictions.csv")
    with open(csv_path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    log(f"predictions written to {save_dir}")
    return {"predictions": rows, "save_dir": save_dir}


def train_and_evaluate(
    model_name: str,
    data_dir: str = "data",
    num_epochs: int = 50,
    skip_training: bool = False,
    **kwargs,
) -> Dict:
    """train + evaluate (reference train_eval.py:1024-1033)."""
    ckpt = train_model(
        model_name, data_dir, num_epochs, skip_training=skip_training, **kwargs
    )
    return evaluate_model(model_name, data_dir, checkpoint_path=ckpt)
