"""Quality-delta receipt for the "optimized" serving preset.

The optimized preset (config.SERVING_OPTIMIZED_KWARGS) trades logit
exactness for throughput — fusion_stride=2 runs the fusion head on
2x-downsampled branch logits (126.4 vs 110.5 img/s at b64/512^2 on v5e,
round-4 receipt).  This script measures what that costs in output quality
on a FIXED checkpoint: it trains the dual-branch flagship (efficientnet-
tiny pairing; the fusion stage under test is the full-size one) briefly on
the synthetic dataset, then evaluates both placements on the val split
with the SAME parameters and reports per-class Dice vs GT plus the
mask agreement between the two placements.

Run (CPU, ~10 min single core):
    JAX_PLATFORMS=cpu python benchmarks/serving_preset_delta.py
Numbers are recorded in BASELINE.md ("serving preset" variant lines).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np


def main():
    from synthdata import make_synthetic_dataset

    from enhanced_unet_tpu.config import SERVING_OPTIMIZED_KWARGS, get_preset
    from enhanced_unet_tpu.data.dataset import CellDataset
    from enhanced_unet_tpu.data.loader import BatchLoader
    from enhanced_unet_tpu.metrics.semantic import calculate_semantic_metrics
    from enhanced_unet_tpu.models import get_model
    from enhanced_unet_tpu.train.evaluator import Evaluator
    from enhanced_unet_tpu.train.trainer import create_train_state, make_train_step

    size = 96
    tmp = tempfile.mkdtemp(prefix="preset_delta_")
    make_synthetic_dataset(tmp, n_images=8, size=size)

    cfg = get_preset("enhanced_unet", num_epochs=4, data_dir=tmp)
    cfg = dataclasses.replace(cfg, batch_size=2)
    kw = dict(encoder_names=("efficientnet-tiny", "efficientnet-tiny"),
              dtype=jnp.float32)
    model_exact = get_model("enhanced_unet", **kw)
    model_opt = get_model("enhanced_unet",
                          **{**kw, **SERVING_OPTIMIZED_KWARGS["enhanced_unet"]})

    state = create_train_state(model_exact, cfg, steps_per_epoch=4,
                               rng=jax.random.key(0),
                               input_shape=(2, size, size, 3))
    ds = CellDataset(tmp, split="train", max_size=size)
    loader = BatchLoader(ds, 2, (size, size), train=True, seed=0)
    step = jax.jit(make_train_step(cfg))
    n_steps = 0
    for _epoch in range(2):
        for batch in loader:
            state, metrics = step(state, batch["images"],
                                  batch["semantic_masks"],
                                  batch["valid_mask"], jax.random.key(n_steps))
            n_steps += 1
    print(f"trained {n_steps} steps; final loss "
          f"{float(metrics['loss']):.4f}", flush=True)

    val = CellDataset(tmp, split="val", max_size=size)
    val_loader = BatchLoader(val, 1, (size, size), train=False,
                             preprocess=False)

    def run(model):
        st = state.replace(apply_fn=model.apply)
        ev = Evaluator(st, "enhanced_unet", enable_tta=True, verbose=False)
        dices, masks = [], []
        for batch in val_loader:
            for item in batch["batch_items"][: batch["n_real"]]:
                m = ev.predict_semantic_mask(np.asarray(item["image"],
                                                        np.float32))
                sm = calculate_semantic_metrics(
                    m, np.asarray(item["semantic_mask"]))
                dices.append(sm["sem_mean_dice"])
                masks.append(m)
        return float(np.mean(dices)), masks

    dice_exact, masks_exact = run(model_exact)
    dice_opt, masks_opt = run(model_opt)
    agree = float(np.mean([
        (a == b).mean() for a, b in zip(masks_exact, masks_opt)]))
    print(f"exact placement:     sem_mean_dice = {dice_exact:.4f}")
    print(f"optimized placement: sem_mean_dice = {dice_opt:.4f}")
    print(f"dice delta = {dice_opt - dice_exact:+.4f} "
          f"({(dice_opt - dice_exact) / max(dice_exact, 1e-9) * 100:+.2f}%)")
    print(f"pixel agreement between placements = {agree:.4f}")


if __name__ == "__main__":
    main()
