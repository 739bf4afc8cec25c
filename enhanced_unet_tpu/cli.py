"""CLI driver.

Parity target: reference main.py:74-449 — same modes
(train / eval / train_eval / visualize), same flags (--models, --epochs,
--regenerate-predictions), per-model loop with crash isolation, results
aggregation into results/evaluation_results.{json,csv} (including the
reference's Chinese column headers for artifact parity, main.py:256-276),
and the comparison figure suite.
"""

from __future__ import annotations

import argparse
import json
import os
import traceback
from typing import Dict

ZERO_RESULTS = {
    "sem_mean_iou": 0.0, "sem_mean_dice": 0.0,
    "sem_live_iou": 0.0, "sem_live_dice": 0.0,
    "sem_dead_iou": 0.0, "sem_dead_dice": 0.0,
    "live_iou": 0.0, "live_precision": 0.0, "live_recall": 0.0,
    "dead_iou": 0.0, "dead_precision": 0.0, "dead_recall": 0.0,
    "viability_accuracy": 0.0, "bbox_mAP": 0.0, "segm_mAP": 0.0,
}

# reference CSV schema (main.py:256-276) — kept byte-compatible
CSV_COLUMNS = [
    ("模型", None),
    ("语义分割 mIoU", "sem_mean_iou"),
    ("语义分割 mDice", "sem_mean_dice"),
    ("语义分割-背景 IoU", "sem_background_iou"),
    ("语义分割-背景 Dice", "sem_background_dice"),
    ("语义分割-活细胞 IoU", "sem_live_iou"),
    ("语义分割-死细胞 IoU", "sem_dead_iou"),
    ("语义分割-活细胞 Dice", "sem_live_dice"),
    ("语义分割-死细胞 Dice", "sem_dead_dice"),
    ("实例分割-活细胞 IoU", "live_iou"),
    ("实例分割-死细胞 IoU", "dead_iou"),
    ("活细胞检测准确率 (Precision)", "live_precision"),
    ("死细胞检测准确率 (Precision)", "dead_precision"),
    ("活细胞召回率 (Recall)", "live_recall"),
    ("死细胞召回率 (Recall)", "dead_recall"),
    ("细胞活力准确率", "viability_accuracy"),
    ("bbox mAP", "bbox_mAP"),
    ("segm mAP", "segm_mAP"),
]


def write_results_csv(all_results: Dict[str, Dict], path: str) -> None:
    import csv

    with open(path, "w", newline="", encoding="utf-8-sig") as f:
        w = csv.writer(f)
        w.writerow([c for c, _ in CSV_COLUMNS])
        for model_name, r in all_results.items():
            w.writerow(
                [model_name]
                + [r.get(key, 0.0) for _, key in CSV_COLUMNS[1:]]
            )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Cell viability assessment (TPU-native Enhanced-UNet)"
    )
    parser.add_argument(
        "--mode", type=str, default="train_eval",
        choices=["train", "eval", "train_eval", "visualize", "predict",
                 "manifest"],
    )
    parser.add_argument("--regenerate-predictions", action="store_true")
    parser.add_argument(
        "--models", type=str, nargs="+",
        default=["segnet", "unet", "enhanced_unet", "fcn", "pspnet", "linknet"],
    )
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--data-dir", type=str, default="data")
    parser.add_argument("--results-dir", type=str, default="results")
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--max-size", type=int, default=640)
    parser.add_argument(
        "--dtype", type=str, default="bfloat16",
        choices=["bfloat16", "float32"],
    )
    parser.add_argument(
        "--num-devices", type=int, default=1,
        help="data-parallel chips in the Mesh('data') axis (training)",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="multi-host: call jax.distributed.initialize() (TPU pod slices "
             "auto-discover the coordinator from the environment)",
    )
    parser.add_argument(
        "--tiled", action="store_true",
        help="full-resolution sliding-window tiled inference during eval "
             "(the reference downscales large images instead, "
             "dataset.py:143-158)",
    )
    parser.add_argument("--tile", type=int, default=512)
    parser.add_argument("--overlap", type=int, default=64)
    parser.add_argument(
        "--eval-batch", type=int, default=1,
        help="batch the eval pipeline over same-shape image groups "
             "(1 = the reference's per-image loop; results identical)")
    parser.add_argument(
        "--serving-preset", choices=("exact", "optimized"), default="exact",
        help="eval/predict model placement: 'exact' reproduces the "
             "reference bit-for-bit-within-tolerance; 'optimized' stacks "
             "the receipts-approved non-logit-exact throughput options "
             "(config.SERVING_OPTIMIZED_KWARGS — same param tree, same "
             "checkpoints; measured quality delta in BASELINE.md)")
    parser.add_argument(
        "--pretrained-dir", type=str, default=None,
        help="directory of ImageNet encoder weight files (the exact "
             "upstream files smp downloads — see convert/pretrained.py "
             "WEIGHT_MANIFEST; `--mode manifest` prints them); used with "
             "--mode train to initialize encoders before training, "
             "reproducing the reference's encoder_weights='imagenet'")
    args = parser.parse_args(argv)

    if args.mode == "manifest":
        # print the weight-file manifest for the selected models and exit
        from enhanced_unet_tpu.convert import required_weights

        for model_name in args.models:
            entries = required_weights(model_name)
            if not entries:
                print(f"{model_name}: trains from scratch (no pretrained "
                      "encoders in the reference)")
            for variant, e in entries.items():
                print(f"{model_name}: {variant}  file={e['file']}  "
                      f"sha256[:8]={e['sha256_prefix']}\n  url={e['url']}")
        return 0

    if args.distributed:
        import jax

        jax.distributed.initialize()

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from enhanced_unet_tpu.train.api import (
        evaluate_model,
        train_model,
        visualize_model,
    )
    from enhanced_unet_tpu.viz import Visualizer

    os.makedirs(args.results_dir, exist_ok=True)
    os.makedirs(args.checkpoint_dir, exist_ok=True)

    print(f"mode: {args.mode}\nmodels: {args.models}\nepochs: {args.epochs}")

    def _serving_cfg(model_name):
        # eval/predict-time config carrying the serving preset; None keeps
        # the APIs' own default preset (identical for "exact")
        if args.serving_preset == "exact":
            return None
        import dataclasses

        from enhanced_unet_tpu.config import get_preset

        cfg = get_preset(model_name, data_dir=args.data_dir)
        return dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, serving_preset=args.serving_preset))

    all_results: Dict[str, Dict] = {}
    for model_name in args.models:
        try:
            print(f"\n{'=' * 60}\nProcessing: {model_name}\n{'=' * 60}")
            if args.mode == "visualize":
                visualize_model(
                    model_name,
                    data_dir=args.data_dir,
                    checkpoint_dir=args.checkpoint_dir,
                    results_dir=args.results_dir,
                    regenerate_predictions=args.regenerate_predictions,
                    max_size=args.max_size,
                    dtype=dtype,
                )
                results = dict(ZERO_RESULTS)
            elif args.mode == "predict":
                # label-free serving over bare images (no reference
                # equivalent: its eval requires labelme JSON per image)
                from enhanced_unet_tpu.train.api import predict_model

                predict_model(
                    model_name,
                    images_dir=args.data_dir,
                    results_dir=args.results_dir,
                    max_size=args.max_size,
                    cfg=_serving_cfg(model_name),
                    dtype=dtype,
                    tiled=args.tiled,
                    tile=args.tile,
                    overlap=args.overlap,
                    batch_size=max(args.eval_batch, 1),
                )
                results = dict(ZERO_RESULTS)
            else:
                checkpoint_path = None
                if args.mode in ("train", "train_eval"):
                    checkpoint_path = train_model(
                        model_name,
                        data_dir=args.data_dir,
                        num_epochs=args.epochs,
                        checkpoint_dir=args.checkpoint_dir,
                        max_size=args.max_size,
                        dtype=dtype,
                        num_devices=args.num_devices,
                        pretrained_dir=args.pretrained_dir,
                    )
                if args.mode in ("eval", "train_eval"):
                    results = evaluate_model(
                        model_name,
                        data_dir=args.data_dir,
                        checkpoint_path=checkpoint_path,
                        results_dir=args.results_dir,
                        max_size=args.max_size,
                        cfg=_serving_cfg(model_name),
                        dtype=dtype,
                        tiled=args.tiled,
                        tile=args.tile,
                        overlap=args.overlap,
                        eval_batch_size=args.eval_batch,
                    )
                else:
                    results = dict(ZERO_RESULTS)
            all_results[model_name] = results

            print(f"\n{model_name} results:")
            for k in ("sem_mean_iou", "sem_mean_dice", "live_iou", "dead_iou",
                      "live_precision", "dead_precision", "viability_accuracy",
                      "bbox_mAP", "segm_mAP"):
                print(f"  {k}: {results.get(k, 0.0):.4f}")
        except Exception as e:
            print(f"Model {model_name} failed: {e}")
            traceback.print_exc()
            all_results[model_name] = dict(ZERO_RESULTS)

    # aggregate artifacts (main.py:251-279)
    with open(
        os.path.join(args.results_dir, "evaluation_results.json"),
        "w",
        encoding="utf-8",
    ) as f:
        json.dump(all_results, f, indent=2, ensure_ascii=False)
    write_results_csv(
        all_results, os.path.join(args.results_dir, "evaluation_results.csv")
    )

    # comparison figures (main.py:282-320)
    try:
        visualizer = Visualizer(save_dir=args.results_dir)
        visualizer.plot_comprehensive_comparison(all_results)
        visualizer.plot_model_comparison(all_results)
    except Exception as e:
        print(f"comparison visualization failed: {e}")
        traceback.print_exc()

    print("\nAll models processed; results in", args.results_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
