"""Full evaluation pipeline.

Parity target: reference Evaluator (train_eval.py:356-1021):
- inference preprocess (CLAHE + sharpen) — on-device (ops.preprocess)
- TTA forwards for enhanced_unet (ops.tta)
- heuristic prob->mask conversion (ops.thresholding)
- semantic metrics (metrics.semantic)
- instance extraction (postprocess.instances, host)
- instance metrics / COCO RLE annotations / viability (metrics.*)

The device portion (preprocess -> 5 TTA forwards -> threshold cascade) is
one jit per input shape; only the final int mask crosses to the host for
the morphology stage.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from enhanced_unet_tpu.config import TrainConfig
from enhanced_unet_tpu.data.rle import encode_rle, mask_to_bbox
from enhanced_unet_tpu.metrics.coco import calculate_coco_metrics
from enhanced_unet_tpu.metrics.instance import calculate_instance_metrics
from enhanced_unet_tpu.metrics.semantic import calculate_semantic_metrics
from enhanced_unet_tpu.metrics.viability import calculate_viability_metrics
from enhanced_unet_tpu.ops.preprocess import eval_preprocess
from enhanced_unet_tpu.ops.thresholding import convert_probs_to_mask
from enhanced_unet_tpu.ops.tta import run_model_single, tta_probs

_METRIC_KEYS = (
    "sem_mean_iou", "sem_mean_dice",
    "sem_background_iou", "sem_background_dice",
    "sem_live_iou", "sem_live_dice", "sem_dead_iou", "sem_dead_dice",
    "live_iou", "live_precision", "live_recall", "live_ap",
    "dead_iou", "dead_precision", "dead_recall", "dead_ap",
    "bbox_mAP", "segm_mAP",
    "viability_accuracy", "pred_viability", "gt_viability",
    "pred_live_count", "pred_dead_count", "gt_live_count", "gt_dead_count",
)


class Evaluator:
    """Evaluate a trained state over a dataset, reference-metric-complete."""

    def __init__(self, state, model_name: str, enable_tta: Optional[bool] = None,
                 verbose: bool = True):
        self.state = state
        self.model_name = model_name
        self.verbose = verbose
        # TTA iff enhanced_unet (train_eval.py:363)
        self.enable_tta = (
            (model_name == "enhanced_unet") if enable_tta is None else enable_tta
        )

        def apply_fn(x):
            logits, _ = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                x,
                train=False,
            )
            return logits

        self._apply = apply_fn
        self._predict_jit = {}

    def predict_semantic_mask(self, image01: np.ndarray) -> np.ndarray:
        """image01: [H,W,3] float in [0,1] -> int mask [H,W].

        Mirrors train_eval.py:570-652: every model family gets the
        CLAHE+sharpen enhance; enhanced_unet additionally runs TTA.
        """
        shape = image01.shape
        if shape not in self._predict_jit:

            def pipeline(img):
                enhanced = eval_preprocess(img * 255.0) / 255.0
                probs = tta_probs(self._apply, enhanced, self.enable_tta)
                return convert_probs_to_mask(probs)

            self._predict_jit[shape] = jax.jit(pipeline)
        return np.asarray(self._predict_jit[shape](jnp.asarray(image01, jnp.float32)))

    def predict_probs(self, image01: np.ndarray) -> np.ndarray:
        """Raw softmax probabilities (no enhance/TTA) for ROC/PR plots
        (train_eval.py:1291-1306)."""
        return np.asarray(
            run_model_single(self._apply, jnp.asarray(image01, jnp.float32))
        )

    def evaluate(self, loader) -> Dict:
        """Aggregate the full reference metric dict over a BatchLoader
        (train_eval.py:852-1021)."""
        from enhanced_unet_tpu.postprocess import semantic_to_instances

        all_metrics: Dict[str, List[float]] = {k: [] for k in _METRIC_KEYS}
        all_pred_annotations: List[Dict] = []
        all_gt_annotations: List[Dict] = []
        image_counter = 0

        for batch in loader:
            for i, item in enumerate(batch["batch_items"][: batch["n_real"]]):
                image01 = np.asarray(item["image"], np.float32)
                gt_instance_masks = item["instance_masks"]
                gt_instance_labels = item["instance_labels"]
                gt_semantic = np.asarray(item["semantic_mask"])

                img_id = image_counter
                image_counter += 1

                pred_semantic = self.predict_semantic_mask(image01)

                for k, v in calculate_semantic_metrics(
                    pred_semantic, gt_semantic
                ).items():
                    if k in all_metrics:
                        all_metrics[k].append(v)

                pred_masks, pred_labels, pred_scores = semantic_to_instances(
                    pred_semantic
                )

                # first-3-image diagnostics (reference train_eval.py:921-937)
                if self.verbose and image_counter <= 3:
                    p_live = sum(1 for l in pred_labels if l == 0)
                    p_dead = sum(1 for l in pred_labels if l == 1)
                    g_live = sum(1 for l in gt_instance_labels if l == 0)
                    g_dead = sum(1 for l in gt_instance_labels if l == 1)
                    live_px = int((pred_semantic == 1).sum())
                    dead_px = int((pred_semantic == 2).sum())
                    print(
                        f"[debug] image {image_counter} "
                        f"({item.get('image_id', 'unknown')}): "
                        f"live_px={live_px} dead_px={dead_px} "
                        f"pred live/dead={p_live}/{p_dead} "
                        f"gt live/dead={g_live}/{g_dead}"
                    )
                    if live_px > 0 and p_live == 0:
                        print(f"  WARNING: {live_px} live pixels but no "
                              "live instances detected")
                    if dead_px > 0 and p_dead == 0:
                        print(f"  WARNING: {dead_px} dead pixels but no "
                              "dead instances detected")

                for k, v in calculate_instance_metrics(
                    pred_masks, pred_labels, pred_scores,
                    gt_instance_masks, gt_instance_labels,
                ).items():
                    if k in all_metrics:
                        all_metrics[k].append(v)

                for mask, label, score in zip(pred_masks, pred_labels, pred_scores):
                    all_pred_annotations.append(
                        {
                            "image_id": img_id,
                            "category_id": int(label),
                            "bbox": mask_to_bbox(mask),
                            "segmentation": encode_rle(mask),
                            "score": float(score),
                            "area": int(mask.sum()),
                        }
                    )
                for mask, label in zip(gt_instance_masks, gt_instance_labels):
                    all_gt_annotations.append(
                        {
                            "image_id": img_id,
                            "category_id": int(label),
                            "bbox": mask_to_bbox(mask),
                            "segmentation": encode_rle(mask),
                            "area": int(np.asarray(mask).sum()),
                            "iscrowd": 0,
                        }
                    )

                pred_live = sum(1 for l in pred_labels if l == 0)
                pred_dead = sum(1 for l in pred_labels if l == 1)
                gt_live = sum(1 for l in gt_instance_labels if l == 0)
                gt_dead = sum(1 for l in gt_instance_labels if l == 1)
                for k, v in calculate_viability_metrics(
                    pred_live, pred_dead, gt_live, gt_dead
                ).items():
                    if k in all_metrics:
                        all_metrics[k].append(v)

        if all_pred_annotations and all_gt_annotations:
            coco = calculate_coco_metrics(all_pred_annotations, all_gt_annotations)
            all_metrics["bbox_mAP"] = [coco["bbox_mAP"]]
            all_metrics["segm_mAP"] = [coco["segm_mAP"]]

        return {
            k: (float(np.mean(v)) if v else 0.0) for k, v in all_metrics.items()
        }
