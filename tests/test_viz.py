"""Visualizer smoke tests: every chart generator runs and writes PNG+SVG."""

import os

import numpy as np
import pytest

from enhanced_unet_tpu.viz import Visualizer


@pytest.fixture
def viz_inputs(rng):
    n, h, w = 3, 48, 48
    images = [rng.random((h, w, 3)).astype(np.float32) for _ in range(n)]
    gts, preds, probs = [], [], []
    for _ in range(n):
        gt = np.zeros((h, w), np.int32)
        gt[5:15, 5:15] = 1
        gt[30:40, 30:40] = 2
        pred = gt.copy()
        pred[5:10, 5:8] = 0  # some FN
        pred[20:24, 20:24] = 1  # some FP
        gts.append(gt)
        preds.append(pred)
        p = rng.random((h, w, 3)).astype(np.float32)
        probs.append(p / p.sum(-1, keepdims=True))
    names = [f"img_{i}.jpg" for i in range(n)]
    return images, gts, preds, probs, names


@pytest.fixture
def history():
    return {
        "train_loss": [3.0, 2.0, 1.5, 1.2],
        "val_loss": [3.1, 2.2, 1.7, 1.4],
        "val_iou": [[0.2, 0.1, 0.05], [0.4, 0.3, 0.2], [0.5, 0.4, 0.3],
                    [0.6, 0.5, 0.4]],
        "val_dice": [[0.3, 0.2, 0.1], [0.5, 0.4, 0.3], [0.6, 0.5, 0.4],
                     [0.7, 0.6, 0.5]],
        "learning_rate": [1e-4, 1e-3, 8e-4, 5e-4],
    }


def _files(d):
    return {f for f in os.listdir(d)}


def test_all_single_model_charts(tmp_path, viz_inputs, history):
    images, gts, preds, probs, names = viz_inputs
    v = Visualizer(save_dir=str(tmp_path))
    m = "testmodel"
    v.plot_training_curves(history, m)
    v.plot_learning_rate_schedule(history, m)
    v.plot_class_wise_metrics(history, m)
    v.save_training_history_csv(history, m)
    v.plot_gradient_flow({"enc1/kernel": 1e-3, "dec1/kernel": 2e-4}, m)
    v.plot_sample_grid(images, gts, preds, m, filenames=names)
    v.plot_sample_predictions_grid(images, gts, preds, names, m)
    v.visualize_predictions(images, gts, preds, names, m)
    v.plot_confusion_matrix(gts, preds, m)
    v.plot_cell_statistics(gts, preds, m)
    v.plot_per_image_metrics(gts, preds, m)
    v.plot_error_analysis(gts, preds, m)
    v.plot_class_distribution(gts, preds, m)
    v.plot_feature_importance(gts, preds, images, m)
    v.plot_roc_curves(probs, gts, m)
    v.plot_pr_curves(probs, gts, m)
    v.plot_calibration_curve(probs, gts, m)
    v.plot_boundary_accuracy(gts, preds, m)
    v.plot_size_based_performance(gts, preds, m)
    v.create_paper_figures(images, gts, preds, m, filenames=names)
    v.plot_cell_count_comparison(
        [
            {
                "filename": "a.jpg", "gt_live_count": 5, "gt_dead_count": 2,
                "gt_total_count": 7, "gt_viability": 71.4,
                "pred_live_count": 4, "pred_dead_count": 3,
                "pred_total_count": 7, "pred_viability": 57.1,
                "live_error": -1, "dead_error": 1, "viability_error": -14.3,
            }
        ],
        m,
    )
    files = _files(tmp_path)
    expected = [
        f"{m}_training_curves", f"{m}_learning_rate", f"{m}_class_wise_metrics",
        f"{m}_gradient_flow", f"{m}_sample_grid", f"{m}_predictions",
        f"{m}_confusion_matrix", f"{m}_cell_statistics",
        f"{m}_per_image_metrics", f"{m}_error_analysis",
        f"{m}_class_distribution", f"{m}_spatial_analysis",
        f"{m}_roc_curves", f"{m}_pr_curves", f"{m}_calibration",
        f"{m}_boundary_accuracy", f"{m}_size_performance",
        f"{m}_paper_fig1_comparison", f"{m}_paper_fig2_overlay",
        f"{m}_paper_fig3_errors", f"{m}_paper_fig4_detailed",
        f"{m}_cell_count_comparison",
    ]
    # exact-set inventory check against the reference's emitted files for
    # one eval run (visualization.py _save_figure sites; the live
    # plot_learning_rate_schedule at 1546 emits `_learning_rate` — the
    # `_lr_schedule` def at 1252 is shadowed/dead; plot_sample_predictions_
    # grid reuses the `_sample_grid` filename as in the reference)
    expected_files = (
        {f"{b}.png" for b in expected}
        | {f"{b}.svg" for b in expected}
        | {f"{m}_training_history.csv", f"{m}_cell_count_comparison.csv"}
    )
    assert files == expected_files, (
        f"missing: {sorted(expected_files - files)}; "
        f"extra: {sorted(files - expected_files)}"
    )


def test_comparison_suite(tmp_path):
    v = Visualizer(save_dir=str(tmp_path))
    results = {
        name: {
            "sem_mean_iou": 0.5 + i * 0.05, "sem_mean_dice": 0.6 + i * 0.05,
            "sem_background_iou": 0.9, "sem_background_dice": 0.95,
            "sem_live_iou": 0.5, "sem_live_dice": 0.6,
            "sem_dead_iou": 0.4, "sem_dead_dice": 0.5,
            "live_iou": 0.45, "dead_iou": 0.35,
            "live_precision": 0.7, "dead_precision": 0.6,
            "live_recall": 0.65, "dead_recall": 0.55,
            "viability_accuracy": 0.9, "bbox_mAP": 0.3, "segm_mAP": 0.28,
        }
        for i, name in enumerate(("unet", "enhanced_unet"))
    }
    v.plot_model_comparison(results)
    v.plot_comprehensive_comparison(results)
    files = _files(tmp_path)
    for base in (
        "model_comparison", "comparison_overall_metrics",
        "comparison_class_iou", "comparison_class_dice", "comparison_radar",
        "comparison_heatmap", "comparison_boxplot", "comparison_stacked",
        "comparison_scatter", "comparison_ranking", "comparison_composite",
        "comparison_balance", "comparison_table",
    ):
        assert f"{base}.png" in files, base

    # from-json entry point
    import json

    with open(os.path.join(tmp_path, "evaluation_results.json"), "w") as f:
        json.dump(results, f)
    assert v.plot_comprehensive_comparison_from_csv() is True


def test_comparison_from_chinese_csv(tmp_path):
    """CSV fallback path reads the CLI's Chinese-header schema."""
    from enhanced_unet_tpu.cli import write_results_csv

    results = {
        "unet": {"sem_mean_iou": 0.52, "sem_mean_dice": 0.6,
                 "viability_accuracy": 0.9, "bbox_mAP": 0.3, "segm_mAP": 0.2,
                 "sem_live_iou": 0.5, "sem_dead_iou": 0.4,
                 "live_precision": 0.7, "dead_precision": 0.6},
    }
    write_results_csv(results, str(tmp_path / "evaluation_results.csv"))
    v = Visualizer(save_dir=str(tmp_path))
    assert v.plot_comprehensive_comparison_from_csv() is True
    assert os.path.exists(tmp_path / "comparison_overall_metrics.png")


def test_comparison_no_artifacts_returns_false(tmp_path):
    v = Visualizer(save_dir=str(tmp_path))
    assert v.plot_comprehensive_comparison_from_csv() is False
