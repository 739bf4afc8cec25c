"""End-to-end smoke: synthetic 2-class dataset through train -> eval with
the orchestration API (SURVEY §4e), on CPU with a tiny BasicUNet."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from synthdata import make_synthetic_dataset

from enhanced_unet_tpu.config import get_preset
from enhanced_unet_tpu.train.api import evaluate_model, train_model

pytestmark = pytest.mark.slow  # compile-heavy lane (see pyproject.toml)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cells")
    # 6 images -> train 4 / val 0 (int(6*0.15)=0)... need >=7 for val>=1
    make_synthetic_dataset(str(d), n_images=7, size=96)
    return str(d)


def test_train_eval_roundtrip(data_dir, tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    results_dir = str(tmp_path / "results")
    cfg = get_preset("unet", num_epochs=3, data_dir=data_dir)
    import dataclasses

    cfg = dataclasses.replace(cfg, num_epochs=3, eval_every_epochs=3)

    ckpt = train_model(
        "unet_basic",
        data_dir=data_dir,
        num_epochs=3,
        checkpoint_dir=ckpt_dir,
        max_size=96,
        cfg=cfg,
        dtype=jnp.float32,
        log=lambda *a: None,
    )
    assert os.path.exists(os.path.join(ckpt, "meta.json"))

    results = evaluate_model(
        "unet_basic",
        data_dir=data_dir,
        checkpoint_path=ckpt,
        results_dir=results_dir,
        max_size=96,
        cfg=cfg,
        dtype=jnp.float32,
        log=lambda *a: None,
    )
    # the full reference metric surface is present
    for key in (
        "sem_mean_iou", "sem_mean_dice", "sem_live_iou", "sem_dead_iou",
        "live_iou", "live_precision", "live_recall",
        "dead_iou", "dead_precision", "dead_recall",
        "bbox_mAP", "segm_mAP", "viability_accuracy",
    ):
        assert key in results, key
        assert np.isfinite(results[key]), key
    # results JSON persisted with the reference's layout
    out = os.path.join(results_dir, "unet_basic", "unet_basic_results.json")
    assert os.path.exists(out)
    # the per-eval figure inventory emitted through the PRODUCT path
    # (train_eval.py:1327-1525's ~19 visualizer calls): every expected
    # figure must land on disk — wiring regressions in
    # _emit_prediction_charts died silently inside its per-chart guards
    save_dir = os.path.join(results_dir, "unet_basic")
    emitted = set(os.listdir(save_dir))
    for base in (
        "unet_basic_sample_grid", "unet_basic_confusion_matrix",
        "unet_basic_predictions", "unet_basic_cell_statistics",
        "unet_basic_per_image_metrics", "unet_basic_error_analysis",
        "unet_basic_class_distribution", "unet_basic_spatial_analysis",
        "unet_basic_roc_curves", "unet_basic_pr_curves",
        "unet_basic_boundary_accuracy", "unet_basic_size_performance",
        "unet_basic_calibration", "unet_basic_paper_fig1_comparison",
        "unet_basic_paper_fig2_overlay", "unet_basic_paper_fig3_errors",
        "unet_basic_paper_fig4_detailed",
        "unet_basic_cell_count_comparison", "unet_basic_training_curves",
        "unet_basic_class_wise_metrics",
    ):
        assert f"{base}.png" in emitted, base


def test_resume_continues_from_checkpoint(data_dir, tmp_path):
    """Interrupted-run recovery: resume restores epoch/best/history."""
    import json

    ckpt_dir = str(tmp_path / "ckr")
    cfg = get_preset("unet", num_epochs=2, data_dir=data_dir)
    import dataclasses

    cfg2 = dataclasses.replace(cfg, num_epochs=2, eval_every_epochs=1)
    kwargs = dict(
        data_dir=data_dir, checkpoint_dir=ckpt_dir, max_size=96,
        dtype=jnp.float32, log=lambda *a: None,
    )
    p1 = train_model("unet_basic", num_epochs=2, cfg=cfg2, **kwargs)
    last = os.path.join(os.path.dirname(p1), "last_model")
    with open(os.path.join(last, "meta.json")) as f:
        meta1 = json.load(f)
    assert meta1["epoch"] == 2
    n_epochs_1 = len(meta1["history"]["train_loss"])
    assert n_epochs_1 == 2

    # resume with a larger budget: must continue, not restart
    cfg4 = dataclasses.replace(cfg, num_epochs=4, eval_every_epochs=1)
    train_model("unet_basic", num_epochs=4, cfg=cfg4, resume=True, **kwargs)
    with open(os.path.join(last, "meta.json")) as f:
        meta2 = json.load(f)
    assert meta2["epoch"] == 4
    n_epochs_2 = len(meta2["history"]["train_loss"])
    assert n_epochs_2 == 4
    # earlier history preserved as a prefix
    assert meta2["history"]["train_loss"][:n_epochs_1] == pytest.approx(
        meta1["history"]["train_loss"]
    )


def test_skip_training_reuses_checkpoint(data_dir, tmp_path):
    ckpt_dir = str(tmp_path / "ck2")
    cfg = get_preset("unet", num_epochs=1, data_dir=data_dir)
    import dataclasses

    cfg = dataclasses.replace(cfg, num_epochs=1, eval_every_epochs=1)
    kwargs = dict(
        data_dir=data_dir, num_epochs=1, checkpoint_dir=ckpt_dir,
        max_size=96, cfg=cfg, dtype=jnp.float32, log=lambda *a: None,
    )
    p1 = train_model("unet_basic", **kwargs)
    mtime = os.path.getmtime(os.path.join(p1, "meta.json"))
    p2 = train_model("unet_basic", skip_training=True, **kwargs)
    assert p1 == p2
    assert os.path.getmtime(os.path.join(p2, "meta.json")) == mtime
