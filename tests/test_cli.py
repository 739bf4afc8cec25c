"""CLI end-to-end: eval mode over the synthetic dataset, results artifacts.

Covers the reference's driver behaviors (main.py): per-model loop with crash
isolation, evaluation_results.{json,csv} aggregation with the Chinese CSV
schema, comparison figures.
"""

import csv
import json
import os

import numpy as np
import pytest

from synthdata import make_synthetic_dataset

from enhanced_unet_tpu.cli import CSV_COLUMNS, main, write_results_csv


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cells")
    make_synthetic_dataset(str(d), n_images=7, size=96)
    return str(d)


@pytest.mark.slow
def test_eval_mode_end_to_end(data_dir, tmp_path):
    results_dir = str(tmp_path / "results")
    rc = main(
        [
            "--mode", "eval",
            "--models", "unet_basic",
            "--data-dir", data_dir,
            "--results-dir", results_dir,
            "--checkpoint-dir", str(tmp_path / "ckpts"),
            "--max-size", "96",
            "--dtype", "float32",
        ]
    )
    assert rc == 0
    with open(os.path.join(results_dir, "evaluation_results.json")) as f:
        results = json.load(f)
    assert "unet_basic" in results
    assert np.isfinite(results["unet_basic"]["sem_mean_iou"])
    assert os.path.exists(os.path.join(results_dir, "evaluation_results.csv"))
    assert os.path.exists(
        os.path.join(results_dir, "unet_basic", "unet_basic_results.json")
    )
    # comparison figures got generated
    assert os.path.exists(os.path.join(results_dir, "model_comparison.png"))


def test_unknown_model_isolated(data_dir, tmp_path):
    """A crashing model must not kill the sweep (main.py:234-248)."""
    results_dir = str(tmp_path / "results")
    rc = main(
        [
            "--mode", "eval",
            "--models", "not_a_model",
            "--data-dir", data_dir,
            "--results-dir", results_dir,
            "--checkpoint-dir", str(tmp_path / "ckpts"),
            "--max-size", "96",
        ]
    )
    assert rc == 0
    with open(os.path.join(results_dir, "evaluation_results.json")) as f:
        results = json.load(f)
    assert results["not_a_model"]["sem_mean_iou"] == 0.0


def test_csv_schema_parity(tmp_path):
    """CSV columns match the reference byte-for-byte (main.py:256-276)."""
    path = str(tmp_path / "r.csv")
    write_results_csv({"m": {"sem_mean_iou": 0.5}}, path)
    with open(path, newline="", encoding="utf-8-sig") as f:
        header = next(csv.reader(f))
    assert header[0] == "模型"
    assert header == [c for c, _ in CSV_COLUMNS]
    assert "语义分割 mIoU" in header
    assert "细胞活力准确率" in header
