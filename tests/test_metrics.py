"""Unit tests for the metrics layer against hand-computed values and the
reference's documented conventions (metrics.py)."""

import numpy as np
import pytest

from enhanced_unet_tpu.metrics import (
    calculate_dice,
    calculate_instance_metrics,
    calculate_iou,
    calculate_semantic_metrics,
    calculate_viability_metrics,
    metrics_from_confusion,
    semantic_confusion_matrix,
)


class TestBinaryIoUDice:
    def test_identical(self):
        m = np.array([[1, 0], [1, 1]], dtype=np.uint8)
        assert calculate_iou(m, m) == 1.0
        assert calculate_dice(m, m) == 1.0

    def test_disjoint(self):
        a = np.array([[1, 0], [0, 0]], dtype=np.uint8)
        b = np.array([[0, 0], [0, 1]], dtype=np.uint8)
        assert calculate_iou(a, b) == 0.0
        assert calculate_dice(a, b) == 0.0

    def test_partial(self):
        a = np.array([[1, 1], [0, 0]], dtype=np.uint8)
        b = np.array([[1, 0], [1, 0]], dtype=np.uint8)
        # intersection 1, union 3
        assert calculate_iou(a, b) == pytest.approx(1 / 3)
        assert calculate_dice(a, b) == pytest.approx(2 * 1 / 4)

    def test_empty_convention(self):
        z = np.zeros((4, 4), dtype=np.uint8)
        # reference: union == 0 -> 1.0 (metrics.py:16-17)
        assert calculate_iou(z, z) == 1.0
        assert calculate_dice(z, z) == 1.0


class TestSemanticMetrics:
    def test_perfect(self):
        m = np.array([[0, 1], [2, 0]])
        r = calculate_semantic_metrics(m, m)
        for k in ("sem_background_iou", "sem_live_iou", "sem_dead_iou"):
            assert r[k] == 1.0
        assert r["sem_mean_iou"] == 1.0
        assert r["sem_mean_iou_all"] == 1.0
        assert r["sem_mean_dice"] == 1.0

    def test_hand_computed(self):
        gt = np.array([[0, 1, 1], [2, 2, 0]])
        pred = np.array([[0, 1, 0], [2, 0, 0]])
        r = calculate_semantic_metrics(pred, gt)
        # live: inter 1, union 2 -> 0.5; dice 2/3
        assert r["sem_live_iou"] == pytest.approx(0.5)
        assert r["sem_live_dice"] == pytest.approx(2 / 3)
        # dead: inter 1, union 2 -> 0.5
        assert r["sem_dead_iou"] == pytest.approx(0.5)
        # bg: pred {00,02,11,12}, gt {00,12}; inter {00,12}=2, union 4
        assert r["sem_background_iou"] == pytest.approx(0.5)
        assert r["sem_mean_iou"] == pytest.approx(0.5)
        assert r["sem_mean_iou_all"] == pytest.approx(0.5)

    def test_missing_class_convention(self):
        gt = np.zeros((3, 3), dtype=np.int32)
        pred = np.zeros((3, 3), dtype=np.int32)
        r = calculate_semantic_metrics(pred, gt)
        # live/dead absent from both -> IoU 1.0 by the union==0 convention
        assert r["sem_live_iou"] == 1.0
        assert r["sem_dead_iou"] == 1.0

    def test_confusion_matrix_path_matches_naive(self, rng):
        gt = rng.integers(0, 3, size=(37, 53))
        pred = rng.integers(0, 3, size=(37, 53))
        r_cm = calculate_semantic_metrics(pred, gt)
        # naive per-class computation
        for c, name in enumerate(("background", "live", "dead")):
            iou = calculate_iou(pred == c, gt == c)
            dice = calculate_dice(pred == c, gt == c)
            assert r_cm[f"sem_{name}_iou"] == pytest.approx(iou)
            assert r_cm[f"sem_{name}_dice"] == pytest.approx(dice)

    def test_confusion_matrix_counts(self):
        gt = np.array([[0, 1], [2, 1]])
        pred = np.array([[1, 1], [2, 0]])
        cm = np.asarray(semantic_confusion_matrix(pred, gt))
        assert cm[0, 1] == 1  # gt bg predicted live
        assert cm[1, 1] == 1
        assert cm[1, 0] == 1
        assert cm[2, 2] == 1
        assert cm.sum() == 4


class TestInstanceMetrics:
    def _disk(self, h, w, cy, cx, r):
        yy, xx = np.mgrid[:h, :w]
        return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)

    def test_perfect_match(self):
        m1 = self._disk(32, 32, 8, 8, 4)
        m2 = self._disk(32, 32, 24, 24, 4)
        r = calculate_instance_metrics(
            [m1, m2], [0, 1], [0.9, 0.8], [m1, m2], [0, 1]
        )
        assert r["live_iou"] == 1.0
        assert r["live_precision"] == 1.0
        assert r["live_recall"] == 1.0
        assert r["live_ap"] == 1.0
        assert r["dead_iou"] == 1.0

    def test_greedy_score_order(self):
        gt = self._disk(32, 32, 16, 16, 5)
        good = self._disk(32, 32, 16, 16, 5)
        partial = self._disk(32, 32, 16, 18, 5)
        # higher-scored partial claims the GT first -> good pred unmatched
        r = calculate_instance_metrics(
            [good, partial], [0, 0], [0.5, 0.9], [gt], [0]
        )
        assert r["live_recall"] == 1.0
        assert r["live_precision"] == 0.5

    def test_no_predictions(self):
        gt = self._disk(16, 16, 8, 8, 3)
        r = calculate_instance_metrics([], [], [], [gt], [0])
        assert r["live_iou"] == 0.0
        assert r["live_precision"] == 0.0
        assert r["live_recall"] == 0.0

    def test_no_gt_leaves_zero_defaults(self):
        pred = self._disk(16, 16, 8, 8, 3)
        r = calculate_instance_metrics([pred], [0], [0.9], [], [])
        # reference: class block only runs when GT present (metrics.py:88)
        assert r["live_iou"] == 0.0
        assert r["live_precision"] == 0.0

    def test_below_threshold_fallback_mean_iou(self):
        gt = self._disk(64, 64, 16, 16, 6)
        far = self._disk(64, 64, 48, 48, 6)  # IoU 0 with GT
        r = calculate_instance_metrics([far], [0], [0.9], [gt], [0])
        # no match, all-pred mean best IoU is 0
        assert r["live_iou"] == 0.0
        assert r["live_precision"] == 0.0
        # overlapping but below 0.05 cannot be built with disks easily;
        # test the fallback via tiny overlap masks
        a = np.zeros((10, 100), np.uint8)
        a[0, :50] = 1
        b = np.zeros((10, 100), np.uint8)
        b[0, 49:] = 1  # IoU = 1/100 < 0.05
        r = calculate_instance_metrics([a], [0], [0.9], [b], [0])
        assert r["live_precision"] == 0.0
        assert r["live_iou"] == pytest.approx(1 / 100)

    def test_matched_gt_not_reused(self):
        gt = self._disk(32, 32, 16, 16, 5)
        p1 = self._disk(32, 32, 16, 16, 5)
        p2 = self._disk(32, 32, 16, 16, 5)
        r = calculate_instance_metrics([p1, p2], [0, 0], [0.9, 0.8], [gt], [0])
        assert r["live_precision"] == 0.5  # second pred has no GT left
        assert r["live_recall"] == 1.0


class TestViability:
    def test_basic(self):
        r = calculate_viability_metrics(8, 2, 7, 3)
        assert r["pred_viability"] == pytest.approx(0.8)
        assert r["gt_viability"] == pytest.approx(0.7)
        assert r["viability_accuracy"] == pytest.approx(0.9)

    def test_empty_gt(self):
        assert calculate_viability_metrics(0, 0, 0, 0)["viability_accuracy"] == 1.0
        assert calculate_viability_metrics(1, 0, 0, 0)["viability_accuracy"] == 0.0

    def test_empty_pred(self):
        r = calculate_viability_metrics(0, 0, 5, 5)
        assert r["pred_viability"] == 0.0
        assert r["viability_accuracy"] == pytest.approx(0.5)
