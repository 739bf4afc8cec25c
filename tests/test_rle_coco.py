"""RLE codec round-trip tests + COCO mAP sanity tests.

pycocotools is unavailable here, so the codec is validated by round-trip and
by known-good encodings; the COCO evaluator by hand-checkable scenarios.
"""

import numpy as np
import pytest

from enhanced_unet_tpu.data.rle import (
    decode_rle,
    encode_rle,
    mask_to_bbox,
    rle_area,
    rle_from_string,
    rle_to_string,
)
from enhanced_unet_tpu.metrics.coco import calculate_coco_metrics


class TestRLE:
    def test_roundtrip_random(self, rng):
        for _ in range(10):
            mask = (rng.random((23, 31)) > 0.6).astype(np.uint8)
            rle = encode_rle(mask)
            np.testing.assert_array_equal(decode_rle(rle), mask)

    def test_roundtrip_empty_and_full(self):
        for mask in (np.zeros((8, 8), np.uint8), np.ones((8, 8), np.uint8)):
            np.testing.assert_array_equal(decode_rle(encode_rle(mask)), mask)

    def test_fortran_order(self):
        # single pixel at row 1, col 0 of a 3x2 mask -> column-major offset 1
        mask = np.zeros((3, 2), np.uint8)
        mask[1, 0] = 1
        rle = encode_rle(mask)
        counts = rle_from_string(rle["counts"])
        np.testing.assert_array_equal(counts, [1, 1, 4])

    def test_string_codec_roundtrip(self, rng):
        counts = rng.integers(0, 10000, size=17)
        counts[0] = 0
        s = rle_to_string(counts)
        np.testing.assert_array_equal(rle_from_string(s), counts)

    def test_known_encoding(self):
        # pycocotools: encode(ones((1,1))) -> counts b'01' (run [0,1])
        assert rle_to_string(np.array([0, 1])) == "01"
        np.testing.assert_array_equal(rle_from_string("01"), [0, 1])

    def test_large_counts(self):
        counts = np.array([0, 1000000, 5, 1000000])
        s = rle_to_string(counts)
        np.testing.assert_array_equal(rle_from_string(s), counts)

    def test_area_and_bbox(self):
        mask = np.zeros((10, 10), np.uint8)
        mask[2:5, 3:8] = 1
        rle = encode_rle(mask)
        assert rle_area(rle) == 15
        assert mask_to_bbox(mask) == [3.0, 2.0, 5.0, 3.0]

    def test_bbox_empty(self):
        assert mask_to_bbox(np.zeros((4, 4))) == [0.0, 0.0, 0.0, 0.0]


def _ann(img, cat, mask, score=None, ann_id=0):
    a = {
        "image_id": img,
        "category_id": cat,
        "bbox": mask_to_bbox(mask),
        "segmentation": encode_rle(mask),
        "area": int(mask.sum()),
        "id": ann_id,
        "iscrowd": 0,
    }
    if score is not None:
        a["score"] = float(score)
    return a


def _box_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


class TestCocoMAP:
    def test_perfect_predictions(self):
        m1 = _box_mask(64, 64, 4, 20, 4, 20)
        m2 = _box_mask(64, 64, 30, 50, 30, 50)
        gt = [_ann(1, 0, m1, ann_id=0), _ann(1, 1, m2, ann_id=1)]
        pred = [_ann(1, 0, m1, score=0.9), _ann(1, 1, m2, score=0.9)]
        r = calculate_coco_metrics(pred, gt)
        assert r["bbox_mAP"] == pytest.approx(1.0)
        assert r["segm_mAP"] == pytest.approx(1.0)

    def test_no_overlap_zero(self):
        gt = [_ann(1, 0, _box_mask(64, 64, 0, 10, 0, 10), ann_id=0)]
        pred = [_ann(1, 0, _box_mask(64, 64, 40, 60, 40, 60), score=0.9)]
        r = calculate_coco_metrics(pred, gt)
        assert r["bbox_mAP"] == 0.0
        assert r["segm_mAP"] == 0.0

    def test_empty_inputs(self):
        r = calculate_coco_metrics([], [])
        assert r == {"bbox_mAP": 0.0, "segm_mAP": 0.0}

    def test_half_iou_counts_at_low_thresholds_only(self):
        # pred shifted so IoU ~ 1/3: matches at t=0.5? no. IoU(20x10 vs
        # 20x10 shifted 10) = 100/300 = 0.333 -> never matched -> AP 0
        gt = [_ann(1, 0, _box_mask(64, 64, 0, 10, 0, 20), ann_id=0)]
        pred = [_ann(1, 0, _box_mask(64, 64, 0, 10, 10, 30), score=0.9)]
        r = calculate_coco_metrics(pred, gt)
        assert r["bbox_mAP"] == 0.0

    def test_iou_between_thresholds(self):
        # IoU = 0.8 -> matched for t in {.5..0.8} = 7 of 10 thresholds
        gt = [_ann(1, 0, _box_mask(64, 64, 0, 10, 0, 100 // 2), ann_id=0)]
        m = _box_mask(64, 64, 0, 10, 0, 40)  # IoU = 40/50 = 0.8
        pred = [_ann(1, 0, m, score=0.9)]
        r = calculate_coco_metrics(pred, gt)
        # AP=1 for 7 thresholds, 0 for 3 -> but 101-pt interp includes
        # recall=0 point where precision=1 -> each matched threshold
        # contributes 1.0
        assert r["bbox_mAP"] == pytest.approx(0.7)

    def test_category_without_gt_excluded(self):
        m = _box_mask(32, 32, 0, 10, 0, 10)
        gt = [_ann(1, 0, m, ann_id=0)]
        pred = [_ann(1, 0, m, score=0.9), _ann(1, 1, m, score=0.9)]
        r = calculate_coco_metrics(pred, gt)
        # dead has no GT -> excluded from the mean, not averaged as 0
        assert r["bbox_mAP"] == pytest.approx(1.0)

    def test_false_positive_halves_precision(self):
        m = _box_mask(32, 32, 0, 10, 0, 10)
        fp = _box_mask(32, 32, 20, 30, 20, 30)
        gt = [_ann(1, 0, m, ann_id=0)]
        # FP has higher score -> at recall 1.0 precision is 0.5
        pred = [_ann(1, 0, fp, score=0.95), _ann(1, 0, m, score=0.9)]
        r = calculate_coco_metrics(pred, gt)
        assert r["bbox_mAP"] == pytest.approx(0.5)
