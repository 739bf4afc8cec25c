"""Instance extraction behavior tests (reference train_eval.py:654-850)."""

import numpy as np

from enhanced_unet_tpu.postprocess import semantic_to_instances


def _disk(canvas, cy, cx, r, val):
    h, w = canvas.shape
    yy, xx = np.mgrid[:h, :w]
    canvas[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = val


def test_separated_cells_become_instances():
    mask = np.zeros((96, 96), np.int32)
    _disk(mask, 20, 20, 6, 1)   # live, ~113 px
    _disk(mask, 60, 60, 6, 1)   # live
    _disk(mask, 20, 70, 6, 2)   # dead
    masks, labels, scores = semantic_to_instances(mask)
    assert labels.count(0) == 2
    assert labels.count(1) == 1
    assert all(0 < s <= 1.0 for s in scores)
    # instances must tile the class pixels (minus the tiny opening losses)
    total = sum(m.sum() for m in masks)
    assert total >= 0.8 * (mask > 0).sum()


def test_tiny_noise_filtered():
    mask = np.zeros((64, 64), np.int32)
    mask[5, 5] = 1          # 1 px: removed by opening / min-area 3
    mask[30, 30] = 2        # 1 px dead: min-area 5
    masks, labels, scores = semantic_to_instances(mask)
    assert masks == []


def test_oversized_region_filtered():
    mask = np.zeros((96, 96), np.int32)
    mask[4:92, 4:92] = 1  # 7744 px blob: erosion-split then >1500 gates
    masks, labels, scores = semantic_to_instances(mask)
    for m in masks:
        assert 3 <= m.sum() <= 1500


def test_touching_cells_split():
    # two cell-sized (r=9) disks overlapping -> one 8-connected region
    # > 200 px that erosion should split into two instances
    mask = np.zeros((96, 96), np.int32)
    _disk(mask, 48, 40, 9, 1)
    _disk(mask, 48, 56, 9, 1)
    from scipy import ndimage

    _, n0 = ndimage.label(mask > 0, structure=np.ones((3, 3)))
    assert n0 == 1  # genuinely touching
    masks, labels, scores = semantic_to_instances(mask)
    assert len(masks) >= 2


def test_confidence_ordering_compact_vs_ragged():
    mask = np.zeros((96, 96), np.int32)
    _disk(mask, 30, 30, 7, 1)           # compact disk ~150 px
    mask[60:62, 10:80] = 1              # thin 2x70 strip, 140 px, ragged
    masks, labels, scores = semantic_to_instances(mask)
    assert len(masks) == 2
    areas = [m.sum() for m in masks]
    # similar areas, so the compact disk must out-score the strip
    disk_idx = int(np.argmax([m[30, 30] for m in masks]))
    strip_idx = 1 - disk_idx
    assert scores[disk_idx] > scores[strip_idx]
