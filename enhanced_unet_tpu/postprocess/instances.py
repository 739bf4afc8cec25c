"""Semantic mask -> instance masks via connected components + erosion
splitting.

Parity target: reference train_eval.py:654-850 (semantic_to_instances),
ported rule-for-rule:

- per class (live=1 / dead=2): tiny 2x2-ellipse morphological opening
- connected components (8-connectivity)
- regions > 200 px: iterative erosion (3x3 ellipse, 2-8 iters by area) to
  split touching cells; dilate-back clipped to the region; recursive
  re-split of still-large pieces; small-kernel then 5x5 fallback passes
- per-class area gates (live 3..1500 px, dead 5..1500 px)
- confidence = 0.7 * min(area/150, 1) + 0.3 * compactness(4*pi*A/P^2)
- cap at 500 instances by confidence

The reference depends on skimage.measure.label (unavailable here);
scipy.ndimage.label with an 8-connective structure is identical.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from scipy import ndimage

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

_EIGHT = np.ones((3, 3), dtype=np.int32)  # 8-connectivity structure


def _ellipse(size: int) -> np.ndarray:
    if _HAS_CV2:
        return cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
    # cv2's MORPH_ELLIPSE for small sizes
    if size == 2:
        return np.ones((2, 2), np.uint8)
    if size == 3:
        return np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)
    if size == 5:
        return np.array(
            [
                [0, 0, 1, 0, 0],
                [1, 1, 1, 1, 1],
                [1, 1, 1, 1, 1],
                [1, 1, 1, 1, 1],
                [0, 0, 1, 0, 0],
            ],
            np.uint8,
        )
    raise ValueError(size)


def _erode(mask: np.ndarray, kernel: np.ndarray, iterations: int) -> np.ndarray:
    if _HAS_CV2:
        return cv2.erode(mask, kernel, iterations=iterations)
    out = mask
    for _ in range(iterations):
        out = ndimage.binary_erosion(out, structure=kernel.astype(bool)).astype(
            np.uint8
        )
    return out


def _dilate(mask: np.ndarray, kernel: np.ndarray, iterations: int) -> np.ndarray:
    if _HAS_CV2:
        return cv2.dilate(mask, kernel, iterations=iterations)
    out = mask
    for _ in range(iterations):
        out = ndimage.binary_dilation(out, structure=kernel.astype(bool)).astype(
            np.uint8
        )
    return out


def _open(mask: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    if _HAS_CV2:
        return cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel)
    return _dilate(_erode(mask, kernel, 1), kernel, 1)


def _label(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """8-connective labeling (== skimage.measure.label(connectivity=2))."""
    return ndimage.label(mask, structure=_EIGHT)


def _compactness(mask: np.ndarray, area: float) -> float:
    """4*pi*A/P^2 via external contour perimeter (cv2.arcLength semantics);
    0.5 fallback on degenerate contours (train_eval.py:818-829)."""
    try:
        if _HAS_CV2:
            contours, _ = cv2.findContours(
                mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
            )
            if not contours:
                return 0.5
            perimeter = cv2.arcLength(contours[0], True)
        else:
            # approximate perimeter: count boundary pixels
            er = ndimage.binary_erosion(mask, structure=_EIGHT.astype(bool))
            perimeter = float((mask.astype(bool) & ~er).sum())
        if perimeter > 0:
            return float(4 * np.pi * area / (perimeter ** 2))
        return 0.5
    except Exception:
        return 0.5


def semantic_to_instances(
    semantic_mask: np.ndarray, min_area: int = 3
) -> Tuple[List[np.ndarray], List[int], List[float]]:
    """Split each class's connected regions into individual cell instances.

    Returns (instance_masks, instance_labels [0=live,1=dead], scores).
    """
    instance_masks: List[np.ndarray] = []
    instance_labels: List[int] = []
    instance_scores: List[float] = []

    large_region_threshold = 200
    k3 = _ellipse(3)

    for class_id in (1, 2):
        class_mask = (semantic_mask == class_id).astype(np.uint8)
        if class_mask.sum() == 0:
            continue

        class_mask = _open(class_mask, _ellipse(2))
        markers, num_labels = _label(class_mask)

        final_markers = np.zeros_like(markers, dtype=np.int32)
        next_label = 1

        def emit(mask_region: np.ndarray) -> None:
            nonlocal next_label
            nonlocal final_markers
            if mask_region.sum() >= min_area:
                final_markers[mask_region > 0] = next_label
                next_label += 1

        for label_id in range(1, num_labels + 1):
            region_mask = (markers == label_id).astype(np.uint8)
            area = int(region_mask.sum())

            if area < large_region_threshold:
                emit(region_mask)
                continue

            # aggressive erosion split (train_eval.py:697-740)
            erode_iters = max(2, min(area // 1000, 8))
            eroded = _erode(region_mask, k3, erode_iters)
            sub_markers, sub_num = _label(eroded)

            if sub_num > 1:
                for sub_label in range(1, sub_num + 1):
                    sub_region = (sub_markers == sub_label).astype(np.uint8)
                    dilated = _dilate(sub_region, k3, erode_iters)
                    dilated = dilated & region_mask

                    if dilated.sum() > large_region_threshold:
                        # one-level recursive re-split (train_eval.py:716-735)
                        eroded2 = _erode(dilated, k3, 2)
                        sub2, n2 = _label(eroded2)
                        if n2 > 1:
                            for s2 in range(1, n2 + 1):
                                piece = (sub2 == s2).astype(np.uint8)
                                d2 = _dilate(piece, k3, 2) & dilated
                                emit(d2)
                        else:
                            emit(dilated)
                    else:
                        emit(dilated)
            else:
                # strategy 1: incremental small-kernel erosion, up to 3 passes
                # (train_eval.py:744-763)
                eroded_small = region_mask.copy()
                separated = False
                for _ in range(3):
                    eroded_small = _erode(eroded_small, k3, 1)
                    subs, ns = _label(eroded_small)
                    if ns > 1:
                        for sl in range(1, ns + 1):
                            piece = (subs == sl).astype(np.uint8)
                            d = _dilate(piece, k3, 3) & region_mask
                            emit(d)
                        separated = True
                        break
                # strategy 2: 5x5 kernel fallback (train_eval.py:766-785)
                if not separated:
                    k5 = _ellipse(5)
                    eroded2 = _erode(region_mask, k5, 3)
                    subs2, ns2 = _label(eroded2)
                    if ns2 > 1:
                        for sl in range(1, ns2 + 1):
                            piece = (subs2 == sl).astype(np.uint8)
                            d = _dilate(piece, k5, 3) & region_mask
                            emit(d)
                    else:
                        emit(region_mask)

        # area gates + confidence (train_eval.py:790-838)
        if class_id == 1:
            min_thr, max_thr = max(3, min_area), 1500
        else:
            min_thr, max_thr = max(5, min_area), 1500

        for label_id in range(1, int(final_markers.max()) + 1):
            inst = (final_markers == label_id).astype(np.uint8)
            area = int(inst.sum())
            if area < min_thr or area > max_thr:
                continue
            compact = _compactness(inst, area)
            area_score = min(area / 150.0, 1.0)
            confidence = 0.7 * area_score + 0.3 * compact
            instance_masks.append(inst)
            instance_labels.append(class_id - 1)
            instance_scores.append(confidence)

        # cap at 500 by confidence (train_eval.py:842-848); the reference
        # applies this inside the class loop over the combined lists
        if len(instance_masks) > 500:
            order = sorted(
                range(len(instance_scores)),
                key=lambda i: instance_scores[i],
                reverse=True,
            )[:500]
            instance_masks = [instance_masks[i] for i in order]
            instance_labels = [instance_labels[i] for i in order]
            instance_scores = [instance_scores[i] for i in order]

    return instance_masks, instance_labels, instance_scores
